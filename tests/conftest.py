"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

The ambient environment pins JAX to the tunnelled TPU (an ``axon``
sitecustomize registers the PJRT plugin at interpreter boot and sets
``jax_platforms="axon,cpu"``).  Tests must run on the local CPU: we override
the platform config *after* that boot hook but before any backend is
initialised.  Multi-chip sharding is validated on a virtual 8-device CPU mesh
(no pod needed), and float64 lets reference-parity tests run at the Rcpp
reference's precision (all-f64 Eigen).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the tier is compile-bound (~15 s per distinct
# (shape, static-n) executable; execution itself is ~free at test scale),
# and the cache keys on HLO -- so identical sampler compiles de-dup across
# tests, across xdist workers, and across pytest runs on the same box.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "virtual 8-device CPU mesh not active"
