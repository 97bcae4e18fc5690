"""Multi-host (multi-process) execution: jax.distributed + global meshes.

The reference has no distributed path at all (its only concurrency is a
2-thread OpenMP producer/consumer split, src/BayesRv2.cpp:102-108); scaling
past one host is this framework's reason to exist (SURVEY.md section 2.4,
BASELINE.md config 5: N=400k x M=1M across >=2 hosts).

Design: one JAX process per host, `jax.distributed.initialize` wires the
coordination service, and the ("m", "n") mesh spans every device of every
process.  All sampler code is written against GLOBAL arrays + collectives
(shard_map/psum), so nothing in the samplers changes between 1 and P
processes -- only array *placement* does:

- small host arrays that every process holds identically are placed with
  :func:`put_global` (callback placement: each process materializes only its
  addressable shards);
- the genotype matrix is loaded per host (each host reads only its marker
  slice of the .bed, :func:`process_marker_range` +
  ``io.bed.read_bed_packed(marker_range=...)``) and placed with
  :func:`put_process_shard`.

CI validation uses the fake-pod pattern (SURVEY.md section 4(d)): several
CPU processes on one machine, gloo collectives, asserting the multi-process
chain equals the single-process chain on the same mesh shape
(tests/test_multihost.py).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_M, AXIS_N


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               *, platform: Optional[str] = None,
               cpu_devices_per_process: Optional[int] = None) -> None:
    """Join this process to a multi-host run.

    On real pods ``jax.distributed.initialize()`` auto-detects everything;
    this wrapper adds the CPU fake-pod knobs (pin the platform to "cpu" and
    give each process ``cpu_devices_per_process`` virtual devices) used by
    the CI tests.  Must run before any JAX backend initialisation.
    """
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if cpu_devices_per_process is not None:
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(m: int = 1, n: int = 1) -> Mesh:
    """An (m, n) mesh over ALL devices of ALL processes.

    ``jax.devices()`` orders devices process-major, so reshaping to (m, n)
    gives each process a contiguous band of m-rows whenever n divides the
    per-process device count -- the layout `process_marker_range` assumes.
    """
    devices = jax.devices()
    if m * n != len(devices):
        raise ValueError(f"mesh {m}x{n} needs exactly {m*n} devices, "
                         f"have {len(devices)} across {jax.process_count()} "
                         "processes")
    return Mesh(np.asarray(devices).reshape(m, n), (AXIS_M, AXIS_N))


def put_global(mesh: Mesh, spec: P, host_array):
    """Place a host array every process holds identically onto the mesh.

    Single-process this is ``jax.device_put``; multi-process each process
    materializes only the shards it owns (callback placement), so no
    process ever sends another's data over DCN.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(host_array, sharding)
    arr = np.asarray(host_array)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def put_process_shard(mesh: Mesh, spec: P, local_rows, global_shape):
    """Assemble a global array from per-process row slabs (axis 0 = "m").

    ``local_rows`` is exactly this process's slab, rows
    ``process_marker_range(mesh, global_shape[0])`` of the global array;
    trailing axes must be unsharded or span only process-local devices.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows), tuple(global_shape))


def process_marker_range(mesh: Mesh, mpad: int) -> tuple[int, int]:
    """The contiguous [lo, hi) global-row interval of a P("m")-sharded
    (mpad, ...) array owned by THIS process.  Each host loads only this
    slice of the genotype data (e.g. ``read_bed_packed(marker_range=...)``).
    """
    sharding = NamedSharding(mesh, P(AXIS_M))
    lo, hi = mpad, 0
    for d, idx in sharding.devices_indices_map((mpad,)).items():
        if d.process_index != jax.process_index():
            continue
        s = idx[0]
        lo = min(lo, s.start if s.start is not None else 0)
        hi = max(hi, s.stop if s.stop is not None else mpad)
    if lo >= hi:
        raise ValueError("this process owns no rows of the 'm' axis")
    # rows owned by one process must be contiguous (process-major device
    # order; see global_mesh) -- verify rather than assume
    span = hi - lo
    owned = sum(
        (idx[0].stop or mpad) - (idx[0].start or 0)
        for d, idx in sharding.devices_indices_map((mpad,)).items()
        if d.process_index == jax.process_index())
    n_dup = mesh.shape[AXIS_N]
    if owned != span * n_dup:
        raise ValueError("process-owned marker rows are not contiguous; "
                         "build the mesh with parallel.global_mesh")
    return lo, hi


def replicate(pytree, mesh: Mesh):
    """Return a fully-replicated copy of a (possibly sharded) global pytree
    -- an in-jit all-gather, after which every leaf is addressable on every
    process (e.g. for assertions or host-side emission)."""
    rep = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: rep, pytree)
    return jax.jit(lambda t: t, out_shardings=shardings)(pytree)
