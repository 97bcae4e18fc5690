"""Locate cycle sinks in the pallas sweep's sequential per-marker solve.

Runs the dense single-chain sweep with pieces of the solve body ablated
(BAYESR_SOLVE_ABLATE, see ops/pallas_sweep.py) and reports iteration time
per variant.  Each variant runs in a subprocess (the flag is read at
import).  Usage:

    python tools/solve_ablation.py            # sweep all variants
    python tools/solve_ablation.py sel gather # just these
"""
import os
import subprocess
import sys

VARIANTS = ["", "sel", "gather", "rank1", "delta", "vb",
            "sel,gather,rank1,delta,vb"]


def run_one(ablate: str) -> None:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bayesrrcpp_tpu import BayesRConfig, SpikeSlabSampler

    N = int(os.environ.get("ABL_N", 16384))
    M = int(os.environ.get("ABL_M", 49152))
    B = int(os.environ.get("ABL_B", 512))
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    XT = jax.random.normal(kx, (M, N), jnp.float32)
    Y = jax.random.normal(ky, (N,), jnp.float32)
    s = SpikeSlabSampler(XT, Y, np.array([1e-4, 1e-3, 1e-2]),
                         BayesRConfig(block_size=B), transposed=True,
                         backend="pallas")
    state = s.init(jax.random.PRNGKey(1))
    fn = jax.jit(s._run_steps_impl, static_argnums=(2,), donate_argnums=(0,))
    t0 = time.perf_counter()
    compiled = fn.lower(state, s.data, 1).compile()
    tc = time.perf_counter() - t0
    state = compiled(state, s.data)
    float(state.sigmaE)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        state = compiled(state, s.data)
        float(state.sigmaE)
        times.append(time.perf_counter() - t0)
    it = min(times)
    print(f"ablate=[{ablate}] N={N} M={M} B={B} iter={it*1e3:.1f}ms "
          f"({M/it/1e6:.2f}M SNP-upd/s) compile={tc:.0f}s", flush=True)


def main():
    if os.environ.get("ABL_CHILD") == "1":
        run_one(os.environ.get("BAYESR_SOLVE_ABLATE", ""))
        return
    variants = sys.argv[1:] or VARIANTS
    for v in variants:
        env = dict(os.environ, ABL_CHILD="1", BAYESR_SOLVE_ABLATE=v)
        subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                       check=False)


if __name__ == "__main__":
    main()
