"""Split the packed-sweep iteration time into streaming vs sequential-solve.

Runs the biobank step twice: stock, and with the kernel's per-marker solve
loop no-op'd (monkeypatched lax.fori_loop), isolating the X-streaming +
r-accumulate + rank-1-update cost from the B sequential in-VMEM updates.

Env: MEM_N (default 98304), MEM_M (default 153600), SKIP_SOLVE=1.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    if os.environ.get("SKIP_SOLVE") == "1":
        orig_fori = lax.fori_loop

        def patched(lo, hi, body, init, **kw):
            # the sweep kernel's solve loop is the only fori_loop with a ()
            # carry; skip it to measure pure streaming cost
            if init == ():
                return init
            return orig_fori(lo, hi, body, init, **kw)

        lax.fori_loop = patched
        import bayesrrcpp_tpu.ops.pallas_sweep as ps

        ps.lax.fori_loop = patched

    from bayesrrcpp_tpu import BayesRConfig, SpikeSlabSampler

    N = int(os.environ.get("MEM_N", 98304))
    M = int(os.environ.get("MEM_M", 153600))
    B = int(os.environ.get("MEM_B", 512))
    from bayesrrcpp_tpu.simulate import packed_word_stats, random_packed_words

    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    if os.environ.get("WITH_MISSING") == "1":   # legacy decode-kernel path
        XT = jax.random.randint(kx, (M, N // 16), -(2 ** 31), 2 ** 31 - 1,
                                jnp.int32)
    else:                                       # fold-affine path
        XT = random_packed_words(kx, M, N // 16)
    Y = jax.random.normal(ky, (N,), jnp.float32)
    s = SpikeSlabSampler(XT, Y, np.array([1e-4, 1e-3, 1e-2]),
                         BayesRConfig(block_size=B), transposed=True,
                         x_dtype="2bit", x_stats=packed_word_stats(M))
    print(f"fold_affine={s._x_fold}", flush=True)
    state = s.init(jax.random.PRNGKey(1))
    fn = jax.jit(s._run_steps_impl, static_argnums=(2,), donate_argnums=(0,))
    compiled = fn.lower(state, s.data, 1).compile()
    state = compiled(state, s.data)
    float(state.sigmaE)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        state = compiled(state, s.data)
        float(state.sigmaE)
        times.append(time.perf_counter() - t0)
    it = min(times)
    tag = "streaming-only" if os.environ.get("SKIP_SOLVE") == "1" else "stock"
    print(f"{tag}: N={N} M={M} B={B} iter={it*1e3:.1f}ms "
          f"({M/it:,.0f} SNP-upd/s)", flush=True)


if __name__ == "__main__":
    main()
