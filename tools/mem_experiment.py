"""AOT memory-analysis of the packed pallas step at biobank scale.

Compiles (does NOT run) one `_run_steps(n=1)` executable at N=98304 x M=BENCH_M
with 2-bit packed genotypes and prints XLA's buffer breakdown -- used to chase
the scoped-memory staging of pallas operands (BENCH.md known follow-ups).

Env: MEM_M (default 471040), FAKE_GRAM=1 to skip the Gram build (values are
irrelevant for buffer assignment).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bayesrrcpp_tpu import BayesRConfig, SpikeSlabSampler
    from bayesrrcpp_tpu.models import bayesr as bayesr_mod

    N = int(os.environ.get("MEM_N", 98304))
    M = int(os.environ.get("MEM_M", 471040))
    B = int(os.environ.get("MEM_B", 512))

    if os.environ.get("FAKE_GRAM", "1") == "1":
        from bayesrrcpp_tpu.ops import genotypes

        def fake(words, x_stats, B, Mpad, N, Npad, TN, W):
            if N != Npad:
                raise ValueError("needs N % 2048 == 0")
            Mw = words.shape[0]
            if Mpad != Mw:
                words = jnp.pad(words, ((0, Mpad - Mw), (0, 0)),
                                constant_values=-1)
            mean = jnp.asarray(np.pad(np.asarray(x_stats[0], np.float64),
                                      (0, Mpad - Mw)), jnp.float32)
            scale = jnp.asarray(np.pad(np.asarray(x_stats[1], np.float64),
                                       (0, Mpad - Mw)), jnp.float32)
            t_idx = np.arange(Npad) // TN
            rem = np.arange(Npad) % TN
            k_idx, i_idx = rem // W, rem % W
            perm = 16 * (t_idx * W + i_idx) + k_idx
            nb = Mpad // B
            return genotypes.QuantizedGenotypes(
                words, jnp.full((Mpad,), float(N), jnp.float32),
                jnp.zeros((nb, B, B), jnp.float32), mean, scale,
                jnp.ones((Npad,), bool), jnp.asarray(perm, jnp.int32),
                Npad, jnp.zeros((Mpad,), jnp.float32), False)

        genotypes._prepacked_setup = fake

    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    t0 = time.perf_counter()
    XT = jax.random.randint(kx, (M, N // 16), -(2 ** 31), 2 ** 31 - 1,
                            jnp.int32)
    Y = jax.random.normal(ky, (N,), jnp.float32)
    Y.block_until_ready()
    print(f"gen {time.perf_counter() - t0:.1f}s; X words "
          f"{XT.size * 4 / 2**30:.2f} GiB", flush=True)

    cva = np.array([1e-4, 1e-3, 1e-2])
    t0 = time.perf_counter()
    s = SpikeSlabSampler(XT, Y, cva, BayesRConfig(block_size=B),
                         transposed=True, x_dtype="2bit",
                         x_stats=(np.full(M, 1.0), np.full(M, 0.8165)))
    jax.block_until_ready(s.data.gram)
    print(f"setup {time.perf_counter() - t0:.1f}s; gram "
          f"{s.data.gram.size * 4 / 2**30:.2f} GiB", flush=True)

    state = s.init(jax.random.PRNGKey(1))
    jax.block_until_ready(state.eps)
    print("lowering...", flush=True)
    t0 = time.perf_counter()
    import functools
    fn = jax.jit(s._run_steps_impl, static_argnums=(2,), donate_argnums=(0,))
    lowered = fn.lower(state, s.data, 1)
    try:
        compiled = lowered.compile()
    except Exception as e:  # RESOURCE_EXHAUSTED carries the breakdown
        print(f"compile FAILED after {time.perf_counter() - t0:.1f}s:",
              flush=True)
        print(str(e)[:8000])
        return
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    ma = compiled.memory_analysis()
    print(ma)
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k}: {v / 2**30:.3f} GiB")
    n_runs = int(os.environ.get("MEM_RUN", "0"))
    for i in range(n_runs):
        t0 = time.perf_counter()
        state = compiled(state, s.data)
        jax.block_until_ready(state)
        print(f"iter {i}: {time.perf_counter() - t0:.2f}s "
              f"({M / (time.perf_counter() - t0):,.0f} SNP-upd/s)", flush=True)


if __name__ == "__main__":
    main()
