"""Probe generated-code size + true iter time of the packed step vs nb.

Usage: MEM_N=98304 PROBE_NB="920 976 977 978" python tools/codesize_probe.py
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(N, nb, B=512):
    import jax
    import jax.numpy as jnp

    from bayesrrcpp_tpu import BayesRConfig, SpikeSlabSampler

    M = nb * B
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    XT = jax.random.randint(kx, (M, N // 16), -(2 ** 31), 2 ** 31 - 1,
                            jnp.int32)
    Y = jax.random.normal(ky, (N,), jnp.float32)
    s = SpikeSlabSampler(XT, Y, np.array([1e-4, 1e-3, 1e-2]),
                         BayesRConfig(block_size=B), transposed=True,
                         x_dtype="2bit",
                         x_stats=(np.full(M, 1.0), np.full(M, 0.8165)))
    state = s.init(jax.random.PRNGKey(1))
    fn = jax.jit(s._run_steps_impl, static_argnums=(2,), donate_argnums=(0,))
    t0 = time.perf_counter()
    compiled = fn.lower(state, s.data, 1).compile()
    comp_s = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    state = compiled(state, s.data)
    float(state.sigmaE)  # hard host sync (axon block_until_ready lies)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state = compiled(state, s.data)
        float(state.sigmaE)
        times.append(time.perf_counter() - t0)
    it = min(times)
    print(f"nb={nb:5d} M={M:7d}: code={ma.generated_code_size_in_bytes/2**20:8.1f} MiB "
          f"temp={ma.temp_size_in_bytes/2**20:7.1f} MiB compile={comp_s:5.1f}s "
          f"iter={it:6.3f}s ({M/it:,.0f} SNP-upd/s)", flush=True)
    del state, s, XT, Y, compiled, fn
    gc.collect()


def main():
    # fake gram (values irrelevant for code size / timing shape)
    import jax.numpy as jnp

    from bayesrrcpp_tpu.ops import genotypes

    def fake(words, x_stats, B, Mpad, N, Npad, TN, W):
        Mw = words.shape[0]
        if Mpad != Mw:
            words = jnp.pad(words, ((0, Mpad - Mw), (0, 0)),
                            constant_values=-1)
        t_idx = np.arange(Npad) // TN
        rem = np.arange(Npad) % TN
        k_idx, i_idx = rem // W, rem % W
        perm = 16 * (t_idx * W + i_idx) + k_idx
        nb = Mpad // B
        return genotypes.QuantizedGenotypes(
            words, jnp.full((Mpad,), float(N), jnp.float32),
            jnp.zeros((nb, B, B), jnp.float32),
            jnp.asarray(np.pad(np.asarray(x_stats[0], np.float64),
                               (0, Mpad - Mw)), jnp.float32),
            jnp.asarray(np.pad(np.asarray(x_stats[1], np.float64),
                               (0, Mpad - Mw)), jnp.float32),
            jnp.ones((Npad,), bool), jnp.asarray(perm, jnp.int32), Npad,
            jnp.zeros((Mpad,), jnp.float32), False)

    genotypes._prepacked_setup = fake

    N = int(os.environ.get("MEM_N", 98304))
    for nb in [int(x) for x in os.environ.get("PROBE_NB", "920 977").split()]:
        probe(N, nb)


if __name__ == "__main__":
    main()
