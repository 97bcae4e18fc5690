"""Benchmark: blocked BayesR Gibbs sweep throughput on the attached device.

Prints ONE JSON line:
  {"metric": "snp_updates_per_sec", "value": N, "unit": "SNP-updates/s",
   "vs_baseline": R, ...}

The north-star metric is SNP-updates/sec/chip (BASELINE.json).  The reference
publishes no numbers (BASELINE.md), so ``vs_baseline`` is measured against a
faithful single-core CPU proxy of the reference's inner loop: one O(N) dot +
two O(N) axpys per marker in f64 NumPy/BLAS (the same memory-bound kernel the
Eigen reference executes, src/BayesRv2.cpp:191,201,243), measured on this
host at the same N.

Config via env: BENCH_N, BENCH_M, BENCH_ITERS, BENCH_BLOCK, BENCH_DTYPE.
"""
import json
import os
import time

import numpy as np


def cpu_reference_rate(N: int, n_markers: int = 2000) -> float:
    """Measured single-core CPU proxy for the reference per-SNP update cost."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N,))
    eps = rng.normal(size=(N,))
    t0 = time.perf_counter()
    for _ in range(n_markers):
        y_tilde = eps + x * 0.1          # rank-1 exclusion (src/BayesRv2.cpp:191)
        num = x @ y_tilde                # dominant dot      (src/BayesRv2.cpp:201)
        eps = y_tilde - x * (num * 1e-9) # rank-1 inclusion  (src/BayesRv2.cpp:243)
    elapsed = time.perf_counter() - t0
    return n_markers / elapsed


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # the ambient sitecustomize pins the remote-TPU plugin; env vars
        # alone cannot switch back to CPU
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon") or "TPU" in str(jax.devices()[0])
    if on_tpu:
        # default sized to stay well inside one 16 GB chip even with XLA's
        # scoped-memory staging copy of X (a 20k x 50k f32 X measured
        # borderline against a busy shared chip)
        N = int(os.environ.get("BENCH_N", 16_384))
        M = int(os.environ.get("BENCH_M", 49_152))
        iters = int(os.environ.get("BENCH_ITERS", 10))
    else:  # CPU fallback so the script stays runnable anywhere
        N = int(os.environ.get("BENCH_N", 2_000))
        M = int(os.environ.get("BENCH_M", 10_000))
        iters = int(os.environ.get("BENCH_ITERS", 3))
    B = int(os.environ.get("BENCH_BLOCK", 512))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE") == "bf16" else jnp.float32

    from bayesrrcpp_tpu import BayesRConfig, SpikeSlabSampler

    # generate the genotype matrix directly on device, marker-major --
    # at bench scale X must never round-trip through the host
    key = jax.random.PRNGKey(0)
    kx, kb, kn, kc = jax.random.split(key, 4)

    x_dtype = os.environ.get("BENCH_XDTYPE", "dense")  # dense | int8 | 2bit
    t0 = time.perf_counter()
    extra = {}
    if x_dtype == "2bit":
        from bayesrrcpp_tpu.simulate import (packed_word_stats,
                                             random_packed_words)

        N = -(-N // 2048) * 2048
        if os.environ.get("BENCH_MISSING") == "1":  # in-kernel decode path
            XT = jax.random.randint(kx, (M, N // 16), -(2 ** 31),
                                    2 ** 31 - 1, jnp.int32)
        else:  # missing-free -> fold-affine raw-code kernel (the fast path)
            XT = random_packed_words(kx, M, N // 16)
        extra = dict(x_dtype="2bit", x_stats=packed_word_stats(M))
        Y = jax.random.normal(kc, (N,), jnp.float32)
    elif x_dtype == "int8":
        XT = jax.random.randint(kx, (M, N), 0, 3, dtype=jnp.int8)
        extra = dict(x_dtype="int8",
                     x_stats=(np.full(M, 1.0), np.full(M, np.sqrt(2 / 3))))
        Y = jax.random.normal(kc, (N,), jnp.float32)
    else:
        XT = jax.random.normal(kx, (M, N), jnp.float32)
        n_causal = max(1, M // 100)
        beta = jnp.where(jax.random.uniform(kb, (M,)) < n_causal / M,
                         jax.random.normal(kn, (M,)) * jnp.sqrt(0.5 / n_causal),
                         0.0)
        Y = beta @ XT + jax.random.normal(kc, (N,)) * jnp.sqrt(0.5)
    Y.block_until_ready()
    gen_s = time.perf_counter() - t0

    which = os.environ.get("BENCH_SAMPLER", "bayesr")  # bayesr | horseshoe
    t0 = time.perf_counter()
    if which == "horseshoe":
        from bayesrrcpp_tpu import HorseshoeConfig
        from bayesrrcpp_tpu.models.horseshoe import HorseshoeSampler

        sampler = HorseshoeSampler(XT, Y, HorseshoeConfig(block_size=B),
                                   transposed=True, dtype=jnp.float32,
                                   **extra)
    else:
        cva = np.array([0.0001, 0.001, 0.01], np.float64)
        sampler = SpikeSlabSampler(XT, Y, cva, BayesRConfig(block_size=B),
                                   transposed=True, dtype=jnp.float32,
                                   **extra)
    jax.block_until_ready(sampler.data.gram)
    setup_s = time.perf_counter() - t0

    # BENCH_CHAINS > 1: fused multi-chain kernel (all chains share one X
    # stream; SNP-updates count multiplies by the chain count)
    n_chains = int(os.environ.get("BENCH_CHAINS", 1))
    if n_chains > 1 or os.environ.get("BENCH_MC") == "1":
        state = jax.vmap(sampler.init)(
            jax.random.split(jax.random.PRNGKey(1), n_chains))
        run = lambda st: sampler._mc_run_steps(st, sampler.data, iters)
        sync = lambda st: float(st.sigmaE[0])
    else:
        state = sampler.init(jax.random.PRNGKey(1))
        run = lambda st: sampler._run_steps(st, sampler.data, iters)
        sync = lambda st: float(st.sigmaE)
    # warmup / compile with the SAME static iteration count as the timed
    # call (a different count would recompile inside the timed region)
    t0 = time.perf_counter()
    state = run(state)
    sync(state)  # hard host sync
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = run(state)
    sync(state)  # hard host sync
    elapsed = time.perf_counter() - t0

    rate = M * iters * n_chains / elapsed
    base = cpu_reference_rate(N)
    print(json.dumps({
        "metric": "snp_updates_per_sec",
        "value": round(rate, 1),
        "unit": "SNP-updates/s",
        "vs_baseline": round(rate / base, 2),
        "config": {"N": N, "M": M, "iters": iters, "block": B,
                   "sampler": which, "x_dtype": x_dtype, "chains": n_chains,
                   "platform": platform,
                   "iter_ms": round(1e3 * elapsed / iters, 1),
                   "gibbs_iters_per_min": round(60 * iters / elapsed, 2),
                   "cpu_ref_rate": round(base, 1),
                   "gen_s": round(gen_s, 1), "gram_s": round(setup_s, 1),
                   "compile_s": round(compile_s, 1)},
    }))


if __name__ == "__main__":
    main()
