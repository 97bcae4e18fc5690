"""On-hardware validation of the round-5 correctness fixes.

The CPU test tier runs the Pallas kernels in interpret mode (exact f32,
shapes below the trigger points), so the two round-5 corruption classes
-- the packed eps-layout mispairing past 2048 lanes and the bf16
matmul-precision chain divergence -- were invisible to it by
construction.  This script re-runs the discovering experiments on the
attached TPU and asserts the fixed behavior:

1. dense t-kernel vs the XLA oracle at N=4096 with a warm state:
   labels must match EXACTLY (at default bf16 precision they flipped at
   ~0.3%/sweep; eps maxdiff was 0.103, now ~2e-5);
2. packed population-stats chain at N=49k x M=246k, J=16: sigmaE must
   CONVERGE (it exploded to ~3.5e5 within 6 iterations pre-fix);
3. tracked-eps vs exact-recompute consistency after the chain (the
   layout mispairing showed up as O(1) relative error here).

Run:  python tools/tpu_validation.py [--quick]
(--quick drops the N=49k chain to 4 iterations.)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402


def oracle_agreement():
    from bayesrrcpp_tpu.ops import block_sweep as bs
    from bayesrrcpp_tpu.ops.pallas_jacobi_t import bayesr_jacobi_t_pallas

    def _visit(arr, rho, J, B):
        nr = rho.shape[0]
        return jnp.take(arr.reshape(nr, J * B), rho, axis=0).reshape(-1)

    rng = np.random.default_rng(33)
    N, M, B, J = 4096, 4096, 32, 16
    X = rng.standard_normal((N, M)).astype(np.float32)
    XT = jnp.asarray(X)
    xsq = jnp.sum(XT * XT, axis=1)
    gram = bs.gram_blocks(XT, B)
    eps = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.05, M).astype(np.float32)
                       * (rng.random(M) < 0.3))
    labels = jnp.asarray((np.asarray(beta) != 0).astype(np.int32)
                         * rng.integers(1, 4, M))
    p = jax.random.uniform(jax.random.PRNGKey(34), (M,), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(35), (M,), jnp.float32)
    pi = jnp.asarray([[0.5, 0.2, 0.2, 0.1]], jnp.float32)
    cva = jnp.asarray([[0.0001, 0.001, 0.01]], jnp.float32)
    sigmaE = jnp.float32(0.8)
    sigmaGG = jnp.asarray([0.05], jnp.float32)
    gas = jnp.zeros(M, jnp.int32)
    valid = jnp.ones(M, bool)
    args = [XT, gram, xsq, eps, beta, labels, None, None, p, z, pi, cva,
            sigmaE, sigmaGG, gas, valid]
    nb = M // B
    rho, inner = bs.strided_orders(jax.random.PRNGKey(11), nb, B, J)
    args_o = list(args)
    args_o[6], args_o[7] = bs.strided_border(rho, J), inner
    args_o[8] = _visit(args[8], rho, J, B)
    args_o[9] = _visit(args[9], rho, J, B)
    ref = bs.bayesr_jacobi_sweep(*args_o, J=J)
    out = bayesr_jacobi_t_pallas(*(args[:6] + [rho, inner] + args[8:]),
                                 J=J, interpret=False)
    lab = float((np.asarray(ref.labels) == np.asarray(out.labels)).mean())
    emax = float(np.abs(np.asarray(ref.eps) - np.asarray(out.eps)).max())
    assert lab == 1.0, f"label agreement {lab} != 1.0 (bf16 regression?)"
    assert emax < 1e-3, f"eps maxdiff {emax} (bf16 regression?)"
    return {"labels_agree": lab, "eps_maxdiff": emax}


def chain_stability(iters=8):
    from bayesrrcpp_tpu import BayesRConfig, SpikeSlabSampler
    from bayesrrcpp_tpu.ops.genotypes import xbeta_packed
    from bayesrrcpp_tpu.simulate import (packed_word_stats,
                                         random_packed_words)

    N, M = 49152, 245760
    key = jax.random.PRNGKey(0)
    kx, kb, kc = jax.random.split(key, 3)
    XT = random_packed_words(kx, M, N // 16)
    means, sds = packed_word_stats(M)
    bt = jnp.zeros((M,), jnp.float32).at[
        jax.random.choice(kb, M, (491,), replace=False)].set(
        jax.random.normal(kb, (491,)) * float(np.sqrt(0.5 / 491)))
    g = xbeta_packed(XT, jnp.asarray(means, jnp.float32),
                     jnp.asarray(1.0 / sds, jnp.float32), bt, 512, N)
    Y = g + jax.random.normal(kc, (N,), jnp.float32) * \
        jnp.sqrt(jnp.maximum(jnp.var(g), 1e-3))
    smp = SpikeSlabSampler(XT, Y, np.array([0.0001, 0.001, 0.01]),
                           BayesRConfig(block_size=32), transposed=True,
                           x_dtype="2bit", x_stats=packed_word_stats(M),
                           jacobi_blocks=16, jacobi_layout="t")
    st = smp.init(jax.random.PRNGKey(1))
    tr = []
    for _ in range(iters):
        st = smp._run_steps(st, smp.data, 1)
        tr.append(float(st.sigmaE))
    ex = smp.refresh_eps(st)
    rel = float(jnp.linalg.norm(st.eps - ex.eps)) / \
        float(jnp.linalg.norm(ex.eps))
    assert all(np.isfinite(tr)) and tr[-1] < 2.0, \
        f"chain diverged: sigmaE trajectory {tr}"
    assert rel < 1e-4, f"tracked eps inconsistent with recompute: {rel}"
    return {"sigmaE": [round(v, 4) for v in tr], "rel_eps": rel}


def main():
    plat = jax.devices()[0].platform
    if plat == "cpu":
        raise SystemExit("tpu_validation needs the TPU (interpret mode "
                         "cannot reproduce the hardware failure modes)")
    quick = "--quick" in sys.argv
    out = {
        "platform": str(jax.devices()[0]),
        "oracle_agreement_n4096": oracle_agreement(),
        "chain_stability_n49k": chain_stability(4 if quick else 8),
    }
    print(json.dumps(out))
    print("tpu_validation OK")


if __name__ == "__main__":
    main()
