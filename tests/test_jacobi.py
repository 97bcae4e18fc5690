"""Jacobi-batched sweep kernel (ops/pallas_jacobi.py) vs its XLA oracle.

The kernel's math is block-Jacobi across the J blocks of a round (the
mesh-sharded Dm=J semantics, on one chip) and exact sequential Gibbs within
each block; bayesr_jacobi_sweep is the plain-XLA transcription of exactly
that.  Labels must match exactly; floats to reassociation tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import BayesRConfig, ChainConfig, GroupsConfig, \
    HorseshoeConfig, HorseshoeSampler, SpikeSlabSampler, simulate
from bayesrrcpp_tpu.ops import block_sweep as bs
from bayesrrcpp_tpu.ops.pallas_jacobi import (bayesr_jacobi_pallas,
                                              horseshoe_jacobi_pallas)

CVA = np.array([0.001, 0.01, 0.1])


def _sweep_args(seed, N, M, B, G=1):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, M)).astype(np.float32)
    XT = jnp.asarray(X.T)
    xsq = jnp.sum(XT * XT, axis=1)
    gram = bs.gram_blocks(XT, B)
    nb = M // B
    eps = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    beta = jnp.zeros(M, jnp.float32).at[3].set(0.25)
    labels = jnp.zeros(M, jnp.int32).at[3].set(2)
    border, inner = bs.block_orders(jax.random.PRNGKey(seed), nb, B)
    p = jax.random.uniform(jax.random.PRNGKey(seed + 1), (M,), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(seed + 2), (M,), jnp.float32)
    pi = jnp.tile(jnp.asarray([[0.5, 0.2, 0.2, 0.1]], jnp.float32), (G, 1))
    cva = jnp.tile(jnp.asarray([CVA], jnp.float32), (G, 1))
    sigmaE = jnp.float32(0.8)
    sigmaGG = jnp.linspace(0.03, 0.08, G).astype(jnp.float32)
    gas = jnp.asarray(np.arange(M) % G, jnp.int32)
    valid = jnp.ones(M, bool)
    return (XT, gram, xsq, eps, beta, labels, border, inner, p, z,
            pi, cva, sigmaE, sigmaGG, gas, valid)


@pytest.mark.parametrize("J,G", [(4, 1), (2, 3), (8, 1)])
def test_jacobi_kernel_equals_oracle(J, G):
    args = _sweep_args(21 + J, N=96, M=128, B=16, G=G)
    ref = bs.bayesr_jacobi_sweep(*args, J=J)
    out = bayesr_jacobi_pallas(*args, J=J, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.labels),
                                  np.asarray(out.labels))
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(out.beta),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ref.eps), np.asarray(out.eps),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(out.v))
    np.testing.assert_allclose(np.asarray(ref.beta_acum),
                               np.asarray(out.beta_acum), rtol=1e-4,
                               atol=1e-6)


def test_jacobi_j1_equals_blocked():
    """J=1 is sequential block order: must equal the blocked sweep."""
    args = _sweep_args(31, N=80, M=96, B=16)
    ref = bs.bayesr_block_sweep(*(args[:12] + args[12:]))
    out = bayesr_jacobi_pallas(*args, J=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.labels),
                                  np.asarray(out.labels))
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(out.beta),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ref.eps), np.asarray(out.eps),
                               rtol=2e-4, atol=2e-5)


def _nomissing_dosage(seed, N, M):
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.2, 0.8, M)
    dosage = rng.binomial(2, freqs, size=(N, M)).astype(float)
    means = dosage.mean(axis=0)
    sds = dosage.std(axis=0, ddof=1)
    dense = (dosage - means) / sds
    beta_t = np.zeros(M)
    beta_t[rng.choice(M, 8, replace=False)] = rng.normal(0, 0.3, 8)
    y = dense @ beta_t + rng.normal(0, 0.7, N)
    return dosage, dense, y


@pytest.mark.parametrize("x_dtype", ["int8", "2bit"])
@pytest.mark.slow
def test_jacobi_fold_quantized_equals_dense(x_dtype):
    """Fold-affine quantized Jacobi == dense Jacobi (same chain keys)."""
    dosage, dense, y = _nomissing_dosage(41, 150, 96)
    cfg = BayesRConfig(block_size=16)
    s_d = SpikeSlabSampler(dense, y, CVA, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3)
    s_q = SpikeSlabSampler(dosage, y, CVA, cfg, x_dtype=x_dtype,
                           dtype=jnp.float32, jacobi_blocks=3)
    assert s_q._x_fold
    key = jax.random.PRNGKey(42)
    st_d, st_q = s_d.init(key), s_q.init(key)
    for _ in range(3):
        st_d, st_q = s_d.step(st_d), s_q.step(st_q)
    np.testing.assert_array_equal(np.asarray(st_d.labels),
                                  np.asarray(st_q.labels))
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-6)
    np.testing.assert_allclose(float(st_d.sigmaE), float(st_q.sigmaE),
                               rtol=2e-4)


@pytest.mark.slow
def test_jacobi_sampler_recovery():
    """Statistical validation of the J>1 Markov kernel: effect recovery on
    the embedded-smoke recipe (src/BayesRv2.cpp:298-315 scaled down),
    matching the standard the sharded block-Jacobi sampler is held to."""
    sim = simulate.simulate_bayesr(seed=77, N=400, M=160, n_causal=16,
                                   h2=0.5)
    s = SpikeSlabSampler(sim.X, sim.Y, CVA, BayesRConfig(block_size=16),
                         backend="pallas", dtype=jnp.float32,
                         jacobi_blocks=5)
    _, out = s.run(jax.random.PRNGKey(7), ChainConfig(150, 75, 5))
    bh = out["beta"].mean(axis=0)
    corr = np.corrcoef(sim.beta_true, bh)[0, 1]
    assert corr > 0.8, corr
    assert np.isfinite(out["sigmaE"]).all()


def _hs_sweep_args(seed, N, M, B):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, M)).astype(np.float32)
    XT = jnp.asarray(X.T)
    xsq = jnp.sum(XT * XT, axis=1)
    gram = bs.gram_blocks(XT, B)
    nb = M // B
    eps = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    beta = jnp.zeros(M, jnp.float32).at[3].set(0.25)
    border, inner = bs.block_orders(jax.random.PRNGKey(seed), nb, B)
    z = jax.random.normal(jax.random.PRNGKey(seed + 2), (M,), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.1, 2.0, M).astype(np.float32))
    tau = jnp.float32(0.05)
    c2 = jnp.float32(1.5)
    sigmaE = jnp.float32(0.8)
    valid = jnp.ones(M, bool)
    return (XT, gram, xsq, eps, beta, border, inner, z,
            lam, tau, c2, sigmaE, valid)


@pytest.mark.parametrize("J", [2, 4])
def test_hs_jacobi_kernel_equals_oracle(J):
    args = _hs_sweep_args(51 + J, N=96, M=128, B=16)
    eps_r, beta_r = bs.horseshoe_jacobi_sweep(*args, J=J)
    eps_o, beta_o = horseshoe_jacobi_pallas(*args, J=J, interpret=True)
    np.testing.assert_allclose(np.asarray(beta_r), np.asarray(beta_o),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(eps_r), np.asarray(eps_o),
                               rtol=2e-4, atol=2e-5)


def test_hs_jacobi_j1_equals_blocked():
    """J=1 is sequential block order: must equal the blocked sweep."""
    args = _hs_sweep_args(61, N=80, M=96, B=16)
    eps_r, beta_r = bs.horseshoe_block_sweep(*args)
    eps_o, beta_o = horseshoe_jacobi_pallas(*args, J=1, interpret=True)
    np.testing.assert_allclose(np.asarray(beta_r), np.asarray(beta_o),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(eps_r), np.asarray(eps_o),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_hs_jacobi_fold_quantized_equals_dense():
    """Fold-affine 2-bit horseshoe Jacobi == dense Jacobi (same keys)."""
    dosage, dense, y = _nomissing_dosage(43, 150, 96)
    cfg = HorseshoeConfig(block_size=16)
    s_d = HorseshoeSampler(dense, y, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3)
    s_q = HorseshoeSampler(dosage, y, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3)
    assert s_q._x_fold
    key = jax.random.PRNGKey(44)
    st_d, st_q = s_d.init(key), s_q.init(key)
    for _ in range(3):
        st_d, st_q = s_d.step(st_d), s_q.step(st_q)
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-6)
    np.testing.assert_allclose(float(st_d.sigmaE), float(st_q.sigmaE),
                               rtol=2e-4)


@pytest.mark.slow
def test_hs_jacobi_sampler_recovery():
    """Statistical validation of the J>1 horseshoe Markov kernel on the
    embedded-smoke recipe (src/HorseshoeR.cpp:305-325 scaled down)."""
    sim = simulate.simulate_bayesr(seed=79, N=400, M=160, n_causal=16,
                                   h2=0.5)
    A = (1.0 / np.sqrt(400)) * 16.0 / (160 - 16.0)
    s = HorseshoeSampler(sim.X, sim.Y, HorseshoeConfig(block_size=16, A=A),
                         backend="pallas", dtype=jnp.float32,
                         jacobi_blocks=5)
    _, out = s.run(jax.random.PRNGKey(8), ChainConfig(150, 75, 5))
    bh = out["beta"].mean(axis=0)
    corr = np.corrcoef(sim.beta_true, bh)[0, 1]
    assert corr > 0.8, corr
    assert np.isfinite(out["sigmaE"]).all()


def test_jacobi_groups_grouped_hypers():
    """Grouped variant under Jacobi: per-group v/bacc bookkeeping stays
    exact vs the oracle (covered above) and the chain runs end to end."""
    sim = simulate.simulate_bayesr(seed=78, N=200, M=96, n_causal=10,
                                   h2=0.5, n_groups=3)
    cva = np.tile(CVA, (3, 1))
    s = SpikeSlabSampler(sim.X, sim.Y, cva, GroupsConfig(block_size=16),
                         backend="pallas", dtype=jnp.float32,
                         g_assign=sim.g_assign, jacobi_blocks=2)
    st = s.init(jax.random.PRNGKey(9))
    for _ in range(5):
        st = s.step(st)
    assert np.isfinite(np.asarray(st.beta)).all()
    assert float(jnp.sum(st.pi)) > 0
