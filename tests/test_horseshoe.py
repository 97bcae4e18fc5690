"""End-to-end tests of the regularized-horseshoe sampler (C4).

Mirrors the reference's embedded smoke recipe (src/HorseshoeR.cpp:304-331):
sparse effects, dense shrinkage recovery, plus the blocked-vs-scan exactness
invariant shared with the mixture samplers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import ChainConfig, HorseshoeConfig, HorseshoeSampler, simulate


def _hs_config(N, M, n_causal):
    # the reference smoke script's hyper recipe (src/HorseshoeR.cpp:315-323)
    A = (1.0 / np.sqrt(N)) * n_causal / (M - n_causal)
    return HorseshoeConfig(A=A, v0E=0.001, s02E=0.001, vL=1.0, vT=1.0,
                           c2=1.0, vC=10.0, sC=10.0, block_size=64)


@pytest.fixture(scope="module")
def sim():
    return simulate.simulate_bayesr(seed=21, N=600, M=400, n_causal=30, h2=0.5)


def test_blocked_equals_scan(sim):
    cfg = _hs_config(600, 400, 30)
    s_b = HorseshoeSampler(sim.X, sim.Y, cfg, backend="blocked", dtype=jnp.float64)
    s_s = HorseshoeSampler(sim.X, sim.Y, cfg, backend="scan",
                           permutation="blocked", dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    st_b, st_s = s_b.init(key), s_s.init(key)
    for _ in range(3):
        st_b, st_s = s_b.step(st_b), s_s.step(st_s)
    np.testing.assert_allclose(np.asarray(st_b.beta), np.asarray(st_s.beta),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_b.eps), np.asarray(st_s.eps),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(st_b.tau), float(st_s.tau), rtol=1e-8)


def test_residual_invariant(sim):
    cfg = _hs_config(600, 400, 30)
    s = HorseshoeSampler(sim.X, sim.Y, cfg, backend="blocked", dtype=jnp.float64)
    st = s.init(jax.random.PRNGKey(1))
    for _ in range(5):
        st = s.step(st)
    eps_direct = sim.Y - float(st.mu) - sim.X @ np.asarray(st.beta)[: s.M]
    np.testing.assert_allclose(np.asarray(st.eps), eps_direct, atol=1e-8)


def test_recovery(sim):
    cfg = _hs_config(600, 400, 30)
    s = HorseshoeSampler(sim.X, sim.Y, cfg, backend="blocked", dtype=jnp.float64)
    chain = ChainConfig(max_iterations=800, burn_in=400, thinning=2)
    _, out = s.run(jax.random.PRNGKey(2), chain)
    beta_hat = out["beta"].mean(axis=0)
    corr = np.corrcoef(sim.beta_true, beta_hat)[0, 1]
    assert corr > 0.8
    slope = np.polyfit(sim.beta_true, beta_hat, 1)[0]
    assert 0.5 < slope < 1.3
    assert out["lambda"].shape[1] == s.M
    assert np.all(out["tau"] > 0)
    sigmaE_hat = out["sigmaE"].mean()
    noise_var = np.var(sim.Y - sim.X @ sim.beta_true)
    assert sigmaE_hat == pytest.approx(noise_var, rel=0.4)


def test_multi_chain(sim):
    cfg = _hs_config(600, 400, 30)
    s = HorseshoeSampler(sim.X, sim.Y, cfg, backend="blocked",
                         dtype=jnp.float64)
    chain = ChainConfig(max_iterations=200, burn_in=100, thinning=4)
    states, out = s.run_chains(jax.random.PRNGKey(9), 3, chain)
    n_emits = len(list(chain.emit_iterations()))
    assert out["beta"].shape == (n_emits, 3, s.M)
    assert not np.allclose(out["beta"][:, 0], out["beta"][:, 1])
    assert np.isfinite(out["tau"]).all()
