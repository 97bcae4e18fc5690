"""Fused multi-chain sweep vs C independent single-chain pallas sweeps.

The multi-chain kernel (ops/pallas_multichain.py) must reproduce the
single-chain kernel chain-by-chain when fed the same state and the same
variates: MC randomness is MARKER-indexed while the single-chain kernel is
POSITION-indexed, so the test remaps one onto the other through the shared
border/inner permutations.  In interpret mode both kernels evaluate the same
XLA ops in the same order, so the comparison is to float tolerance with
exact labels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import BayesRConfig, ChainConfig, GroupsConfig, \
    SpikeSlabSampler, simulate
from bayesrrcpp_tpu.ops import block_sweep as bs
from bayesrrcpp_tpu.ops.pallas_multichain import bayesr_sweep_pallas_mc
from bayesrrcpp_tpu.ops.pallas_sweep import bayesr_sweep_pallas

CVA = np.array([0.001, 0.01, 0.1])


def _pos_from_marker(p_m, border, inner, B):
    """Remap a (Mpad,) marker-indexed stream to the single-chain kernel's
    position-indexed layout: position b*B + s drives marker
    border[b]*B + inner[border[b], s]."""
    border = np.asarray(border)
    inner = np.asarray(inner)
    p_m = np.asarray(p_m)
    out = np.empty_like(p_m)
    for bpos, bb in enumerate(border):
        for s in range(B):
            out[bpos * B + s] = p_m[bb * B + inner[bb, s]]
    return out


def _mc_vs_single(sim, cva, g_assign=None, C=3, iters=2):
    kw = {} if g_assign is None else dict(g_assign=g_assign)
    cfg = (BayesRConfig(block_size=32) if g_assign is None
           else GroupsConfig(block_size=32))
    s = SpikeSlabSampler(sim.X, sim.Y, cva, cfg, backend="pallas",
                         dtype=jnp.float32, **kw)
    d = s.data
    B, nb, Mpad, G, K = s.B, s.nb, s.Mpad, s.G, s.K

    rng = np.random.default_rng(0)
    states = []
    for c in range(C):
        st = s.init(jax.random.PRNGKey(100 + c))
        states.append({"eps": np.asarray(st.eps).copy(),
                       "beta": np.asarray(st.beta).copy(),
                       "labels": np.asarray(st.labels).copy(),
                       "pi": np.asarray(st.pi).copy(),
                       "sigmaE": float(st.sigmaE),
                       "sigmaGG": np.asarray(st.sigmaGG).copy()})

    for it in range(iters):
        border, inner = bs.block_orders(jax.random.PRNGKey(7 + it), nb, B)
        p_m = rng.uniform(size=(C, Mpad)).astype(np.float32)
        z_m = rng.normal(size=(C, Mpad)).astype(np.float32)

        # ---- fused multi-chain call
        mc = bayesr_sweep_pallas_mc(
            d.XT, d.gram, d.xsq,
            jnp.asarray(np.stack([st["eps"] for st in states])),
            jnp.asarray(np.stack([st["beta"] for st in states])),
            jnp.asarray(np.stack([st["labels"] for st in states])),
            border, inner, jnp.asarray(p_m), jnp.asarray(z_m),
            jnp.asarray(np.stack([st["pi"] for st in states])),
            d.cva,
            jnp.asarray([st["sigmaE"] for st in states], jnp.float32),
            jnp.asarray(np.stack([st["sigmaGG"] for st in states])),
            d.g_assign, d.valid, interpret=True)

        # ---- C single-chain calls with remapped randoms
        inner_np = np.asarray(inner)
        for c, st in enumerate(states):
            p_pos = _pos_from_marker(p_m[c], border, inner_np, B)
            z_pos = _pos_from_marker(z_m[c], border, inner_np, B)
            res = bayesr_sweep_pallas(
                d.XT, d.gram, d.xsq, jnp.asarray(st["eps"]),
                jnp.asarray(st["beta"]), jnp.asarray(st["labels"]),
                border, inner, jnp.asarray(p_pos), jnp.asarray(z_pos),
                jnp.asarray(st["pi"]), d.cva,
                jnp.asarray(st["sigmaE"], jnp.float32),
                jnp.asarray(st["sigmaGG"]), d.g_assign, d.valid,
                interpret=True)
            np.testing.assert_array_equal(
                np.asarray(mc.labels)[c], np.asarray(res.labels),
                err_msg=f"labels diverged chain {c} iter {it}")
            np.testing.assert_allclose(np.asarray(mc.beta)[c],
                                       np.asarray(res.beta),
                                       rtol=2e-5, atol=1e-7)
            np.testing.assert_allclose(np.asarray(mc.eps)[c],
                                       np.asarray(res.eps),
                                       rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(np.asarray(mc.v)[c],
                                       np.asarray(res.v).reshape(s.G, s.K),
                                       atol=0)
            np.testing.assert_allclose(
                np.asarray(mc.beta_acum)[c], np.asarray(res.beta_acum),
                rtol=2e-5, atol=1e-8)
            st["eps"] = np.asarray(mc.eps)[c].copy()
            st["beta"] = np.asarray(mc.beta)[c].copy()
            st["labels"] = np.asarray(mc.labels)[c].copy()


def test_mc_equals_single_ungrouped():
    sim = simulate.simulate_bayesr(seed=81, N=160, M=96, n_causal=12, h2=0.5)
    _mc_vs_single(sim, CVA)


@pytest.mark.slow
def test_mc_equals_single_groups():
    sim = simulate.simulate_bayesr(seed=82, N=140, M=64, n_causal=8, h2=0.5,
                                   n_groups=2)
    _mc_vs_single(sim, np.tile(CVA, (2, 1)), g_assign=sim.g_assign, C=2)


@pytest.mark.slow
def test_mc_fused_full_chain_recovery():
    """run_chains(fused=True): chains are independent, finite, and recover
    the simulated effects."""
    sim = simulate.simulate_bayesr(seed=83, N=250, M=96, n_causal=12, h2=0.6)
    s = SpikeSlabSampler(sim.X, sim.Y, CVA, BayesRConfig(block_size=32),
                         backend="pallas", dtype=jnp.float32)
    assert s.supports_fused_chains
    _, out = s.run_chains(jax.random.PRNGKey(3), 3,
                          ChainConfig(120, 60, 4), fused=True)
    beta = np.asarray(out["beta"])          # (n_emits, C, M)
    assert beta.shape[1] == 3
    assert np.isfinite(beta).all()
    bh = beta.mean(axis=0)
    for c in range(3):
        r = np.corrcoef(sim.beta_true, bh[c])[0, 1]
        assert r > 0.6, f"chain {c} recovery corr {r}"
    assert not np.allclose(bh[0], bh[1])


@pytest.mark.slow
def test_mc_fold_affine_int8():
    """Quantized no-missing X: fused MC == dense MC on the same matrix."""
    rng = np.random.default_rng(84)
    N, M = 150, 64
    dosage = rng.binomial(2, rng.uniform(0.2, 0.8, M), size=(N, M)).astype(float)
    means = dosage.mean(axis=0)
    sds = dosage.std(axis=0, ddof=1)
    dense = (dosage - means) / sds
    y = dense @ np.where(rng.random(M) < 0.1, 0.3, 0.0) + rng.normal(0, 0.7, N)

    cfg = BayesRConfig(block_size=32)
    s_d = SpikeSlabSampler(dense, y, CVA, cfg, backend="pallas",
                           dtype=jnp.float32)
    s_q = SpikeSlabSampler(dosage, y, CVA, cfg, x_dtype="int8",
                           dtype=jnp.float32)
    assert s_q._x_fold and s_q.supports_fused_chains
    C = 2
    keys = jax.random.split(jax.random.PRNGKey(9), C)
    st_d = jax.vmap(s_d.init)(keys)
    st_q = jax.vmap(s_q.init)(keys)
    for _ in range(2):
        st_d, st_q = s_d.step_chains(st_d), s_q.step_chains(st_q)
    np.testing.assert_array_equal(np.asarray(st_d.labels),
                                  np.asarray(st_q.labels))
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-6)
    np.testing.assert_allclose(np.asarray(st_d.eps), np.asarray(st_q.eps),
                               rtol=3e-4, atol=3e-5)


@pytest.mark.slow
def test_mc_quantized_missing_falls_back():
    rng = np.random.default_rng(85)
    dosage = rng.binomial(2, 0.4, size=(60, 32)).astype(float)
    dosage[0, 0] = np.nan
    y = rng.normal(size=60)
    s = SpikeSlabSampler(dosage, y, CVA, BayesRConfig(block_size=16),
                         x_dtype="int8", dtype=jnp.float32)
    assert not s.supports_fused_chains
    with pytest.raises(ValueError):
        s.run_chains(jax.random.PRNGKey(0), 2, ChainConfig(4, 2, 1),
                     fused=True)
    _, out = s.run_chains(jax.random.PRNGKey(0), 2, ChainConfig(6, 2, 2),
                          fused=None)  # auto-falls back to vmap
    assert np.isfinite(np.asarray(out["beta"])).all()


def test_hs_mc_equals_single():
    """Fused multi-chain horseshoe == C single-chain horseshoe sweeps."""
    from bayesrrcpp_tpu import HorseshoeConfig, HorseshoeSampler
    from bayesrrcpp_tpu.ops.pallas_multichain import horseshoe_sweep_pallas_mc
    from bayesrrcpp_tpu.ops.pallas_sweep import horseshoe_sweep_pallas

    sim = simulate.simulate_bayesr(seed=86, N=140, M=64, n_causal=8, h2=0.5)
    s = HorseshoeSampler(sim.X, sim.Y, HorseshoeConfig(A=0.05, block_size=32),
                         backend="pallas", dtype=jnp.float32)
    d = s.data
    B, nb, Mpad = s.B, s.nb, s.Mpad
    C = 3
    rng = np.random.default_rng(1)
    eps = np.stack([np.asarray(s.init(jax.random.PRNGKey(c)).eps)
                    for c in range(C)])
    beta = rng.normal(0, 0.05, (C, Mpad)).astype(np.float32)
    beta[:, s.M:] = 0.0
    lam = rng.uniform(0.5, 2.0, (C, Mpad)).astype(np.float32)
    tau = rng.uniform(0.01, 0.1, C).astype(np.float32)
    c2 = rng.uniform(0.5, 2.0, C).astype(np.float32)
    sE = rng.uniform(0.3, 0.8, C).astype(np.float32)
    z_m = rng.normal(size=(C, Mpad)).astype(np.float32)

    border, inner = bs.block_orders(jax.random.PRNGKey(11), nb, B)
    eps_mc, beta_mc = horseshoe_sweep_pallas_mc(
        d.XT, d.gram, d.xsq, jnp.asarray(eps), jnp.asarray(beta),
        border, inner, jnp.asarray(z_m), jnp.asarray(lam),
        jnp.asarray(tau), jnp.asarray(c2), jnp.asarray(sE), d.valid,
        interpret=True)
    inner_np = np.asarray(inner)
    for c in range(C):
        z_pos = _pos_from_marker(z_m[c], border, inner_np, B)
        eps_1, beta_1 = horseshoe_sweep_pallas(
            d.XT, d.gram, d.xsq, jnp.asarray(eps[c]), jnp.asarray(beta[c]),
            border, inner, jnp.asarray(z_pos), jnp.asarray(lam[c]),
            jnp.asarray(tau[c]), jnp.asarray(c2[c]), jnp.asarray(sE[c]),
            d.valid, interpret=True)
        np.testing.assert_allclose(np.asarray(beta_mc)[c], np.asarray(beta_1),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(eps_mc)[c], np.asarray(eps_1),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_hs_mc_full_chain():
    from bayesrrcpp_tpu import HorseshoeConfig, HorseshoeSampler

    sim = simulate.simulate_bayesr(seed=87, N=200, M=64, n_causal=8, h2=0.6)
    s = HorseshoeSampler(sim.X, sim.Y, HorseshoeConfig(A=0.05, block_size=32),
                         backend="pallas", dtype=jnp.float32)
    assert s.supports_fused_chains
    _, out = s.run_chains(jax.random.PRNGKey(4), 3, ChainConfig(80, 40, 4),
                          fused=True)
    beta = np.asarray(out["beta"])
    assert beta.shape[1] == 3 and np.isfinite(beta).all()
    assert not np.allclose(beta[:, 0], beta[:, 1])
