"""Golden test: jitted sampler vs the literal NumPy reference mirror.

Drives both implementations from identical jax.random keys for several full
Gibbs iterations; everything (labels, counts, effects, residuals, hypers)
must agree to f64 float-reassociation tolerance.  This pins the vectorised
engine to the reference C++ control flow (see tests/numpy_mirror.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import BayesRConfig, GroupsConfig, SpikeSlabSampler, simulate
from tests.numpy_mirror import mirror_step

CVA = np.array([0.001, 0.01, 0.1])


def _run_pair(sim, cva2, g_assign, config, variant, iters=3):
    s = SpikeSlabSampler(sim.X, sim.Y, cva2, config, g_assign=g_assign,
                         backend="scan", permutation="full",
                         dtype=jnp.float64)
    key = jax.random.PRNGKey(17)
    st = s.init(key)
    mirror = {
        # np copy: the production step donates its input buffers
        "key": jnp.asarray(np.asarray(st.key).copy()), "mu": float(st.mu),
        "beta": np.asarray(st.beta).copy(),
        "labels": np.asarray(st.labels).copy(),
        "eps": np.asarray(st.eps).copy(),
        "sigmaE": float(st.sigmaE),
        "sigmaGG": np.asarray(st.sigmaGG).copy(),
        "pi": np.asarray(st.pi).copy(),
    }
    cfg = {"cva": np.atleast_2d(cva2), "v0E": config.v0E, "s02E": config.s02E,
           "v0G": config.v0G, "s02G": config.s02G}
    XT = np.asarray(s.data.XT)
    xsq = np.asarray(s.data.xsq)
    gas = np.asarray(s.data.g_assign)
    valid = np.asarray(s.data.valid)
    for _ in range(iters):
        st = s.step(st)
        mirror = mirror_step(XT, xsq, gas, mirror, cfg, variant, s.Mpad, valid)
    return st, mirror


def _compare(st, mirror):
    np.testing.assert_array_equal(np.asarray(st.labels), mirror["labels"])
    np.testing.assert_allclose(np.asarray(st.beta), mirror["beta"],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.eps), mirror["eps"],
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(st.mu), mirror["mu"], rtol=1e-10)
    np.testing.assert_allclose(float(st.sigmaE), mirror["sigmaE"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(st.sigmaGG), mirror["sigmaGG"],
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(st.pi), mirror["pi"], rtol=1e-9)


def test_golden_ungrouped():
    sim = simulate.simulate_bayesr(seed=71, N=250, M=96, n_causal=12, h2=0.5)
    st, mirror = _run_pair(sim, CVA, None, BayesRConfig(block_size=32),
                           "bayesr")
    _compare(st, mirror)


def test_golden_grouped():
    sim = simulate.simulate_bayesr(seed=72, N=200, M=80, n_causal=10, h2=0.5,
                                   n_groups=2)
    cva2 = np.tile(CVA, (2, 1))
    st, mirror = _run_pair(sim, cva2, sim.g_assign,
                           GroupsConfig(block_size=32), "groups")
    _compare(st, mirror)
