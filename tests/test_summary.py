"""Tests for multi-chain vmap and posterior summaries (PVE etc.)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import BayesRConfig, ChainConfig, SpikeSlabSampler, simulate
from bayesrrcpp_tpu.utils import summary

# every test consumes the module-scoped 4-chain 300-iteration run
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def run():
    sim = simulate.simulate_bayesr(seed=51, N=400, M=150, n_causal=20, h2=0.5)
    s = SpikeSlabSampler(sim.X, sim.Y, np.array([0.001, 0.01, 0.1]),
                         BayesRConfig(block_size=32), dtype=jnp.float64)
    chain = ChainConfig(max_iterations=300, burn_in=150, thinning=3)
    states, out = s.run_chains(jax.random.PRNGKey(0), 4, chain)
    return sim, s, states, out


def test_multi_chain_shapes_and_independence(run):
    sim, s, states, out = run
    n_emits = len(list(ChainConfig(300, 150, 3).emit_iterations()))
    assert out["beta"].shape == (n_emits, 4, s.M)
    assert out["sigmaE"].shape == (n_emits, 4)
    # chains must differ (independent keys)
    assert not np.allclose(out["beta"][:, 0], out["beta"][:, 1])
    # ...but agree statistically on sigmaE
    means = out["sigmaE"].mean(axis=0)
    assert means.std() / means.mean() < 0.2


def test_pve_and_heritability(run):
    sim, s, states, out = run
    flat = {k: v.reshape(-1, *v.shape[2:]) for k, v in out.items() if v.size}
    p = summary.pve(flat, sim.X, sim.Y)
    assert p == pytest.approx(sim.h2, abs=0.15)
    h2 = summary.heritability_samples(flat)
    assert 0.2 < h2.mean() < 0.8


def test_inclusion_and_prediction(run):
    sim, s, states, out = run
    flat = {k: v.reshape(-1, *v.shape[2:]) for k, v in out.items() if v.size}
    pip = summary.inclusion_probabilities(flat)
    causal = sim.beta_true != 0
    big = np.abs(sim.beta_true) > np.sqrt(0.5 / 20)  # above-average effects
    # the tiniest mixture component (cva=0.001) absorbs noise markers, so the
    # background inclusion rate is ~pi_slab; big effects must be near-certain
    assert pip[big].mean() > 0.9
    assert pip[~causal].mean() < 0.65
    pred = summary.predict(flat, sim.X)
    assert np.corrcoef(pred, sim.Y)[0, 1] > 0.6


def test_chain_timer():
    from bayesrrcpp_tpu.utils.profiling import ChainTimer, trace

    t = ChainTimer(markers=1000)
    with t.compile():
        pass
    with t.measure(10):
        import time
        time.sleep(0.01)
    d = t.stats.as_dict()
    assert d["iterations"] == 10
    assert d["snp_updates_per_sec"] > 0
    with trace(None):  # no-op path
        pass


def test_split_rhat_and_ess():
    rng = np.random.default_rng(0)
    # well-mixed iid chains: rhat ~ 1, ess ~ total draws
    x = rng.normal(size=(400, 4))
    r = summary.split_rhat(x)
    assert abs(r - 1.0) < 0.05
    e = summary.ess(x)
    assert e > 0.5 * 400 * 4
    # divergent chain means: rhat far above 1
    y = x + np.array([0.0, 0.0, 5.0, 0.0])
    assert summary.split_rhat(y) > 1.5
    # AR(1) autocorrelation cuts ess well below the draw count
    z = np.empty((400, 4))
    z[0] = rng.normal(size=4)
    for t in range(1, 400):
        z[t] = 0.9 * z[t - 1] + rng.normal(size=4) * np.sqrt(1 - 0.81)
    assert summary.ess(z) < 0.3 * 400 * 4
    # trailing parameter axes broadcast
    xb = rng.normal(size=(200, 4, 3))
    rb = summary.split_rhat(xb)
    assert rb.shape == (3,) and np.all(np.abs(rb - 1) < 0.1)
    eb = summary.ess(xb)
    assert eb.shape == (3,)
