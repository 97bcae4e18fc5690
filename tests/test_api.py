"""Tests of the reference-compatible functional API and IO layer.

Checks each entry point writes the reference CSV schema (SURVEY.md section
3.5) with aligned header/rows, and that checkpoints round-trip bitwise.
"""
import csv
import os

import numpy as np
import pytest

from bayesrrcpp_tpu import api, simulate
from bayesrrcpp_tpu.io import checkpoint as ckpt
from bayesrrcpp_tpu.io.sink import assemble_rows, csv_header


@pytest.fixture(scope="module")
def sim():
    return simulate.simulate_bayesr(seed=41, N=200, M=80, n_causal=10, h2=0.5)


def _read_csv(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split(",")
        rows = [r.split(", ") for r in f.read().strip().split("\n") if r]
    return header, rows


def test_bayesr_sampler_v2(tmp_path, sim):
    out = tmp_path / "c1.csv"
    state = api.BayesRSamplerV2(str(out), 2, 40, 20, 5, sim.X, sim.Y,
                                0.01, 0.001, 0.001, 0.001, 0.001,
                                np.array([0.001, 0.01, 0.1]), block_size=32)
    header, rows = _read_csv(out)
    M, N = 80, 200
    assert len(header) == 2 + 2 * M + 2 + N
    assert header[0] == "iteration" and header[1] == "mu"
    assert header[2 + M] == "sigmaE" and header[3 + M] == "sigmaG"
    assert all(len(r) == len(header) for r in rows)
    assert float(rows[0][0]) == 20.0  # first emission at burn_in
    assert int(state.iteration) == 40


def test_groups_and_restart_roundtrip(tmp_path, sim):
    g_assign = np.arange(80) % 2
    fixed = np.random.default_rng(0).normal(size=(200, 2))
    cva = np.tile([0.001, 0.01, 0.1], (2, 1))
    out = tmp_path / "c2.csv"
    state = api.BayesRSamplerV2Groups(str(out), 3, 30, 15, 3, sim.X, sim.Y,
                                      0.01, 0.001, 0.001, 0.001, 0.001,
                                      cva, 2, g_assign, fixed, block_size=32)
    header, rows = _read_csv(out)
    assert header[-1] == "sigmaF"
    assert all(len(r) == len(header) for r in rows)

    # reference-style restart from the final state (BRV2Grstart contract)
    out2 = tmp_path / "c3.csv"
    M = 80
    api.BRV2Grstart(str(out2), 4, 20, 10, 2,
                    float(state.mu), np.asarray(state.beta)[:M],
                    float(state.sigmaE), np.asarray(state.sigmaGG),
                    sim.X, np.asarray(state.eps),
                    np.asarray(state.labels)[:M],
                    0.01, 0.001, 0.001, 0.001, 0.001, cva, 2, g_assign,
                    block_size=32)
    header3, rows3 = _read_csv(out2)
    assert "alpha[1]" not in header3  # no fixed effects in the restart variant
    assert all(len(r) == len(header3) for r in rows3)


def test_horseshoe_api(tmp_path, sim):
    out = tmp_path / "c4.csv"
    api.HorseshoeR(str(out), 5, 30, 15, 3, sim.X, sim.Y,
                   0.1, 0.001, 0.001, 1.0, 1.0, 1.0, 10.0, 10.0,
                   block_size=32)
    header, rows = _read_csv(out)
    assert "tau" in header and "lambda[1]" in header
    assert all(len(r) == len(header) for r in rows)


def test_emit_epsilon_optional(tmp_path, sim):
    out = tmp_path / "noeps.csv"
    api.BayesRSamplerV2(str(out), 2, 25, 20, 1, sim.X, sim.Y,
                        0.01, 0.001, 0.001, 0.001, 0.001,
                        np.array([0.01, 0.1]), block_size=32,
                        emit_epsilon=False)
    header, rows = _read_csv(out)
    assert not any(h.startswith("epsilon") for h in header)
    assert all(len(r) == len(header) for r in rows)


def test_checkpoint_roundtrip_bitwise(tmp_path, sim):
    import jax
    import jax.numpy as jnp

    from bayesrrcpp_tpu import BayesRConfig, SpikeSlabSampler

    s = SpikeSlabSampler(sim.X, sim.Y, np.array([0.01, 0.1]),
                         BayesRConfig(block_size=32), dtype=jnp.float64)
    st = s.init(jax.random.PRNGKey(7))
    for _ in range(3):
        st = s.step(st)
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, st)
    st2 = ckpt.load_checkpoint(path)
    # continue both chains; must be bitwise identical (incl. PRNG key)
    a, b = st, st2
    for _ in range(3):
        a, b = s.step(a), s.step(b)
    np.testing.assert_array_equal(np.asarray(a.beta), np.asarray(b.beta))
    np.testing.assert_array_equal(np.asarray(a.eps), np.asarray(b.eps))
    np.testing.assert_array_equal(np.asarray(a.key), np.asarray(b.key))
