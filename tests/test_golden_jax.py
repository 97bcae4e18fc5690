"""Direct C++ <-> JAX parity (VERDICT round-2 #4): the compiled reference
binary's CSV rows vs a chain driven through the PRODUCTION JAX sweep
(ops/sweep.bayesr_sweep_scan -- the exact function the backend="scan"
sampler runs) consuming the reference's own recorded variate tape.  No
hand-written Python mirror sits in this trust chain: the marker sweep (the
part with all the control flow -- selection loop, overflow guard, visit
order, src/BayesRv2.cpp:186-245) is the production JAX code itself; only
the four scalar hyper draws are injected by recorded value.

Variate extraction needs no model replay: every marker update consumes one
'beta 1 1' uniform first (src/BayesRv2.cpp:213); a 'norm mu var' record
directly after it belongs to that same marker (slab effect draw,
src/BayesRv2.cpp:228), and its standard variate is recovered as
z = (value - mu)/sqrt(var) from the record's own arguments.
"""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bayesrrcpp_tpu.ops.sweep import bayesr_sweep_scan  # noqa: E402
from tests import golden_cpp as gc  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.environ.get("GRAFT_REF", "/root/reference")),
    reason="reference tree not available")

HYPS = (0.001, 0.001, 0.001, 0.001)


def _extract_chain(recs, M, max_iter):
    """Split the flat trace into per-iteration (mu, order, p, z, slab_mask,
    sigmaG, sigmaE, pi) without replaying any model math."""
    i = 0

    def take(tag):
        nonlocal i
        r = recs[i]
        assert r.tag == tag, (i, r.tag, tag)
        i += 1
        return r

    sigmaG0 = take("beta").vals[0]
    iters = []
    for _ in range(max_iter):
        mu = take("norm").vals[0]
        order = np.array(take("perm").vals, np.int64)
        p = np.zeros(M)
        z = np.zeros(M)
        for pos in range(M):
            p[pos] = take("beta").vals[0]
            if recs[i].tag == "norm":
                r = take("norm")
                mu_arg, var_arg = r.args
                z[pos] = (r.vals[0] - mu_arg) / np.sqrt(var_arg)
        sigmaG = take("isc").vals[0]
        sigmaE = take("isc").vals[0]
        pi = np.array(recs[i].vals)
        i += 1
        iters.append((mu, order, p, z, sigmaG, sigmaE, pi))
    assert i == len(recs), f"{len(recs) - i} unconsumed draws"
    return sigmaG0, iters


def test_golden_jax_bayesr(tmp_path):
    N, M = 300, 120
    K = 4
    rng = np.random.default_rng(11)
    X = rng.standard_normal((N, M))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    bt = np.zeros(M)
    bt[rng.choice(M, 10, replace=False)] = rng.normal(0, np.sqrt(0.05), 10)
    g = X @ bt
    Y = g + rng.normal(0, np.sqrt(max(1 - g.var(), 0.1)), N)
    Y = Y - Y.mean()
    cva = np.array([0.001, 0.01, 0.1])

    bins = gc.build_binaries()
    if bins is None:
        pytest.skip("g++ or reference tree unavailable")
    inp = str(tmp_path / "in.bin")
    gc.write_bayesr_input(inp, X, Y, cva)
    max_iter, burn_in = 14, 10
    csv, trace = gc.run_ref(bins["bayesr"], inp, str(tmp_path),
                            [max_iter, burn_in, 1, 1.0, *HYPS], seed=21)
    sigmaG0, iters = _extract_chain(gc.parse_trace(trace), M, max_iter)
    _, csv_rows = gc.read_csv_rows(csv)

    # drive the production sweep with the reference's variates
    f64 = jnp.float64
    XT = jnp.asarray(X.T, f64)
    xsq = jnp.sum(XT * XT, axis=1)
    beta = jnp.zeros(M, f64)
    labels = jnp.zeros(M, jnp.int32)
    mu = 0.0
    eps = jnp.asarray(Y, f64)
    sigmaG = sigmaG0
    sigmaE = float(jnp.sum(eps * eps)) / N * 0.5
    # iteration-0 prior pi reproduces the reference's uninitialized read
    # (src/BayesRv2.cpp:150; NaN slab entries under the shim's zero-init):
    # NaN logL means no component is ever selected, in C++ and JAX alike
    pi = np.full(K, np.nan)
    pi[0] = 0.5
    gas = jnp.zeros(M, jnp.int32)
    valid = jnp.ones(M, bool)
    cva2 = jnp.asarray(cva, f64).reshape(1, K - 1)

    sweep = jax.jit(bayesr_sweep_scan)
    matched = 0
    for it, (mu_t, order, p, z, sigmaG_t, sigmaE_t, pi_t) in enumerate(iters):
        eps = eps + mu
        mu = mu_t
        eps = eps - mu
        eps, beta, labels, v, bacc = sweep(
            XT, xsq, eps, beta, labels, jnp.asarray(order),
            jnp.asarray(p, f64), jnp.asarray(z, f64),
            jnp.asarray(pi, f64).reshape(1, K), cva2,
            jnp.asarray(sigmaE, f64), jnp.asarray([sigmaG], f64),
            gas, valid)
        sigmaG, sigmaE, pi = sigmaG_t, sigmaE_t, pi_t
        if it in csv_rows:
            row = csv_rows[it]
            np.testing.assert_array_equal(
                np.asarray(labels, np.float64), row[4 + M:4 + 2 * M],
                err_msg=f"iter {it}: labels")
            np.testing.assert_allclose(row[1], mu, rtol=0, atol=0)
            np.testing.assert_allclose(
                np.asarray(beta), row[2:2 + M], rtol=1e-9, atol=1e-12,
                err_msg=f"iter {it}: beta")
            np.testing.assert_allclose(
                row[2 + M:4 + M], [sigmaE, sigmaG], rtol=0, atol=0)
            np.testing.assert_allclose(
                np.asarray(eps), row[4 + 2 * M:], rtol=1e-8, atol=1e-10,
                err_msg=f"iter {it}: eps")
            matched += 1
    assert matched >= 3, "too few CSV rows matched"
