"""Transposed strided-rounds Jacobi kernels (ops/pallas_jacobi_t.py).

Exactness strategy: the t-kernel sweeps the SAME marker partition as a
row-layout sweep whose block_order is ``strided_border(rho, J)``, so the
XLA oracle (ops/block_sweep.bayesr_jacobi_sweep) pins it exactly -- the
only convention difference is that the t-kernel consumes the position-
indexed p/z streams in CANONICAL slab order (operands are built rho-free;
rho applies in the kernel's scalar-prefetch index maps), so the oracle
gets the canonically-assigned stream re-ordered to visit order.

The multi-chain kernel must equal C independent single-chain t-runs with
the same per-chain streams (labels and v bit-exact) -- the round-3
VERDICT's mc-vs-oracle equality ask.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import BayesRConfig, ChainConfig, HorseshoeConfig, \
    HorseshoeSampler, SpikeSlabSampler, simulate
from bayesrrcpp_tpu.ops import block_sweep as bs
from bayesrrcpp_tpu.ops.pallas_jacobi import auto_jacobi_plan
from bayesrrcpp_tpu.ops.pallas_jacobi_t import (bayesr_jacobi_t_pallas,
                                                bayesr_jacobi_t_pallas_mc,
                                                horseshoe_jacobi_t_pallas)
from test_jacobi import _hs_sweep_args, _nomissing_dosage, _sweep_args, CVA


def _visit(arr, rho, J, B):
    """Canonical-slab-assigned position stream as seen in visit order."""
    nr = rho.shape[0]
    return jnp.take(arr.reshape(nr, J * B), rho, axis=0).reshape(-1)


@pytest.mark.parametrize("J,G,B,M", [(1, 1, 16, 128), (4, 1, 16, 128),
                                     (2, 3, 16, 128), (16, 2, 8, 256)])
def test_t_kernel_equals_oracle(J, G, B, M):
    args = list(_sweep_args(21 + J, N=96, M=M, B=B, G=G))
    nb = M // B
    rho, inner = bs.strided_orders(jax.random.PRNGKey(7 + J), nb, B, J)
    args_o = list(args)
    args_o[6], args_o[7] = bs.strided_border(rho, J), inner
    args_o[8] = _visit(args[8], rho, J, B)
    args_o[9] = _visit(args[9], rho, J, B)
    ref = bs.bayesr_jacobi_sweep(*args_o, J=J)
    out = bayesr_jacobi_t_pallas(*(args[:6] + [rho, inner] + args[8:]),
                                 J=J, interpret=True)
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


@pytest.mark.parametrize("J", [2, 8])
def test_hs_t_kernel_equals_oracle(J):
    args = list(_hs_sweep_args(51 + J, N=96, M=128, B=16))
    rho, inner = bs.strided_orders(jax.random.PRNGKey(3 + J), 8, 16, J)
    args_o = list(args)
    args_o[5], args_o[6] = bs.strided_border(rho, J), inner
    args_o[7] = _visit(args[7], rho, J, 16)
    eps_r, beta_r = bs.horseshoe_jacobi_sweep(*args_o, J=J)
    eps_o, beta_o = horseshoe_jacobi_t_pallas(
        *(args[:5] + [rho, inner] + args[7:]), J=J, interpret=True)
    np.testing.assert_allclose(np.asarray(beta_r), np.asarray(beta_o),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(eps_r), np.asarray(eps_o),
                               rtol=2e-4, atol=2e-5)


def _mc_args(seed, N, M, B, G, C):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, M)).astype(np.float32)
    XT = jnp.asarray(X.T)
    xsq = jnp.sum(XT * XT, axis=1)
    gram = bs.gram_blocks(XT, B)
    eps = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
    beta = jnp.zeros((C, M), jnp.float32).at[:, 3].set(0.25)
    labels = jnp.zeros((C, M), jnp.int32).at[:, 3].set(2)
    p = jnp.asarray(rng.uniform(0, 1, (C, M)).astype(np.float32))
    z = jnp.asarray(rng.normal(0, 1, (C, M)).astype(np.float32))
    pi = jnp.asarray(rng.dirichlet([5, 2, 2, 1], (C, G)).astype(np.float32))
    cva = jnp.tile(jnp.asarray([[0.001, 0.01, 0.1]], jnp.float32), (G, 1))
    sigmaE = jnp.asarray(rng.uniform(0.5, 1.0, C).astype(np.float32))
    sigmaGG = jnp.asarray(rng.uniform(0.02, 0.1, (C, G)).astype(np.float32))
    gas = jnp.asarray(np.arange(M) % G, jnp.int32)
    valid = jnp.ones(M, bool)
    return (XT, gram, xsq, eps, beta, labels, p, z, pi, cva, sigmaE,
            sigmaGG, gas, valid)


@pytest.mark.parametrize("J,G,C", [(4, 1, 2), (2, 3, 4)])
def test_mc_t_equals_single_chain_runs(J, G, C):
    """The fused multi-chain kernel == C independent single-chain runs
    with the same streams (labels/v exact)."""
    (XT, gram, xsq, eps, beta, labels, p, z, pi, cva, sigmaE,
     sigmaGG, gas, valid) = _mc_args(11 + J + C, 96, 128, 16, G, C)
    rho, inner = bs.strided_orders(jax.random.PRNGKey(9 + J), 8, 16, J)
    out = bayesr_jacobi_t_pallas_mc(
        XT, gram, xsq, eps, beta, labels, rho, inner, p, z,
        pi, cva, sigmaE, sigmaGG, gas, valid, J=J, interpret=True)
    for c in range(C):
        ref = bayesr_jacobi_t_pallas(
            XT, gram, xsq, eps[c], beta[c], labels[c], rho, inner,
            p[c], z[c], pi[c], cva, sigmaE[c], sigmaGG[c], gas, valid,
            J=J, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.labels),
                                      np.asarray(out.labels[c]))
        np.testing.assert_allclose(np.asarray(ref.beta),
                                   np.asarray(out.beta[c]),
                                   rtol=3e-4, atol=3e-6)
        np.testing.assert_allclose(np.asarray(ref.eps),
                                   np.asarray(out.eps[c]),
                                   rtol=3e-4, atol=3e-5)
        np.testing.assert_array_equal(np.asarray(ref.v),
                                      np.asarray(out.v[c]))


@pytest.mark.slow
def test_mc_t_group_split_equals_single_runs():
    """C=8 > the VMEM chain-group size: the group-split path must still
    equal 8 independent runs."""
    C, J, G = 8, 8, 2
    (XT, gram, xsq, eps, beta, labels, p, z, pi, cva, sigmaE,
     sigmaGG, gas, valid) = _mc_args(77, 96, 256, 8, G, C)
    rho, inner = bs.strided_orders(jax.random.PRNGKey(17), 32, 8, J)
    out = bayesr_jacobi_t_pallas_mc(
        XT, gram, xsq, eps, beta, labels, rho, inner, p, z,
        pi, cva, sigmaE, sigmaGG, gas, valid, J=J, interpret=True)
    for c in range(C):
        ref = bayesr_jacobi_t_pallas(
            XT, gram, xsq, eps[c], beta[c], labels[c], rho, inner,
            p[c], z[c], pi[c], cva, sigmaE[c], sigmaGG[c], gas, valid,
            J=J, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.labels),
                                      np.asarray(out.labels[c]))
        np.testing.assert_allclose(np.asarray(ref.beta),
                                   np.asarray(out.beta[c]),
                                   rtol=3e-4, atol=3e-6)


@pytest.mark.slow
@pytest.mark.parametrize("x_dtype", ["int8", "2bit"])
def test_t_fold_quantized_equals_dense(x_dtype):
    """Fold-affine quantized t-sweep == dense t-sweep (same chain keys)."""
    dosage, dense, y = _nomissing_dosage(41, 150, 96)
    cfg = BayesRConfig(block_size=16)
    s_d = SpikeSlabSampler(dense, y, CVA, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    s_q = SpikeSlabSampler(dosage, y, CVA, cfg, x_dtype=x_dtype,
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
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
def test_mc_t_fold_quantized_equals_dense():
    """Fused multi-chain fold-affine 2-bit == dense, through step_chains."""
    dosage, dense, y = _nomissing_dosage(41, 150, 96)
    cfg = BayesRConfig(block_size=16)
    s_d = SpikeSlabSampler(dense, y, CVA, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    s_q = SpikeSlabSampler(dosage, y, CVA, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    C = 3
    ks = jax.random.split(jax.random.PRNGKey(42), C)
    st_d = jax.vmap(s_d.init)(ks)
    st_q = jax.vmap(s_q.init)(ks)
    for _ in range(3):
        st_d, st_q = s_d.step_chains(st_d), s_q.step_chains(st_q)
    np.testing.assert_array_equal(np.asarray(st_d.labels),
                                  np.asarray(st_q.labels))
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-6)


@pytest.mark.slow
def test_hs_t_fold_quantized_equals_dense():
    dosage, dense, y = _nomissing_dosage(43, 150, 96)
    cfg = HorseshoeConfig(block_size=16)
    h_d = HorseshoeSampler(dense, y, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    h_q = HorseshoeSampler(dosage, y, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    assert h_q._x_fold
    key = jax.random.PRNGKey(44)
    st_d, st_q = h_d.init(key), h_q.init(key)
    for _ in range(3):
        st_d, st_q = h_d.step(st_d), h_q.step(st_q)
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-6)
    np.testing.assert_allclose(float(st_d.sigmaE), float(st_q.sigmaE),
                               rtol=2e-4)


@pytest.mark.slow
def test_t_sampler_recovery():
    """Statistical validation of the strided-rounds Markov kernel: effect
    recovery on the embedded-smoke recipe (src/BayesRv2.cpp:298-315
    scaled down), the standard the sharded block-Jacobi sampler is held
    to."""
    sim = simulate.simulate_bayesr(seed=77, N=400, M=160, n_causal=16,
                                   h2=0.5)
    s = SpikeSlabSampler(sim.X, sim.Y, CVA, BayesRConfig(block_size=16),
                         backend="pallas", dtype=jnp.float32,
                         jacobi_blocks=5, jacobi_layout="t")
    _, out = s.run(jax.random.PRNGKey(7), ChainConfig(150, 75, 5))
    bh = out["beta"].mean(axis=0)
    corr = np.corrcoef(sim.beta_true, bh)[0, 1]
    assert corr > 0.8, corr
    assert np.isfinite(out["sigmaE"]).all()


def test_auto_jacobi_plan_selection():
    """Pin the auto plan at the shapes that matter (round-3 VERDICT ask:
    selection changes must be visible in review, not only in bench
    artifacts)."""
    # biobank headline M: transposed kernel, J=128 lanes, 4096 window
    assert auto_jacobi_plan(503_808, 512) == (128, 32, "t")
    # dense bench shape
    assert auto_jacobi_plan(49_152, 512) == (128, 32, "t")
    # vignette scale: padding unavoidable, largest window under M/8;
    # B floors at 32 (smaller blocks fail Mosaic layout on real TPUs)
    assert auto_jacobi_plan(10_000, 512) == (32, 32, "t")
    # tiny M: no transposed plan -> row-layout fallback (J=1 sequential)
    j, b, lay = auto_jacobi_plan(96, 512)
    assert lay == "row" and j == 1


def test_strided_border_is_permutation():
    rho, inner = bs.strided_orders(jax.random.PRNGKey(0), 24, 8, 4)
    border = np.asarray(bs.strided_border(rho, 4))
    assert sorted(border.tolist()) == list(range(24))
    inn = np.asarray(inner)
    assert inn.shape == (24, 8)
    assert all(sorted(r.tolist()) == list(range(8)) for r in inn)


def test_planned_mpad_matches_sampler():
    """Drift guard: planned_mpad (used by host loaders to pre-pad packed
    words) must equal the Mpad the auto-plan sampler actually picks."""
    from bayesrrcpp_tpu.ops.pallas_jacobi import planned_mpad

    rng = np.random.default_rng(0)
    for M in (96, 100, 1024, 2048, 10_000, 49_152):
        N = 64
        X = rng.standard_normal((N, M)).astype(np.float32)
        Y = rng.standard_normal(N).astype(np.float32)
        s = SpikeSlabSampler(X, Y, CVA, BayesRConfig(), backend="pallas",
                             dtype=jnp.float32)
        assert s.Mpad == planned_mpad(M), (M, s.Mpad, planned_mpad(M))


@pytest.mark.parametrize("C", [2, 4])
def test_hs_mc_t_equals_single_chain_runs(C):
    """Fused multi-chain horseshoe == C independent single-chain t-runs."""
    from bayesrrcpp_tpu.ops.pallas_jacobi_t import (
        horseshoe_jacobi_t_pallas_mc)

    rng = np.random.default_rng(23 + C)
    N, M, B, J = 96, 128, 16, 4
    X = rng.standard_normal((N, M)).astype(np.float32)
    XT = jnp.asarray(X.T)
    xsq = jnp.sum(XT * XT, axis=1)
    gram = bs.gram_blocks(XT, B)
    eps = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
    beta = jnp.zeros((C, M), jnp.float32).at[:, 3].set(0.25)
    z = jnp.asarray(rng.normal(0, 1, (C, M)).astype(np.float32))
    lam = jnp.asarray(rng.uniform(0.1, 2.0, (C, M)).astype(np.float32))
    tau = jnp.asarray(rng.uniform(0.01, 0.1, C).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(1.0, 2.0, C).astype(np.float32))
    sigmaE = jnp.asarray(rng.uniform(0.5, 1.0, C).astype(np.float32))
    valid = jnp.ones(M, bool)
    rho, inner = bs.strided_orders(jax.random.PRNGKey(13), M // B, B, J)
    eps_o, beta_o = horseshoe_jacobi_t_pallas_mc(
        XT, gram, xsq, eps, beta, rho, inner, z, lam, tau, c2, sigmaE,
        valid, J=J, interpret=True)
    for c in range(C):
        e_r, b_r = horseshoe_jacobi_t_pallas(
            XT, gram, xsq, eps[c], beta[c], rho, inner, z[c], lam[c],
            tau[c], c2[c], sigmaE[c], valid, J=J, interpret=True)
        np.testing.assert_allclose(np.asarray(b_r), np.asarray(beta_o[c]),
                                   rtol=3e-4, atol=3e-6)
        np.testing.assert_allclose(np.asarray(e_r), np.asarray(eps_o[c]),
                                   rtol=3e-4, atol=3e-5)


# ------------------------------------------------- missing-data fast path

def _missing_dosage(seed, N, M, frac=0.03):
    """Dosage matrix with sparse NaN missing calls plus its exact dense
    equivalent (standardized, missing -> 0 = mean imputation -- the same
    decode the serial in-kernel-missing path applies)."""
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.2, 0.8, M)
    dosage = rng.binomial(2, freqs, size=(N, M)).astype(float)
    mask = rng.random(dosage.shape) < frac
    mask[0, :] = False  # keep every marker observed at least once
    dosage[mask] = np.nan
    means = np.nanmean(dosage, axis=0)
    sds = np.nanstd(dosage, axis=0, ddof=1)
    dense = np.where(np.isnan(dosage), 0.0, (dosage - means) / sds)
    beta_t = np.zeros(M)
    beta_t[rng.choice(M, 8, replace=False)] = rng.normal(0, 0.3, 8)
    y = dense @ beta_t + rng.normal(0, 0.7, N)
    return dosage, dense, y


@pytest.mark.slow
@pytest.mark.parametrize("jacobi", [1, 3])
def test_t_missing_packed_equals_dense(jacobi):
    """2-bit packed X WITH missing calls must equal the dense sampler on
    the exact mean-imputed standardized matrix -- at J=1 through the
    serial in-kernel-missing kernel (the pre-existing path), at J>1
    through the NEW transposed-Jacobi sparse-correction fast path; both
    against the same dense anchor, so the two packed paths agree with
    each other (round-4 VERDICT ask #1)."""
    dosage, dense, y = _missing_dosage(83, 150, 96)
    cfg = BayesRConfig(block_size=16)
    kw = ({"jacobi_blocks": 1} if jacobi == 1
          else {"jacobi_blocks": jacobi, "jacobi_layout": "t"})
    s_d = SpikeSlabSampler(dense, y, CVA, cfg, backend="pallas",
                           dtype=jnp.float32, **kw)
    s_q = SpikeSlabSampler(dosage, y, CVA, cfg, x_dtype="2bit",
                           dtype=jnp.float32, **kw)
    assert s_q._x_miss and not s_q._x_fold
    assert s_q.jacobi == jacobi  # no silent fallback to J=1
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
    # eps pad lanes must stay exactly zero (miss mode: pads decode to 0)
    pad_lanes = ~np.asarray(s_q.data.row_valid)
    assert np.all(np.asarray(st_q.eps)[pad_lanes] == 0.0)


@pytest.mark.slow
def test_mc_t_missing_packed_equals_dense():
    """Fused multi-chain sweep with packed-missing X == dense, through
    step_chains (supports_fused_chains must include the missing path)."""
    dosage, dense, y = _missing_dosage(85, 150, 96)
    cfg = BayesRConfig(block_size=16)
    s_d = SpikeSlabSampler(dense, y, CVA, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    s_q = SpikeSlabSampler(dosage, y, CVA, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    assert s_q.supports_fused_chains
    C = 3
    ks = jax.random.split(jax.random.PRNGKey(47), C)
    st_d = jax.vmap(s_d.init)(ks)
    st_q = jax.vmap(s_q.init)(ks)
    for _ in range(3):
        st_d, st_q = s_d.step_chains(st_d), s_q.step_chains(st_q)
    np.testing.assert_array_equal(np.asarray(st_d.labels),
                                  np.asarray(st_q.labels))
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-6)


@pytest.mark.slow
def test_hs_t_missing_packed_equals_dense():
    dosage, dense, y = _missing_dosage(87, 150, 96)
    cfg = HorseshoeConfig(block_size=16)
    h_d = HorseshoeSampler(dense, y, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    h_q = HorseshoeSampler(dosage, y, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    assert h_q._x_miss and h_q.jacobi == 3
    key = jax.random.PRNGKey(48)
    st_d, st_q = h_d.init(key), h_q.init(key)
    for _ in range(3):
        st_d, st_q = h_d.step(st_d), h_q.step(st_q)
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(float(st_d.sigmaE), float(st_q.sigmaE),
                               rtol=2e-4)


@pytest.mark.slow
def test_hs_mc_t_missing_packed_equals_dense():
    dosage, dense, y = _missing_dosage(89, 150, 96)
    cfg = HorseshoeConfig(block_size=16)
    h_d = HorseshoeSampler(dense, y, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    h_q = HorseshoeSampler(dosage, y, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    assert h_q.supports_fused_chains
    C = 2
    ks = jax.random.split(jax.random.PRNGKey(51), C)
    st_d = jax.vmap(h_d.init)(ks)
    st_q = jax.vmap(h_q.init)(ks)
    for _ in range(3):
        st_d, st_q = h_d.step_chains(st_d), h_q.step_chains(st_q)
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("frac_missing", [0.0, 0.03])
def test_mc8_wide_packed_equals_dense(frac_missing):
    """C=8 fused chains through the WIDE mc kernel (one X stream + one
    decode for all chains, ops/pallas_jacobi_t._jacobi_t_mc8_kernel) must
    equal the dense sampler, in both fold-affine and missing modes
    (round-4 VERDICT ask #8)."""
    if frac_missing:
        dosage, dense, y = _missing_dosage(91, 150, 96, frac=frac_missing)
    else:
        dosage, dense, y = _nomissing_dosage(91, 150, 96)
    cfg = BayesRConfig(block_size=16)
    s_d = SpikeSlabSampler(dense, y, CVA, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    s_q = SpikeSlabSampler(dosage, y, CVA, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    C = 8  # > the 4-chain VMEM group -> the wide kernel
    ks = jax.random.split(jax.random.PRNGKey(53), C)
    st_d = jax.vmap(s_d.init)(ks)
    st_q = jax.vmap(s_q.init)(ks)
    for _ in range(2):
        st_d, st_q = s_d.step_chains(st_d), s_q.step_chains(st_q)
    np.testing.assert_array_equal(np.asarray(st_d.labels),
                                  np.asarray(st_q.labels))
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(st_d.sigmaE),
                               np.asarray(st_q.sigmaE), rtol=2e-4)


@pytest.mark.slow
def test_hs_mc8_wide_equals_single_runs():
    """C=8 fused horseshoe chains through the WIDE mc kernel == 8
    independent single-chain t-runs."""
    from bayesrrcpp_tpu.ops.pallas_jacobi_t import (
        horseshoe_jacobi_t_pallas_mc)

    rng = np.random.default_rng(61)
    N, M, B, J, C = 96, 256, 8, 8, 8
    X = rng.standard_normal((N, M)).astype(np.float32)
    XT = jnp.asarray(X.T)
    xsq = jnp.sum(XT * XT, axis=1)
    gram = bs.gram_blocks(XT, B)
    eps = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
    beta = jnp.zeros((C, M), jnp.float32).at[:, 3].set(0.25)
    z = jnp.asarray(rng.normal(0, 1, (C, M)).astype(np.float32))
    lam = jnp.asarray(rng.uniform(0.1, 2.0, (C, M)).astype(np.float32))
    tau = jnp.asarray(rng.uniform(0.01, 0.1, C).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(1.0, 2.0, C).astype(np.float32))
    sigmaE = jnp.asarray(rng.uniform(0.5, 1.0, C).astype(np.float32))
    valid = jnp.ones(M, bool)
    rho, inner = bs.strided_orders(jax.random.PRNGKey(29), M // B, B, J)
    eps_o, beta_o = horseshoe_jacobi_t_pallas_mc(
        XT, gram, xsq, eps, beta, rho, inner, z, lam, tau, c2, sigmaE,
        valid, J=J, interpret=True)      # C=8 -> wide kernel
    for c in range(C):
        e_r, b_r = horseshoe_jacobi_t_pallas(
            XT, gram, xsq, eps[c], beta[c], rho, inner, z[c], lam[c],
            tau[c], c2[c], sigmaE[c], valid, J=J, interpret=True)
        np.testing.assert_allclose(np.asarray(b_r), np.asarray(beta_o[c]),
                                   rtol=3e-4, atol=3e-6)
        np.testing.assert_allclose(np.asarray(e_r), np.asarray(eps_o[c]),
                                   rtol=3e-4, atol=3e-5)


@pytest.mark.slow
def test_hs_mc8_wide_packed_equals_dense():
    """C=8 fused horseshoe chains, packed fold-affine, through
    step_chains: wide kernel == dense."""
    dosage, dense, y = _nomissing_dosage(95, 150, 96)
    cfg = HorseshoeConfig(block_size=16)
    h_d = HorseshoeSampler(dense, y, cfg, backend="pallas",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    h_q = HorseshoeSampler(dosage, y, cfg, x_dtype="2bit",
                           dtype=jnp.float32, jacobi_blocks=3,
                           jacobi_layout="t")
    C = 8
    ks = jax.random.split(jax.random.PRNGKey(59), C)
    st_d = jax.vmap(h_d.init)(ks)
    st_q = jax.vmap(h_q.init)(ks)
    for _ in range(2):
        st_d, st_q = h_d.step_chains(st_d), h_q.step_chains(st_q)
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_q.beta),
                               rtol=3e-4, atol=3e-5)
