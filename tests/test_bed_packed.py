"""PLINK .bed -> packed-2-bit-word ingestion (native/bedreader.cpp,
io/bed.py::read_bed_packed) and the pre-packed sampler path with a true
N below the 2048-lane padding.

The reference ingests only a dense in-RAM R matrix (src/BayesRv2.cpp:60);
this pipeline keeps genotypes at 0.25 bytes each end to end.
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesrrcpp_tpu import BayesRConfig, ChainConfig, SpikeSlabSampler
from bayesrrcpp_tpu.io import bed as bedio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def _built_native():
    """Build the native decoder once so the native path is exercised when a
    toolchain exists; tests still pass via the NumPy fallback without it."""
    try:
        subprocess.run([sys.executable, os.path.join(REPO, "native", "build.py"),
                        "bedreader"], check=True, capture_output=True,
                       timeout=120)
    except Exception:
        pass
    # reset the lazy loader so this module sees a freshly built library
    from bayesrrcpp_tpu.io import native

    native._BED = None
    native._BED_TRIED = False


def _write(tmp_path, dosages, name="t"):
    pre = str(tmp_path / name)
    bedio.write_bed(pre, dosages)
    return pre


def _unpack(words, n):
    by = np.ascontiguousarray(words).view(np.uint8).reshape(words.shape[0], -1)
    codes = np.stack([(by >> (2 * j)) & 3 for j in range(4)], -1)
    return codes.reshape(words.shape[0], -1), n


@pytest.mark.parametrize("with_missing", [False, True])
def test_read_bed_packed_matches_dense(tmp_path, with_missing):
    rng = np.random.default_rng(3)
    N, M = 205, 23
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    if with_missing:
        dos[rng.random((N, M)) < 0.07] = np.nan
    pre = _write(tmp_path, dos)

    pb = bedio.read_bed_packed(pre)
    assert pb.n == N and pb.words.shape == (M, 2048 // 16)
    assert pb.has_missing == with_missing
    assert np.allclose(pb.means, np.nanmean(dos, axis=0), atol=1e-12)
    assert np.allclose(pb.sds, np.nanstd(dos, axis=0, ddof=1), atol=1e-12)

    codes, _ = _unpack(pb.words, N)
    ref = np.where(np.isnan(dos.T), 3, dos.T).astype(np.uint8)
    assert (codes[:, :N] == ref).all()
    # pad lanes: MISSING_CODE when missing calls exist (non-fold kernel
    # zeroes them), else 0 (fold kernel masks via row_valid)
    assert (codes[:, N:] == (3 if with_missing else 0)).all()


def test_numpy_fallback_bitwise_matches_native(tmp_path):
    from bayesrrcpp_tpu.io import native

    if native.get_native_bed() is None:
        pytest.skip("native decoder not built")
    rng = np.random.default_rng(4)
    N, M = 333, 17  # N % 4 == 1 exercises the partial trailing byte
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    dos[rng.random((N, M)) < 0.05] = np.nan
    pre = _write(tmp_path, dos)

    pb_native = bedio.read_bed_packed(pre)
    native._BED, native._BED_TRIED = None, True  # force fallback
    try:
        pb_np = bedio.read_bed_packed(pre)
    finally:
        native._BED_TRIED = False
    assert (pb_native.words == pb_np.words).all()
    assert np.allclose(pb_native.means, pb_np.means, atol=1e-12)
    assert np.allclose(pb_native.sds, pb_np.sds, atol=1e-12)


def test_prepacked_sampler_matches_host_packed(tmp_path):
    """The device-side pre-packed path (words + stats + true N) must build
    the same MarkerData as the host packing path and sample the same
    posterior."""
    rng = np.random.default_rng(5)
    N, M = 260, 64
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    dos[rng.random((N, M)) < 0.04] = np.nan
    pre = _write(tmp_path, dos)
    Xs = np.where(np.isnan(dos), np.nanmean(dos, 0)[None, :], dos)
    Xs = (Xs - Xs.mean(0)) / Xs.std(0, ddof=1)
    beta_true = np.zeros(M)
    beta_true[:6] = rng.normal(0, 0.5, 6)
    Y = Xs @ beta_true + rng.normal(0, 1, N)
    cva = np.array([1e-4, 1e-3, 1e-2])
    cfg = BayesRConfig(block_size=32)

    pb = bedio.read_bed_packed(pre)
    s_pack = SpikeSlabSampler(jnp.asarray(pb.words), Y, cva, cfg,
                              x_dtype="2bit", transposed=True,
                              x_stats=(pb.means, pb.sds), n_individuals=pb.n)
    s_host = SpikeSlabSampler(dos, Y, cva, cfg, x_dtype="2bit")
    assert s_pack.N == N and s_pack.Npad == 2048
    assert (np.asarray(s_pack.data.XT) == np.asarray(s_host.data.XT)).all()
    assert np.allclose(np.asarray(s_pack.data.xsq),
                       np.asarray(s_host.data.xsq), rtol=1e-5)
    assert np.allclose(np.asarray(s_pack.data.gram),
                       np.asarray(s_host.data.gram), rtol=1e-4, atol=1e-4)
    assert (np.asarray(s_pack.data.row_valid)
            == np.asarray(s_host.data.row_valid)).all()

    _, samples = s_pack.run(jax.random.PRNGKey(0), ChainConfig(50, 20, 3))
    _, samples_h = s_host.run(jax.random.PRNGKey(0), ChainConfig(50, 20, 3))
    bh = samples["beta"].mean(0)
    assert np.isfinite(bh).all()
    assert np.abs(bh - samples_h["beta"].mean(0)).max() < 1e-3


def test_prepacked_no_missing_fold_path(tmp_path):
    """No missing calls -> the fold-affine kernel engages with the
    row_valid lane mask handling the N < Npad padding."""
    rng = np.random.default_rng(6)
    N, M = 190, 32
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    pre = _write(tmp_path, dos)
    Xs = (dos - dos.mean(0)) / dos.std(0, ddof=1)
    Y = Xs[:, 0] * 0.7 + rng.normal(0, 1, N)

    pb = bedio.read_bed_packed(pre)
    assert not pb.has_missing
    s = SpikeSlabSampler(jnp.asarray(pb.words), Y, np.array([1e-3, 1e-2]),
                         BayesRConfig(block_size=32), x_dtype="2bit",
                         transposed=True, x_stats=(pb.means, pb.sds),
                         n_individuals=pb.n)
    assert s._x_fold
    _, samples = s.run(jax.random.PRNGKey(1), ChainConfig(40, 10, 3))
    assert np.isfinite(samples["beta"]).all()
    assert np.isfinite(samples["sigmaE"]).all()


def test_cli_bed_2bit(tmp_path):
    rng = np.random.default_rng(7)
    N, M = 150, 24
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    pre = _write(tmp_path, dos)
    Xs = (dos - dos.mean(0)) / dos.std(0, ddof=1)
    Y = Xs[:, 0] + rng.normal(0, 1, N)
    pheno = tmp_path / "y.txt"
    np.savetxt(pheno, Y)
    out = tmp_path / "chain.csv"

    from bayesrrcpp_tpu.cli import main

    main(["bayesr", "--bed", pre, "--pheno", str(pheno), "--out", str(out),
          "--x-dtype", "2bit", "--iterations", "12", "--burn-in", "4",
          "--thinning", "2", "--block-size", "32", "--no-epsilon"])
    rows = open(out).read().strip().splitlines()
    assert rows[0].startswith("iteration,")
    assert len(rows) >= 4


def test_packed_checkpoint_resume_bitwise(tmp_path):
    """Checkpoint mid-chain under the packed layout and resume: the state
    (incl. permuted eps and the PRNG key) continues bit-for-bit."""
    from bayesrrcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    rng = np.random.default_rng(12)
    N, M = 180, 32
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    Xs = (dos - dos.mean(0)) / dos.std(0, ddof=1)
    Y = Xs[:, 0] * 0.5 + rng.normal(0, 1, N)
    s = SpikeSlabSampler(dos, Y, np.array([1e-3, 1e-2]),
                         BayesRConfig(block_size=32), x_dtype="2bit")
    st = s.init(jax.random.PRNGKey(4))
    for _ in range(3):
        st = s.step(st)
    ck = tmp_path / "st.npz"
    save_checkpoint(str(ck), st)
    cont = s.step(st)
    resumed = s.step(load_checkpoint(str(ck)))
    np.testing.assert_array_equal(np.asarray(cont.beta),
                                  np.asarray(resumed.beta))
    np.testing.assert_array_equal(np.asarray(cont.eps),
                                  np.asarray(resumed.eps))
    assert float(cont.sigmaE) == float(resumed.sigmaE)


@pytest.mark.slow
def test_groups_fixed_effects_packed(tmp_path):
    """Grouped variant (per-group cva/pi/sigmaG + fixed effects) on packed
    2-bit genotypes."""
    from bayesrrcpp_tpu import GroupsConfig

    rng = np.random.default_rng(13)
    N, M, F = 400, 64, 2
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    dos[rng.random((N, M)) < 0.03] = np.nan
    Xs = np.where(np.isnan(dos), np.nanmean(dos, 0)[None, :], dos)
    Xs = (Xs - Xs.mean(0)) / Xs.std(0, ddof=1)
    fixed = rng.normal(size=(N, F))
    g_assign = (np.arange(M) % 2).astype(np.int32)
    beta_true = np.zeros(M)
    beta_true[:8] = rng.normal(0, 1.0, 8)
    alpha_true = np.array([0.5, -0.3])
    Y = Xs @ beta_true + fixed @ alpha_true + rng.normal(0, 1, N)
    cva = np.tile(np.array([1e-3, 1e-2, 1e-1]), (2, 1))

    s = SpikeSlabSampler(dos, Y, cva, GroupsConfig(block_size=32),
                         g_assign=g_assign, fixed=fixed, x_dtype="2bit")
    assert s.variant == "groups" and s.F == F
    _, out = s.run(jax.random.PRNGKey(0), ChainConfig(200, 80, 4))
    assert np.isfinite(out["beta"]).all()
    assert out["sigmaG"].shape[1] == 2
    a_hat = out["alpha"].mean(0)
    assert np.abs(a_hat - alpha_true).max() < 0.25
    assert np.corrcoef(out["beta"].mean(0)[:8], beta_true[:8])[0, 1] > 0.8


def test_cli_horseshoe_bed_2bit(tmp_path):
    rng = np.random.default_rng(14)
    N, M = 150, 24
    dos = rng.integers(0, 3, size=(N, M)).astype(float)
    pre = _write(tmp_path, dos)
    Xs = (dos - dos.mean(0)) / dos.std(0, ddof=1)
    Y = Xs[:, 0] + rng.normal(0, 1, N)
    pheno = tmp_path / "y.txt"
    np.savetxt(pheno, Y)
    out = tmp_path / "hs.csv"

    from bayesrrcpp_tpu.cli import main

    main(["horseshoe", "--bed", pre, "--pheno", str(pheno), "--out", str(out),
          "--x-dtype", "2bit", "--iterations", "12", "--burn-in", "4",
          "--thinning", "2", "--block-size", "32", "--no-epsilon"])
    rows = open(out).read().strip().splitlines()
    assert rows[0].startswith("iteration,")
    assert len(rows) >= 4


def test_mpad_auto_prepacked_equals_unpadded(tmp_path):
    """Host-side marker padding (read_bed_packed(mpad='auto') +
    n_markers=) must give the SAME chain as the unpadded load whose pad
    happens on device -- and it removes the on-device pad that would OOM
    a biobank-sized array (round-3 VERDICT #4)."""
    from bayesrrcpp_tpu.ops.pallas_jacobi import planned_mpad

    rng = np.random.default_rng(11)
    N, M = 300, 100          # M=100 divides nothing the planner likes
    dosages = rng.binomial(2, rng.uniform(0.2, 0.8, M), size=(N, M)).astype(
        float)
    pre = _write(tmp_path, dosages, "pad")
    pb0 = bedio.read_bed_packed(pre)
    pbp = bedio.read_bed_packed(pre, mpad="auto")
    mp = planned_mpad(M)
    assert pbp.words.shape[0] == mp and pb0.words.shape[0] == M
    Y = rng.normal(size=N)
    cva = np.array([0.001, 0.01, 0.1])
    mk = lambda pb, **kw: SpikeSlabSampler(
        jnp.asarray(pb.words), Y, cva, BayesRConfig(block_size=32),
        x_dtype="2bit", transposed=True, x_stats=(pb.means, pb.sds),
        n_individuals=pb.n, dtype=jnp.float32, **kw)
    s0 = mk(pb0)
    sp = mk(pbp, n_markers=M)
    assert (s0.M, s0.Mpad) == (sp.M, sp.Mpad) == (M, mp)
    key = jax.random.PRNGKey(5)
    st0, stp = s0.init(key), sp.init(key)
    for _ in range(2):
        st0, stp = s0.step(st0), sp.step(stp)
    np.testing.assert_array_equal(np.asarray(st0.labels),
                                  np.asarray(stp.labels))
    np.testing.assert_allclose(np.asarray(st0.beta), np.asarray(stp.beta),
                               rtol=1e-6, atol=1e-8)
    # wrong row count -> a clear error, not a shape crash downstream
    with pytest.raises(ValueError, match="planned padded count"):
        mk(bedio.read_bed_packed(pre, mpad=mp + 32), n_markers=M)
