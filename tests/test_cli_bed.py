"""End-to-end tests for the PLINK .bed reader and the CLI."""
import numpy as np
import pytest

from bayesrrcpp_tpu.cli import main as cli_main
from bayesrrcpp_tpu.io import bed as bedio


@pytest.fixture()
def bed_prefix(tmp_path):
    rng = np.random.default_rng(5)
    N, M = 120, 40
    freqs = rng.uniform(0.1, 0.9, M)
    dosage = rng.binomial(2, freqs, size=(N, M)).astype(float)
    dosage[0, 0] = np.nan  # one missing call
    prefix = str(tmp_path / "toy")
    bedio.write_bed(prefix, dosage)
    return prefix, dosage


def test_bed_roundtrip(bed_prefix):
    prefix, dosage = bed_prefix
    data = bedio.read_bed(prefix, standardize=False, impute_missing=False)
    assert data.X.shape == dosage.shape
    got, want = data.X, dosage.astype(np.float32)
    mask = ~np.isnan(want)
    np.testing.assert_array_equal(got[mask], want[mask])
    assert np.isnan(got[0, 0])
    # standardized read: columns centered/scaled, missing imputed
    std = bedio.read_bed(prefix, standardize=True)
    assert np.isfinite(std.X).all()
    np.testing.assert_allclose(std.X.mean(axis=0), 0.0, atol=1e-4)


def test_cli_bayesr_from_bed(bed_prefix, tmp_path):
    prefix, dosage = bed_prefix
    # simulate a phenotype on the standardized dosages
    data = bedio.read_bed(prefix)
    rng = np.random.default_rng(6)
    beta = np.zeros(40)
    beta[rng.choice(40, 6, replace=False)] = rng.normal(0, 0.3, 6)
    y = data.X @ beta + rng.normal(0, 0.7, 120)
    pheno = tmp_path / "pheno.txt"
    np.savetxt(pheno, y)
    out = tmp_path / "chain.csv"
    ck = tmp_path / "state.npz"
    npz = tmp_path / "chain.npz"
    rc = cli_main([
        "bayesr", "--bed", prefix, "--pheno", str(pheno),
        "--out", str(out), "--iterations", "60", "--burn-in", "30",
        "--thinning", "3", "--block-size", "16", "--seed", "3",
        "--cva", "0.01,0.1", "--checkpoint-out", str(ck),
        "--npz-out", str(npz),
    ])
    assert rc == 0
    lines = open(out).read().strip().split("\n")
    hdr = lines[0].split(",")
    assert len(lines) - 1 == 10
    assert all(len(r.split(", ")) == len(hdr) for r in lines[1:])
    assert ck.exists()
    with np.load(npz) as z:
        assert z["beta"].shape == (10, 40)

    # resume from the checkpoint through the CLI
    out2 = tmp_path / "chain2.csv"
    x_npy = tmp_path / "X.npy"
    y_npy = tmp_path / "y.npy"
    np.save(x_npy, data.X)
    np.save(y_npy, y)
    rc = cli_main([
        "resume", "--checkpoint", str(ck), "--x", str(x_npy), "--y",
        str(y_npy), "--out", str(out2), "--iterations", "20",
        "--burn-in", "10", "--thinning", "2", "--block-size", "16",
        "--cva", "0.01,0.1", "--no-standardize",
    ])
    assert rc == 0
    lines2 = open(out2).read().strip().split("\n")
    assert len(lines2) > 1


def test_cli_horseshoe_npy(tmp_path):
    rng = np.random.default_rng(7)
    N, M = 100, 30
    X = rng.normal(size=(N, M))
    beta = np.zeros(M)
    beta[:4] = 0.4
    y = X @ beta + rng.normal(0, 0.8, N)
    np.save(tmp_path / "X.npy", X)
    np.save(tmp_path / "y.npy", y)
    out = tmp_path / "hs.csv"
    rc = cli_main([
        "horseshoe", "--x", str(tmp_path / "X.npy"), "--y",
        str(tmp_path / "y.npy"), "--out", str(out), "--iterations", "40",
        "--burn-in", "20", "--thinning", "2", "--block-size", "16",
        "--A", "0.05",
    ])
    assert rc == 0
    hdr = open(out).readline().split(",")
    assert "tau" in hdr


def test_cli_multichain_csv(tmp_path):
    """--chains N writes one reference-schema CSV per chain."""
    from bayesrrcpp_tpu import cli, simulate

    sim = simulate.simulate_bayesr(seed=31, N=120, M=48, n_causal=6, h2=0.5)
    x = tmp_path / "X.npy"
    y = tmp_path / "y.npy"
    np.save(x, sim.X)
    np.save(y, sim.Y)
    out = tmp_path / "mc.csv"
    rc = cli.main(["bayesr", "--x", str(x), "--y", str(y),
                   "--out", str(out), "--iterations", "30",
                   "--burn-in", "10", "--thinning", "5",
                   "--block-size", "16", "--chains", "2"])
    assert rc == 0
    rows = []
    for c in range(2):
        f = tmp_path / "mc.chain0.csv", tmp_path / "mc.chain1.csv"
        path = f[c]
        assert path.exists()
        lines = path.read_text().strip().split("\n")
        header = lines[0].split(",")
        body = [ln.split(",") for ln in lines[1:]]
        assert len(body) >= 4
        assert all(len(r) == len(header) for r in body)
        rows.append(np.array(body[-1], dtype=float))
    # chains are distinct draws
    assert not np.allclose(rows[0], rows[1])


def test_resume_from_csv(tmp_path):
    """CLI resume --from-csv: the reference's BRV2Grstart workflow (fish the
    last CSV row out of a previous run) without the manual archaeology."""
    import numpy as np

    from bayesrrcpp_tpu.cli import main

    rng = np.random.default_rng(15)
    N, M = 120, 16
    X = rng.normal(size=(N, M))
    Y = X[:, 0] * 0.8 + rng.normal(0, 1, N)
    xp, yp = tmp_path / "x.npy", tmp_path / "y.npy"
    np.save(xp, X)
    np.save(yp, Y)
    first = tmp_path / "first.csv"
    main(["bayesr", "--x", str(xp), "--y", str(yp), "--out", str(first),
          "--iterations", "12", "--burn-in", "4", "--thinning", "2",
          "--block-size", "16"])

    out = tmp_path / "resumed.csv"
    main(["resume", "--from-csv", str(first), "--x", str(xp), "--y", str(yp),
          "--out", str(out), "--iterations", "8", "--burn-in", "2",
          "--thinning", "2", "--block-size", "16"])
    rows = open(out).read().strip().splitlines()
    assert rows[0].startswith("iteration,")
    assert len(rows) >= 3

    # and without stored residuals: epsilon reconstructed from (X, Y)
    noeps = tmp_path / "noeps.csv"
    main(["bayesr", "--x", str(xp), "--y", str(yp), "--out", str(noeps),
          "--iterations", "12", "--burn-in", "4", "--thinning", "2",
          "--block-size", "16", "--no-epsilon"])
    out2 = tmp_path / "resumed2.csv"
    main(["resume", "--from-csv", str(noeps), "--x", str(xp), "--y", str(yp),
          "--out", str(out2), "--iterations", "8", "--burn-in", "2",
          "--thinning", "2", "--block-size", "16"])
    assert len(open(out2).read().strip().splitlines()) >= 3


def test_summarize_cli(tmp_path, capsys):
    import json

    import numpy as np

    from bayesrrcpp_tpu.cli import main

    rng = np.random.default_rng(17)
    N, M = 200, 16
    X = rng.normal(size=(N, M))
    Y = X[:, 0] * 1.2 + rng.normal(0, 1, N)
    xp, yp = tmp_path / "x.npy", tmp_path / "y.npy"
    np.save(xp, X)
    np.save(yp, Y)
    for seed in (1, 2):
        main(["bayesr", "--x", str(xp), "--y", str(yp),
              "--out", str(tmp_path / f"c{seed}.csv"),
              "--npz-out", str(tmp_path / f"c{seed}.npz"),
              "--iterations", "200", "--burn-in", "50", "--thinning", "2",
              "--cva", "0.01,0.1,1.0",
              "--block-size", "16", "--seed", str(seed)])
    capsys.readouterr()
    main(["summarize", "--npz", str(tmp_path / "c1.npz"),
          "--npz", str(tmp_path / "c2.npz"),
          "--x", str(xp), "--y", str(yp), "--top", "3"])
    out = json.loads(capsys.readouterr().out)
    assert out["n_chains"] == 2 and out["n_samples"] == 75
    assert "rhat_sigmaE" in out and out["pve"] > 0.1
    assert out["top_markers"][0]["index"] == 0  # the causal marker
