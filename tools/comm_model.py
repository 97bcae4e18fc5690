"""Multi-chip communication model for the sharded samplers (round-4
VERDICT #6, extended round 5 with the fused multi-chain pattern): per-iteration collective counts + payload bytes, validated
against the compiled HLO of the virtual-mesh dry run, and a projected
scaling efficiency at BASELINE.md config 5 (N=400k x M=1M, >= 8 chips).

No pod exists in this workspace, so the achievable substitute for a
measured scaling curve is (a) an ANALYTIC model whose collective counts
are pinned to the all-reduces XLA actually emits, and (b) a projection
from the measured single-chip compute rate + published v5e ICI numbers.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python tools/comm_model.py
Writes COMM_MODEL_r05.json at the repo root.
"""
import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                     # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402


def analytic_model(*, N, M, B, Dm, Dn, chunk_blocks, backend="pallas"):
    """Collectives per Gibbs iteration of the sharded spike-slab sweep.

    pallas (m, 1): nb_loc/C chunk rounds, each ONE psum over "m" of the
    combined eps update (Npad f32) -- parallel/sharded.py:771 -- plus the
    per-iteration hyper reductions (v, bacc, |beta|^2, |eps|^2, scalars).
    xla (m, n): one eps psum over "m" per block round + one r psum over
    "n" per round (J*B f32) -- parallel/sharded.py:563-567.
    """
    nb = -(-M // B)
    nb_loc = nb // Dm
    Npad = -(-N // 2048) * 2048 if backend == "pallas" else N
    if backend == "pallas":
        C = min(chunk_blocks or 128, nb_loc)
        rounds = -(-nb_loc // C)
        eps_psums = rounds
        r_psums = 0
    else:
        C = min(chunk_blocks or 128, nb_loc)
        rounds = nb_loc
        eps_psums = rounds
        r_psums = rounds if Dn > 1 else 0
    hyper_psums = 6   # v, bacc, |beta|^2, |eps|^2, mu-sum, sigmaF/fixed
    return {
        "rounds_per_iter": int(rounds),
        "eps_psums_per_iter": int(eps_psums),
        "eps_psum_payload_bytes": int(Npad * 4),
        "r_psums_per_iter": int(r_psums),
        "comm_bytes_per_iter": int(eps_psums * Npad * 4
                                   + r_psums * (C * B) * 4),
        "hyper_psums_per_iter": hyper_psums,
        "hyper_payload_bytes": 256,
    }


def hlo_collective_count(Dm, Dn, *, N=512, M=512, B=32, chunk_blocks=4):
    """Count all-reduce ops in the compiled one-step HLO on a virtual
    (Dm, Dn) CPU mesh -- the ground truth the analytic model must match
    in STRUCTURE (ops per executable; the while-loop body executes its
    all-reduce once per chunk round)."""
    from bayesrrcpp_tpu import BayesRConfig
    from bayesrrcpp_tpu.parallel.mesh import make_mesh
    from bayesrrcpp_tpu.parallel.sharded import ShardedSpikeSlabSampler

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M)).astype(np.float32)
    Y = rng.standard_normal(N).astype(np.float32)
    s = ShardedSpikeSlabSampler(
        X, Y, np.array([0.001, 0.01, 0.1]), BayesRConfig(block_size=B),
        make_mesh(Dm, Dn), dtype=jnp.float32,
        backend="pallas" if Dn == 1 else "xla",
        chunk_blocks=chunk_blocks)
    st = s.init(jax.random.PRNGKey(0))
    fn = s._get_run_steps(1)
    txt = jax.jit(lambda st: fn(st, s.data)).lower(st).compile().as_text()
    n_ar = len(re.findall(r"all-reduce(?:-start)?\(", txt)) + \
        len(re.findall(r" all-reduce(?:-start)? ", txt))
    n_ar = max(n_ar, txt.count("all-reduce"))
    backend = "pallas" if Dn == 1 else "xla"
    # sites per executable: the eps psum lives in the chunk-round loop
    # body (1 site, rounds executions/iter), the "n" r-psum joins it on
    # 2-D meshes, and 6 hyper reductions sit at iteration scope
    expected = (1 if backend == "pallas" else 2) + 6
    got = int(txt.count("all-reduce"))
    assert got == expected, (got, expected)
    return {"mesh": [Dm, Dn], "backend": backend,
            "hlo_all_reduce_sites": got,
            "expected_sites_analytic": expected, "match": got == expected,
            "nb_loc": s.nb_loc, "chunk_blocks": chunk_blocks}


def hlo_collective_count_mc(Dm, *, N=512, M=8192, B=32, C=4):
    """All-reduce sites of the FUSED MULTI-CHAIN step (step_chains on an
    (m, 1) mesh with the transposed mc kernel engaged): one (C, Npad)
    eps psum per chunk round + the per-iteration (vmapped) hyper
    reductions -- same SITE structure as the single-chain path, payload
    scaled by C."""
    from bayesrrcpp_tpu import BayesRConfig
    from bayesrrcpp_tpu.parallel.mesh import make_mesh
    from bayesrrcpp_tpu.parallel.sharded import ShardedSpikeSlabSampler

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M)).astype(np.float32)
    Y = rng.standard_normal(N).astype(np.float32)
    s = ShardedSpikeSlabSampler(
        X, Y, np.array([0.001, 0.01, 0.1]), BayesRConfig(block_size=B),
        make_mesh(Dm, 1), dtype=jnp.float32, backend="pallas")
    assert s.jacobi_t > 1, "shape must engage the transposed mc kernel"
    st = s.init_chains(jax.random.PRNGKey(0), C)
    fn = s._get_mc_run_steps(1, C)
    txt = jax.jit(lambda st: fn(st, s.data)).lower(st).compile().as_text()
    got = int(txt.count("all-reduce"))
    expected = 1 + 6
    assert got == expected, (got, expected)
    return {"mesh": [Dm, 1], "backend": "pallas-mc-t", "chains": C,
            "hlo_all_reduce_sites": got,
            "expected_sites_analytic": expected, "match": True,
            "eps_psum_payload_bytes": int(C * s.Npad * 4),
            "nb_loc": s.nb_loc, "jacobi_t": s.jacobi_t}


def projection_config5():
    """Projected scaling at BASELINE config 5 (N=400k, M=1M groups) from
    the measured round-5 single-chip rate and v5e interconnect numbers.

    Compute: the SHARDED (m, 1) sampler itself measures 6.18M
    SNP-updates/s/chip at the biobank shape on a (1, 1) mesh (the
    strided t-kernel local sweep, parallel/sharded.py::
    _pallas_local_sweep_t -- 81.5 ms/iter incl. the psum step),
    with the X stream (2 passes x 0.25 B/genotype) the dominant term; at
    fixed N the per-chip sweep time scales with M_loc = M/Dm.
    Comm: one eps psum (Npad * 4 B) per chunk round rides the ICI
    all-reduce at ~45 GB/s algorithmic bandwidth per chip (v5e: 1600
    Gbps aggregate ICI per chip, 2D torus; conservative algorithmic
    factor 0.25 for small-payload all-reduces), latency ~25 us/round.
    """
    N, M, B = 400_000, 1_000_000, 32
    Npad = -(-N // 2048) * 2048
    rate_chip = 6.18e6     # SNP-updates/s/chip, measured SHARDED (r5,
    #                        exact split-dot kernels, 81.5 ms/iter)
    # per-chip iteration time at Dm chips (compute only)
    rows = []
    for Dm in (8, 16, 32):
        nb_loc = -(-M // B) // Dm
        C = min(128, nb_loc)
        rounds = -(-nb_loc // C)
        t_comp = (M / Dm) / rate_chip
        t_comm = rounds * (Npad * 4 / 45e9 + 25e-6)
        eff = t_comp / (t_comp + t_comm)
        rows.append({
            "chips": Dm, "rounds_per_iter": rounds,
            "eps_psum_bytes": Npad * 4,
            "t_compute_ms": round(1e3 * t_comp, 2),
            "t_comm_ms": round(1e3 * t_comm, 3),
            "projected_efficiency": round(eff, 4),
            "projected_aggregate_updates_per_s": round(
                Dm * rate_chip * eff, -3),
        })
    return {"config": "BASELINE-5 N=400k M=1M", "target_efficiency": 0.85,
            "ici_assumption": "45 GB/s algorithmic all-reduce bw/chip, "
                              "25 us/collective latency (v5e 2D torus)",
            "per_chip_rate_measured": rate_chip, "rows": rows}


def main():
    out = {
        "analytic": {
            "biobank_m4": analytic_model(N=100_352, M=503_808, B=32,
                                         Dm=4, Dn=1, chunk_blocks=128),
            "config5_m8": analytic_model(N=400_000, M=1_000_000, B=32,
                                         Dm=8, Dn=1, chunk_blocks=128),
            "config5_m32": analytic_model(N=400_000, M=1_000_000, B=32,
                                          Dm=32, Dn=1, chunk_blocks=128),
        },
        "hlo_validation": [
            hlo_collective_count(4, 1),
            hlo_collective_count(2, 2),
        ],
        "hlo_validation_mc": [hlo_collective_count_mc(4, C=4)],
        "projection": projection_config5(),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "COMM_MODEL_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=lambda o: int(o))
    print(json.dumps(out, indent=1, default=lambda o: int(o)))
    print("wrote", path)


if __name__ == "__main__":
    main()
