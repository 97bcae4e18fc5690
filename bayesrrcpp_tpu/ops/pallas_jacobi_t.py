"""Transposed (B, J)-layout Jacobi sweep with strided rounds.

Two findings drive this kernel's design (measured on v5e at the biobank
headline, 2-bit packed N=100k x M=504k; see BENCH.md round 4):

1. The round-3 row-layout kernel's serial solve was NOT the bottleneck it
   was modeled as: with the solve transposed so J rides the LANE axis the
   entire batched sequential phase costs ~0.6 ms/iteration.  The real
   costs are the X stream (~31 ms), the 2-bit decode + dot work, and --
   the surprise -- ~48 ms/iteration of XLA glue: `jnp.take(gram, border)`
   alone is ~15 ms (TPU gathers of 4 KB granules), the inner-permutation
   take_along_axis pair ~7 ms, the 504k-element scatter-backs ~9 ms.
2. TPU gathers/scatters with per-iteration random indices are 10-50x
   slower than reshapes, transposes and batched one-hot matmuls of the
   same volume.

So this kernel eliminates per-iteration gathers/scatters entirely:

- **Strided rounds**: round-slab r owns blocks {j*nr + r : j < J} -- a
  FIXED partition (like the sharded sampler's Dm=J device slices, whose
  posterior equivalence is validated in tests/test_sharded.py), maximally
  spread in storage so same-round blocks are J*B*nr/J ~ M/J markers apart
  (minimal LD -> minimal Jacobi staleness).  Randomness per iteration:
  the round VISIT order rho (applied in the kernel's scalar-prefetch
  index maps -- operands are built in canonical slab order, rho costs
  nothing) and the within-block permutations.  Every marker is swept
  exactly once per iteration in a random-in-block order, so this remains
  a valid random-scan Gibbs kernel (reference sweep: a full shuffle,
  src/BayesRv2.cpp:180-184; the blocked family approximates it, see
  ARCHITECTURE.md).
- Operand builds are reshapes + batched one-hot matmuls on the MXU
  (einsum P'GP for the interleaved-Gp operand; einsum P'T for the pkg
  fields) -- no take(), no take_along_axis().
- Outputs leave in LANE order through rho-indexed output maps, so the
  scatter-back is a transpose+reshape.

Serial-step layout (the transposed solve):

- r and the pre-block betas live in (B, J) scratches (row s = position s,
  col j = round-block j): the per-step read is ONE dynamic sublane slice;
- per-(position, block) constants arrive as a (nr, B*F, J) operand (row
  s*F + f): one slice yields an (F, J) tile and every selection op is a
  (K, J)/(1, J) lane vector -- full 128-lane utilisation at J = 128;
- Gram rows arrive as a (nr, B*B, J) operand (row s*B + pos holds
  Gp_j[s, pos]): the J rank-1 updates of a step are one slice + one
  (B, J) FMA;
- layout hops and in-kernel permutes are chunked one-hot MXU matmuls
  (exact in f32: every output sums exactly one nonzero product).

Each grid step streams Q blocks' X tiles and fuses them into ONE
MXU dot of contraction/output width Q*B (a B-wide dot would waste 3/4 of
the MXU at B=32); the grid is (nr, 2, J/Q, nt).

Semantics: exact sequential Gibbs within each B-block, block-Jacobi
across the J blocks of a round.  Reference per-update math:
src/BayesRv2.cpp:186-245 (bayesr), src/HorseshoeR.cpp:219-240
(horseshoe).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep import SweepResult


def auto_q(J: int) -> int:
    """X-streams per grid step: amortise grid overhead and widen the
    per-step MXU dot to Q*B lanes."""
    for q in (4, 2):
        if J % q == 0:
            return q
    return 1



def build_onehot_inner(inner_can, *, B, J, nr):
    """One-hot P operand (J, nr, B, B): P[j, r, m, s] = (m == inner[s]) of
    block j*nr + r.  inner_can is the canonical (nb, B) permutation
    table."""
    inn = inner_can.reshape(J, nr, B).astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (J, nr, B, B), 2)
    return (sub == inn[:, :, None, :]).astype(jnp.float32)


def build_gpT_strided(gram, P2, *, B, J, nr):
    """Interleaved transposed Gram operand (nr, B*B, J) for strided
    rounds: row s*B + pos of slab r holds Gp_j[s, pos] where
    Gp_j = P' G_{j*nr+r} P.  Batched one-hot matmuls on the MXU -- no
    gathers."""
    G2 = gram.astype(jnp.float32).reshape(J, nr, B, B)
    gp = jnp.einsum('jrms,jrmt,jrtu->rsuj', P2, G2, P2,
                    preferred_element_type=jnp.float32)
    return gp.reshape(nr, B * B, J)


def _bayesr_tbl(xsq, gas, pi, cva, sigmaE, sigmaGG):
    """Per-marker constant fields (Mpad, 3K+2): [lp(K), 1/denom(K, spike
    col 0), sd(K, spike col 0), xsq, valid-slot placeholder excluded].
    Same formulas as the row-layout kernel's build_pkg_jacobi
    (src/BayesRv2.cpp:199, 207-211)."""
    f32 = jnp.float32
    Mpad = xsq.shape[0]
    xsq = xsq.astype(f32)
    sG = jnp.take(sigmaGG.astype(f32), gas)                # (Mpad,)
    cva_m = jnp.take(cva.astype(f32), gas, axis=0)         # (Mpad, K-1)
    sE = sigmaE.astype(f32)
    denom = xsq[:, None] + (sE / sG[:, None]) / cva_m      # (Mpad, K-1)
    zero = jnp.zeros((Mpad, 1), f32)
    invd = jnp.concatenate([zero, 1.0 / denom], axis=1)
    sd = jnp.concatenate([zero, jnp.sqrt(sE / denom)], axis=1)
    tiny = jnp.finfo(f32).tiny
    logpi = jnp.log(jnp.maximum(jnp.take(pi.astype(f32), gas, axis=0), tiny))
    lp = jnp.concatenate([
        logpi[:, 0:1],
        logpi[:, 1:] - 0.5 * jnp.log(
            (sG[:, None] / sE) * xsq[:, None] * cva_m + 1.0),
    ], axis=1)
    return jnp.concatenate([lp, invd, sd], axis=1)         # (Mpad, 3K)


def build_pkgT_strided(xsq, gas, valid, p, z, pi, cva, sigmaE, sigmaGG,
                       P2, *, B, J, nr):
    """Transposed packed operand (nr, B*F, J), F = 3K+4, for strided
    rounds: row s*F + f of slab r holds field f of position s across the
    J blocks, fields [lp(K), 1/denom(K), sd(K), p, z, xsq, valid].

    Per-marker constants are permuted to position order with a batched
    one-hot matmul (einsum over the P operand); p/z are POSITION-indexed
    (sweep position of (r, j, s) is (r*J + j)*B + s, identical to the
    row-layout kernel)."""
    f32 = jnp.float32
    G, K = pi.shape
    tblc = _bayesr_tbl(xsq, gas, pi, cva, sigmaE, sigmaGG)  # (Mpad, 3K)
    xv = jnp.stack([xsq.astype(f32), valid.astype(f32)], axis=1)
    tbl = jnp.concatenate([tblc, xv], axis=1)              # (Mpad, 3K+2)
    T2 = tbl.reshape(J, nr, B, 3 * K + 2)
    # position order: per[r, s, f, j] = tbl[block(j, r), inner[s], f]
    per = jnp.einsum('jrms,jrmf->rsfj', P2, T2,
                     preferred_element_type=f32)           # (nr,B,3K+2,J)
    p4 = p.astype(f32).reshape(nr, J, B).transpose(0, 2, 1)[:, :, None, :]
    z4 = z.astype(f32).reshape(nr, J, B).transpose(0, 2, 1)[:, :, None, :]
    pkg = jnp.concatenate(
        [per[:, :, :3 * K, :], p4, z4, per[:, :, 3 * K:, :]], axis=2)
    F = 3 * K + 4
    return pkg.reshape(nr, B * F, J)


def build_pkgT_hs_strided(xsq, valid, z, lam, tau, c2, sigmaE, P2,
                          *, B, J, nr):
    """Transposed horseshoe operand (nr, B*5, J) for strided rounds,
    fields [1/denom, sd, z, xsq, valid] (src/HorseshoeR.cpp:224, 234)."""
    f32 = jnp.float32
    xsq = xsq.astype(f32)
    lam = lam.astype(f32)
    tauf = tau.astype(f32)
    sE = sigmaE.astype(f32)
    s_j = tauf * c2 * lam / (tauf * lam + c2)
    denom = xsq + sE / s_j
    tbl = jnp.stack([1.0 / denom, jnp.sqrt(sE / denom), xsq,
                     valid.astype(f32)], axis=1)           # (Mpad, 4)
    T2 = tbl.reshape(J, nr, B, 4)
    per = jnp.einsum('jrms,jrmf->rsfj', P2, T2,
                     preferred_element_type=f32)           # (nr, B, 4, J)
    z4 = z.astype(f32).reshape(nr, J, B).transpose(0, 2, 1)[:, :, None, :]
    pkg = jnp.concatenate([per[:, :, :2, :], z4, per[:, :, 2:, :]], axis=2)
    return pkg.reshape(nr, B * 5, J)


def _tsp(a, n):
    """Exact MXU transpose of a 2D f32 array via the identity one-hot:
    out[c, r] = sum_rho a[rho, c] I[rho, r] = a[r, c] (products are x*1 or
    x*0; the sum adds one non-zero -- bit-exact)."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(a.dtype)
    return _dot2(a, eye, 0, 0, True)


def _permute_chunks(J: int, B: int):
    """Chunking for the batched permute matmuls: JC block-rows per chunk
    keeps the (JC, JC*B) intermediates at <= 32 vregs."""
    JC = min(J, 32)
    while J % JC:
        JC //= 2
    return JC, J // JC


def _lane_to_pos(rows, ir_c, *, B, JC):
    """Chunked batched permute: rows (JC, B) in marker-lane order ->
    position order, using the chunk's flat inner row ir_c (1, JC*B).

    pcat[m, (j, s)] = (m == inner_j[s]); the full product rows @ pcat
    carries cross-block terms, the block-diagonal mask kills them, and
    Itile[(j, s), s'] = (s == s') folds the masked groups back to
    (JC, B).  Every output element sums exactly one nonzero product --
    bit-exact vs per-block one-hot dots."""
    f32 = jnp.float32
    CW = JC * B
    pcat = (jax.lax.broadcasted_iota(jnp.int32, (B, CW), 0)
            == ir_c).astype(f32)                           # (B, CW)
    full = _dot2(rows, pcat, 1, 0, True)               # (JC, CW)
    gm = (jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 1) // B
          == jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 0)).astype(f32)
    itile = (jax.lax.broadcasted_iota(jnp.int32, (CW, B), 0) % B
             == jax.lax.broadcasted_iota(jnp.int32, (CW, B), 1)).astype(f32)
    return _dot2(full * gm, itile, 1, 0, True)         # (JC, B)


def _pos_to_lane(rows_pos, ir_c, *, B, JC):
    """Chunked batched un-permute: rows_pos (JC, B) position order ->
    marker-lane order (the inverse of _lane_to_pos)."""
    f32 = jnp.float32
    CW = JC * B
    tileT = (jax.lax.broadcasted_iota(jnp.int32, (B, CW), 1) % B
             == jax.lax.broadcasted_iota(jnp.int32, (B, CW), 0)).astype(f32)
    exp = _dot2(rows_pos, tileT, 1, 0, True)           # (JC, CW)
    gm = (jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 1) // B
          == jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 0)).astype(f32)
    pcat2 = (jax.lax.broadcasted_iota(jnp.int32, (CW, B), 1)
             == ir_c.reshape(CW, 1)).astype(f32)            # (CW, B)
    return _dot2(exp * gm, pcat2, 1, 0, True)          # (JC, B)


def _dot2(lhs, rhs, cl, cr, exact):
    """f32-accurate MXU dot under the bf16-per-pass TPU matmul model.

    ``exact=True`` requires every ``rhs`` value to be EXACTLY
    representable in bfloat16 (2-bit genotype codes 0..3, int8 codes,
    missing indicators, one-hot rows): then splitting ``lhs`` into its
    bf16 hi part plus the f32 remainder makes BOTH single-pass products
    exact-input, and two DEFAULT-precision passes reproduce the f32 dot
    (residual error ~2e-8 relative, vs ~4e-3 for one raw bf16 pass --
    which was enough to DIVERGE biobank-scale chains through the
    sigmaE/sigmaG feedback, measured round 5).  ``exact=False`` (dense
    f32 X) splits BOTH sides and drops the lo*lo term -- the classic
    bf16x3 expansion (~1.6e-5 relative, the 'float32' precision class),
    written out manually so every pass Mosaic sees is single-pass."""
    f32 = jnp.float32
    dn = (((cl,), (cr,)), ((), ()))
    P = lax.Precision.DEFAULT

    def d(a, b):
        return jax.lax.dot_general(a, b, dn, preferred_element_type=f32,
                                   precision=P)

    if jax.default_backend() == "cpu":
        # interpret mode computes exact f32 dots regardless of precision;
        # keep the single-dot form so the bit-exact oracle/parity test
        # contracts (which compare against plain XLA dots) hold
        return d(lhs, rhs)
    hi = lhs.astype(jnp.bfloat16).astype(f32)
    lo = lhs - hi
    if not exact:
        rhi = rhs.astype(jnp.bfloat16).astype(f32)
        return d(hi, rhi) + d(lo, rhi) + d(hi, rhs - rhi)
    return d(hi, rhs) + d(lo, rhs)


def _decoders(xt_refs, Q, TN, packed, fold, ablate=""):
    """Per-subword X-tile decode helpers shared by the kernels:
    ``x_cat(k)`` yields the RAW (Q*B, W) f32 code (or dense) tile of
    subword k; ``x_mcat(k)`` the FUSED (2*Q*B, W)
    codes+missing-indicator tile (miss mode).  Missing fields are handled in the DOT layer (see
    ``_make_dots``): the mean-substituted value cf = c + (m-3)*1[c==3]
    decomposes into the raw-code dot plus an (m-3)-scaled indicator dot,
    keeping every MXU operand exactly bf16-representable (codes 0..3 /
    indicators 0..1) so the 2-pass split dots stay f32-exact.

    Returns (x_cat, x_mcat, SUB, W, exact)."""
    f32 = jnp.float32
    if packed:
        SUB, W = 16, TN // 16
        if ablate == "k1":           # perf probe: 1 of 16 subwords
            SUB = 1
        exact = True

        def x_sub(q, k):
            if ablate == "noshift":  # perf probe: skip the bit extracts
                return xt_refs[q][...].astype(f32)
            return ((xt_refs[q][...] >> (2 * k)) & 3).astype(f32)

    else:
        SUB, W = 1, TN
        # int8 fold codes (0..2) are exactly bf16-representable; dense
        # f32 X is not -> compiler multi-pass
        exact = bool(fold) and xt_refs[0].dtype != jnp.float32

        def x_sub(q, k):
            xr = xt_refs[q]
            if fold and xr.dtype != jnp.float32:
                return xr[...].astype(f32)
            return xr[...]


    def _cat(f, k):
        parts = [f(q, k) for q in range(Q)]
        if Q == 1:
            return parts[0]
        return jnp.concatenate(parts, axis=0)

    def _catm(k):
        # stacked codes+indicator (2*Q*B, W); each half decodes its own
        # copy of the shifted word tile -- Mosaic fuses a single-consumer
        # decode into the dot operand stream, and two fused decodes beat
        # one shared materialized tile (see _make_dots.dot_r)
        parts = [x_sub(q, k) for q in range(Q)]
        if packed:
            ind = [((xt_refs[q][...] >> (2 * k)) & 3 == 3).astype(f32)
                   for q in range(Q)]
        else:
            ind = [jnp.maximum(cp - 2.0, 0.0) for cp in parts]
        return jnp.concatenate(parts + ind, axis=0)

    return (lambda k: _cat(x_sub, k)), _catm, SUB, W, exact


def _dot2_rows(lhs, rhs, cr, exact):
    """_dot2 for the sweep's hot X-dots: lhs is 2D contracting dim 1.
    The hi/lo halves STACK as extra lhs rows so the (expensive, decoded)
    rhs tile feeds ONE MXU pass -- two separate dots made Mosaic run the
    2-bit decode twice per subword (measured: 70 -> 142 ms/iter at the
    biobank headline)."""
    f32 = jnp.float32
    dn = (((1,), (cr,)), ((), ()))
    P = lax.Precision.DEFAULT

    def d(a, b):
        return jax.lax.dot_general(a, b, dn, preferred_element_type=f32,
                                   precision=P)

    if jax.default_backend() == "cpu":
        return d(lhs, rhs)                 # see _dot2: interpret is exact
    hi = lhs.astype(jnp.bfloat16).astype(f32)
    lo = lhs - hi
    R = lhs.shape[0]
    out = d(jnp.concatenate([hi, lo], axis=0), rhs)
    res = out[:R] + out[R:]
    if not exact:
        # the stacked pass rounded rhs to bf16; add the hi . rhs_lo
        # cross term for the bf16x3 expansion (lo terms of rhs_lo are
        # below f32 resolution)
        rhi = rhs.astype(jnp.bfloat16).astype(f32)
        res = res + d(hi, rhs - rhi)
    return res


def _dot2_vrhs(lhs_exact, rhs):
    """One-hot (exact) lhs x f32 rhs contracting BOTH dim 1: split the
    VALUE side (rhs) so both DEFAULT-precision passes are exact-input
    (see _dot2); single dot on CPU interpret."""
    f32 = jnp.float32
    dn = (((1,), (1,)), ((), ()))
    P = lax.Precision.DEFAULT

    def d(a, b):
        return jax.lax.dot_general(a, b, dn, preferred_element_type=f32,
                                   precision=P)

    if jax.default_backend() == "cpu":
        return d(lhs_exact, rhs)
    rhi = rhs.astype(jnp.bfloat16).astype(f32)
    return d(lhs_exact, rhi) + d(lhs_exact, rhs - rhi)


def _make_dots(x_cat, x_mcat, exact, miss, mc_row):
    """The two X-dot shapes of every sweep phase, f32-exact (see _dot2):

    - ``dot_r(v, k)``: (R, W) . tile' -> (R, Q*B)   (r accumulation)
    - ``dot_a(v, k)``: (R, Q*B) . tile -> (R, W)    (eps apply)

    ``mc_row()`` (miss mode) returns the (1, Q*B) per-marker (mean - 3)
    row of this grid step's blocks: the scaled indicator dot completes
    the mean-substituted decode cf = c + (m-3)*1[c==3] exactly."""
    def dot_r(v, k):
        if not miss:
            return _dot2_rows(v, x_cat(k), 1, exact)
        # codes and indicator STACK along the block axis into one rhs so
        # the 2-bit decode runs ONCE and one MXU pass serves both dots
        # (two separate dots re-decode: measured 143 vs ~95 ms/iter at
        # the biobank missing config)
        # one (R, 2QB) dot against the stacked codes+indicator operand:
        # each half's decode fuses into the MXU operand stream (sharing
        # the converted codes across TWO dots makes Mosaic materialize
        # the 3 MB tile and spill: 153 ms vs 118 vs 143 for two
        # independent-decode dots, measured at the biobank shape)
        out = _dot2_rows(v, x_mcat(k), 1, True)            # (R, 2*Q*B)
        qb = out.shape[1] // 2
        return out[:, :qb] + out[:, qb:] * mc_row()

    def dot_a(v, k):
        if not miss:
            return _dot2_rows(v, x_cat(k), 0, exact)
        va = jnp.concatenate([v, v * mc_row()], axis=1)    # (R, 2*Q*B)
        return _dot2_rows(va, x_mcat(k), 0, True)

    return dot_r, dot_a


def _jacobi_t_kernel(rho_ref,                               # scalar prefetch
                     *refs, B, TN, K, G, J, Q, packed=False, fold=False,
                     miss=False):
    """Transposed Jacobi sweep kernel body (strided rounds).  refs layout:

    inputs:  xt_0..xt_{Q-1}, inner_row, pkgT, gpT, gas_lane, beta_lane,
             eps, sigmaE[, srow, msrow, xsum, esum0[, mcrow]]
    outputs: eps_out, beta_out (lane), klane_out (lane, f32), v_out,
             bacc_out
    scratch: rb (J, B), rT (B, J), bT (B, J), dposT (B, J), krecT (B, J),
             dpos (J, B), dlane (J, B)[, fold (1+J, 1)[, rmb (J, B),
             dlm (J, B)]]

    ``miss`` (packed fold mode only): the words carry real MISSING_CODE
    (3) entries; the true standardized value there is 0 (mean
    imputation, matching the serial kernel's in-kernel decode).  Since
    x_true = (c - m)*s - mcoef*1[c==3] with mcoef = (3 - m)*s, the fold
    algebra gains one exact sparse correction per phase, computed from
    the in-word missing indicator at the SAME decode cost as the code
    dot: r -= mcoef * (Miss_b . eps) in the solve, and
    eps += mcoef_j * d_j on j's missing lanes in the apply (a second
    MXU dot against the indicator).  Pad lanes carry code 3 and so
    decode to exactly 0 -- no pad drift.
    """
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, pkg_ref, gpt_ref, gasl_ref, beta_ref,
     eps_ref, se_ref) = rest[:7]
    if fold:
        nf = 5 if miss else 4
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[7:11]
        mcrow_ref = rest[11] if miss else None
        outs = rest[7 + nf:12 + nf]
        scr = rest[12 + nf:]
        (rb_sc, rT_sc, bT_sc, dposT_sc, krecT_sc,
         dpos_sc, dlane_sc, fold_sc) = scr[:8]
    else:
        outs = rest[7:12]
        (rb_sc, rT_sc, bT_sc, dposT_sc, krecT_sc,
         dpos_sc, dlane_sc) = rest[12:]
    eps_out, beta_out, klane_out, v_out, bacc_out = outs

    r = pl.program_id(0)
    ph = pl.program_id(1)
    jq = pl.program_id(2)
    t = pl.program_id(3)
    f32 = jnp.float32
    sE = se_ref[0]
    F = 3 * K + 4
    JC, NC = _permute_chunks(J, B)
    CW = JC * B
    _ablate = os.environ.get("BAYESR_T_ABLATE", "")  # perf probe only
    x_cat, x_mcat, SUB, W, exact = _decoders(xt_refs, Q, TN, packed,
                                             fold, ablate=_ablate)
    # global plane-major eps layout: the (bit-plane k, tile t) segment
    # lives at [k*NW + t*W, W) for ANY tile size (genotypes._lane_perm)
    NW = eps_out.shape[-1] // SUB
    if miss:
        def mc_row():
            # (1, Q*B) per-marker (mean - 3) row of this grid step's
            # blocks (see _make_dots)
            return jnp.concatenate(
                [mcrow_ref[0, pl.ds(jq * Q + q, 1), :]
                 for q in range(Q)], axis=1) - 3.0
    else:
        mc_row = None
    dot_r, dot_a = _make_dots(x_cat, x_mcat, exact, miss, mc_row)


    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))

    @pl.when(first)
    def _init():
        eps_out[...] = eps_ref[...]
        v_out[...] = jnp.zeros_like(v_out)
        bacc_out[...] = jnp.zeros_like(bacc_out)
        if fold:
            fold_sc[0:1, :] = jnp.full((1, 1), esum0_ref[0], f32)

    @pl.when(jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))
    def _zero_r():
        rb_sc[...] = jnp.zeros((J, B), f32)

    @pl.when(ph == 0)
    def _accumulate_r():
        # ONE (1, W) x (W, Q*B) MXU dot per subword covers this grid
        # step's Q blocks at full output width (plus the missing-
        # indicator dot in miss mode, from the same decode)
        acc = None
        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]   # (1, W)
            d = dot_r(eps_t, k)
            acc = d if acc is None else acc + d
        for q in range(Q):
            rb_sc[pl.ds(jq * Q + q, 1), :] += acc[:, q * B:(q + 1) * B]

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(jq == 0, t == 0)))
    def _solve():
        if _ablate == "solve":       # perf probe: X phases only
            dposT_sc[...] = jnp.zeros_like(dposT_sc)
            krecT_sc[...] = jnp.full_like(krecT_sc, -1.0)
            dpos_sc[...] = jnp.zeros_like(dpos_sc)
            dlane_sc[...] = jnp.zeros_like(dlane_sc)
            beta_out[0] = beta_ref[0]
            klane_out[0] = jnp.full((J, B), -1.0, f32)
            if fold:
                fold_sc[1:1 + J, :] = jnp.zeros((J, 1), f32)
            return
        if fold:
            # code-domain r -> standardized domain, whole round at once
            # (srow/msrow rows are in LANE order, like rb at this point)
            es = fold_sc[0, 0]
            rb_sc[...] = rb_sc[...] * srow_ref[0] - msrow_ref[0] * es

        # r and beta to position order + transposed layout (chunked
        # batched one-hot matmuls)
        for c in range(NC):
            ir_c = innr_ref[0][:, c * CW:(c + 1) * CW]     # (1, CW)
            rpos = _lane_to_pos(rb_sc[c * JC:(c + 1) * JC, :], ir_c,
                                B=B, JC=JC)
            rT_sc[:, c * JC:(c + 1) * JC] = _tsp(rpos, JC)
            bpos = _lane_to_pos(beta_ref[0, c * JC:(c + 1) * JC, :], ir_c,
                                B=B, JC=JC)
            bT_sc[:, c * JC:(c + 1) * JC] = _tsp(bpos, JC)

        Kf = jnp.float32(K)
        half_invsE = 0.5 / sE
        krow = jax.lax.broadcasted_iota(jnp.int32, (K, J), 0).astype(f32)

        def body(s, _):
            rowF = pkg_ref[0, pl.ds(s * F, F), :]          # (F, J)
            lp = rowF[0:K, :]                              # (K, J)
            invd = rowF[K:2 * K, :]
            sd = rowF[2 * K:3 * K, :]
            p_s = rowF[3 * K:3 * K + 1, :]                 # (1, J)
            z_s = rowF[3 * K + 1:3 * K + 2, :]
            xsq_j = rowF[3 * K + 2:3 * K + 3, :]
            okf = rowF[3 * K + 3:3 * K + 4, :]

            r_jl = rT_sc[pl.ds(s, 1), :]                   # (1, J)
            beta_old = bT_sc[pl.ds(s, 1), :]

            num = r_jl + beta_old * xsq_j                  # (1, J)
            muk = num * invd                               # (K, J), row0=0
            logL = lp + (half_invsE * num) * muk

            # reference categorical draw with the overflow guard
            # (src/BayesRv2.cpp:216-242); sums/maxes unrolled in fixed k
            # order so the reduce order matches the row-layout kernel and
            # the XLA oracle exactly
            k_sel = jnp.full((1, J), Kf, f32)
            acum = jnp.zeros((1, J), f32)
            for k in range(K):
                lk = logL[k:k + 1, :]
                g = jnp.abs(logL[1:2, :] - lk)
                for kk in range(2, K):
                    g = jnp.maximum(g, jnp.abs(logL[kk:kk + 1, :] - lk))
                guard = g > 700.0
                Ssum = jnp.exp(logL[0:1, :] - lk)
                for kk in range(1, K):
                    Ssum = Ssum + jnp.exp(logL[kk:kk + 1, :] - lk)
                w = jnp.where(guard, jnp.zeros((1, J), f32), 1.0 / Ssum)
                acum = acum + w
                hit = jnp.logical_and(p_s <= acum, k_sel == Kf)
                k_sel = jnp.where(hit, jnp.float32(k), k_sel)
            hitm = k_sel < Kf

            selm = (krow == k_sel).astype(f32)             # (K, J)
            mu_sel = jnp.sum(muk * selm, axis=0, keepdims=True)
            sd_sel = jnp.sum(sd * selm, axis=0, keepdims=True)
            beta_new = jnp.where(hitm, mu_sel + sd_sel * z_s, beta_old)
            d = okf * (beta_new - beta_old)                # (1, J)

            # the J rank-1 updates: one slice + one (B, J) FMA
            AT = gpt_ref[0, pl.ds(s * B, B), :]            # (B, J)
            rT_sc[...] -= AT * d
            dposT_sc[pl.ds(s, 1), :] = d
            kv = jnp.where(okf * hitm.astype(f32) > 0, k_sel,
                           jnp.float32(-1.0))
            krecT_sc[pl.ds(s, 1), :] = kv
            return ()

        if _ablate == "serial":      # perf probe: skip the dependent chain
            dposT_sc[...] = jnp.zeros_like(dposT_sc)
            krecT_sc[...] = jnp.full_like(krecT_sc, -1.0)
        else:
            lax.fori_loop(0, B, body, (), unroll=False)

        # back to row layout, un-permute deltas and draw records to
        # marker-lane order (outputs leave in lane order -- the XLA side
        # only transposes, no scatter)
        for c in range(NC):
            ir_c = innr_ref[0][:, c * CW:(c + 1) * CW]
            dpos_c = _tsp(dposT_sc[:, c * JC:(c + 1) * JC], B)  # (JC, B)
            dpos_sc[c * JC:(c + 1) * JC, :] = dpos_c
            dlane_sc[c * JC:(c + 1) * JC, :] = _pos_to_lane(
                dpos_c, ir_c, B=B, JC=JC)
            kpos_c = _tsp(krecT_sc[:, c * JC:(c + 1) * JC], B)
            klane_out[0, c * JC:(c + 1) * JC, :] = _pos_to_lane(
                kpos_c, ir_c, B=B, JC=JC)

        # whole-round outputs (vectorised; lane order throughout)
        beta_new_r = beta_ref[0] + dlane_sc[...]           # (J, B)
        beta_out[0] = beta_new_r
        kl = klane_out[0]
        gas_r = gasl_ref[0]                                # (J, B) int32
        slab2 = jnp.where(kl > 0.0, beta_new_r * beta_new_r, 0.0)
        vcols = []
        bcols = []
        for g in range(G):
            gm = (gas_r == g).astype(f32)
            for k in range(K):
                km = (kl == jnp.float32(k)).astype(f32)
                s1 = jnp.sum(km * gm, axis=1, keepdims=True)   # (J, 1)
                vcols.append(jnp.sum(s1, axis=0, keepdims=True))
            sb = jnp.sum(slab2 * gm, axis=1, keepdims=True)
            bcols.append(jnp.sum(sb, axis=0, keepdims=True))
        v_out[...] += jnp.concatenate(vcols, axis=1)       # (1, G*K)
        bacc_out[...] += jnp.concatenate(bcols, axis=1)    # (1, G)

        if fold:
            dl = dlane_sc[...]                             # (J, B) unscaled
            sub1 = jnp.sum(dl * xsum_ref[0], axis=1, keepdims=True)
            fold_sc[0:1, :] -= jnp.sum(sub1, axis=0, keepdims=True)
            fold_sc[1:1 + J, :] = jnp.sum(dl * msrow_ref[0], axis=1,
                                          keepdims=True)   # dms per block
            dlane_sc[...] = dl * srow_ref[0]

    @pl.when(ph == 1)
    def _apply_update():
        # ONE (1, Q*B) x (Q*B, W) MXU dot per subword applies this grid
        # step's Q blocks at full contraction width
        dlcat = jnp.concatenate(
            [dlane_sc[pl.ds(jq * Q + q, 1), :] for q in range(Q)], axis=1)
        if fold:
            dms = fold_sc[pl.ds(1 + jq * Q, 1), :]
            for q in range(1, Q):
                dms = dms + fold_sc[pl.ds(1 + jq * Q + q, 1), :]
        for k in range(SUB):
            upd = dot_a(dlcat, k)
            if fold:
                upd = upd - dms
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def _hs_jacobi_t_kernel(rho_ref, *refs, B, TN, J, Q, packed=False,
                        fold=False, miss=False):
    """Transposed horseshoe Jacobi kernel (src/HorseshoeR.cpp:219-240):
    same phase structure as _jacobi_t_kernel minus the selection loop and
    label/v/bacc outputs.  refs layout:

    inputs:  xt_0..xt_{Q-1}, inner_row, pkgT, gpT, beta_lane, eps
             [, srow, msrow, xsum, esum0[, mcrow]]
    outputs: eps_out, beta_out (lane)
    scratch: rb (J, B), rT (B, J), bT (B, J), dposT (B, J), dpos (J, B),
             dlane (J, B)[, fold (1+J, 1)[, rmb (J, B), dlm (J, B)]]
    """
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, pkg_ref, gpt_ref, beta_ref, eps_ref) = rest[:5]
    if fold:
        nf = 5 if miss else 4
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[5:9]
        mcrow_ref = rest[9] if miss else None
        eps_out, beta_out = rest[5 + nf:7 + nf]
        scr = rest[7 + nf:]
        (rb_sc, rT_sc, bT_sc, dposT_sc,
         dpos_sc, dlane_sc, fold_sc) = scr[:7]
    else:
        eps_out, beta_out = rest[5:7]
        (rb_sc, rT_sc, bT_sc, dposT_sc,
         dpos_sc, dlane_sc) = rest[7:]

    r = pl.program_id(0)
    ph = pl.program_id(1)
    jq = pl.program_id(2)
    t = pl.program_id(3)
    f32 = jnp.float32
    F = 5
    JC, NC = _permute_chunks(J, B)
    CW = JC * B
    x_cat, x_mcat, SUB, W, exact = _decoders(xt_refs, Q, TN, packed, fold)
    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    if miss:
        def mc_row():
            # (1, Q*B) per-marker (mean - 3) row of this grid step's
            # blocks (see _make_dots)
            return jnp.concatenate(
                [mcrow_ref[0, pl.ds(jq * Q + q, 1), :]
                 for q in range(Q)], axis=1) - 3.0
    else:
        mc_row = None
    dot_r, dot_a = _make_dots(x_cat, x_mcat, exact, miss, mc_row)


    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))

    @pl.when(first)
    def _init():
        eps_out[...] = eps_ref[...]
        if fold:
            fold_sc[0:1, :] = jnp.full((1, 1), esum0_ref[0], f32)

    @pl.when(jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))
    def _zero_r():
        rb_sc[...] = jnp.zeros((J, B), f32)

    @pl.when(ph == 0)
    def _accumulate_r():
        acc = None
        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]
            d = dot_r(eps_t, k)
            acc = d if acc is None else acc + d
        for q in range(Q):
            rb_sc[pl.ds(jq * Q + q, 1), :] += acc[:, q * B:(q + 1) * B]

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(jq == 0, t == 0)))
    def _solve():
        if fold:
            es = fold_sc[0, 0]
            rb_sc[...] = rb_sc[...] * srow_ref[0] - msrow_ref[0] * es

        for c in range(NC):
            ir_c = innr_ref[0][:, c * CW:(c + 1) * CW]
            rpos = _lane_to_pos(rb_sc[c * JC:(c + 1) * JC, :], ir_c,
                                B=B, JC=JC)
            rT_sc[:, c * JC:(c + 1) * JC] = _tsp(rpos, JC)
            bpos = _lane_to_pos(beta_ref[0, c * JC:(c + 1) * JC, :], ir_c,
                                B=B, JC=JC)
            bT_sc[:, c * JC:(c + 1) * JC] = _tsp(bpos, JC)

        def body(s, _):
            rowF = pkg_ref[0, pl.ds(s * F, F), :]          # (5, J)
            invd = rowF[0:1, :]
            sdv = rowF[1:2, :]
            z_s = rowF[2:3, :]
            xsq_j = rowF[3:4, :]
            okf = rowF[4:5, :]

            r_jl = rT_sc[pl.ds(s, 1), :]
            beta_old = bT_sc[pl.ds(s, 1), :]

            num = r_jl + beta_old * xsq_j
            beta_new = num * invd + sdv * z_s
            d = okf * (beta_new - beta_old)                # (1, J)

            AT = gpt_ref[0, pl.ds(s * B, B), :]            # (B, J)
            rT_sc[...] -= AT * d
            dposT_sc[pl.ds(s, 1), :] = d
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)

        for c in range(NC):
            ir_c = innr_ref[0][:, c * CW:(c + 1) * CW]
            dpos_c = _tsp(dposT_sc[:, c * JC:(c + 1) * JC], B)
            dpos_sc[c * JC:(c + 1) * JC, :] = dpos_c
            dlane_sc[c * JC:(c + 1) * JC, :] = _pos_to_lane(
                dpos_c, ir_c, B=B, JC=JC)

        beta_out[0] = beta_ref[0] + dlane_sc[...]          # (J, B) lane

        if fold:
            dl = dlane_sc[...]
            sub1 = jnp.sum(dl * xsum_ref[0], axis=1, keepdims=True)
            fold_sc[0:1, :] -= jnp.sum(sub1, axis=0, keepdims=True)
            fold_sc[1:1 + J, :] = jnp.sum(dl * msrow_ref[0], axis=1,
                                          keepdims=True)
            dlane_sc[...] = dl * srow_ref[0]

    @pl.when(ph == 1)
    def _apply_update():
        dlcat = jnp.concatenate(
            [dlane_sc[pl.ds(jq * Q + q, 1), :] for q in range(Q)], axis=1)
        if fold:
            dms = fold_sc[pl.ds(1 + jq * Q, 1), :]
            for q in range(1, Q):
                dms = dms + fold_sc[pl.ds(1 + jq * Q + q, 1), :]
        for k in range(SUB):
            upd = dot_a(dlcat, k)
            if fold:
                upd = upd - dms
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def _packed_tile_n_t(Npad, B, J, F, Q):
    """Largest N-tile (a 2048-multiple dividing Npad) under the transposed
    kernel's VMEM residency model: Q double-buffered X tiles (B*TN/4 bytes
    each), double-buffered gpT (B*B*J*4) + pkgT (B*F*J*4) + the round
    metadata rows, eps (Npad*4), ~1 MiB of small scratches.  VMEM blocks
    pad the lane dim to 128."""
    cap_mb = float(os.environ.get("BAYESR_VMEM_CAP_MB", "13"))
    budget = int(cap_mb * 2 ** 20)
    lanes = max(J, 128)
    budget -= 2 * (B * B * lanes * 4) + 2 * (B * F * lanes * 4)
    budget -= 2 * 6 * (J * 128 * 4)
    budget -= int(1.0 * 2 ** 20) + Npad * 4
    nt_total = Npad // 2048
    kmax = max(1, budget // (Q * 2 * (B * 2048 // 4)))
    for k in range(min(nt_total, kmax), 0, -1):
        if nt_total % k == 0:
            return 2048 * k
    return 2048


def _prep_x(XT_pad, eps, *, packed, fold, tile_n, B, J, F, Q, row_valid):
    """Shared N-axis setup: returns (xt, eps2d, lane_mask, TN, Npad, N)."""
    f32 = jnp.float32
    if packed:
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        if Npad % 2048 or eps.shape[0] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        TN = _packed_tile_n_t(Npad, B, J, F, Q)
        if row_valid is None:
            raise ValueError("packed fold_affine needs row_valid")
        N = Npad
        xt = XT_pad
        eps2d = eps.astype(f32).reshape(1, Npad)
        lane_mask = row_valid.astype(f32).reshape(1, Npad)
    else:
        Mpad, N = XT_pad.shape
        TN0 = min(tile_n, max(128, 1 << (N - 1).bit_length()))
        Npad = -(-N // TN0) * TN0
        # VMEM-aware tile enlargement: 512-wide dense tiles put ~25k grid
        # invocations (~7 ms of pure overhead) on the 16k x 49k bench
        # shape -- grow TN to the largest multiple of TN0 that fits the
        # residency model (measured round 5; the packed path already
        # does this in _packed_tile_n_t)
        budget = int(float(os.environ.get("BAYESR_VMEM_CAP_MB", "13"))
                     * 2 ** 20)
        lanes = max(J, 128)
        budget -= 2 * (B * B * lanes * 4) + 2 * (B * F * lanes * 4)
        budget -= 2 * 6 * (J * 128 * 4) + int(1.0 * 2 ** 20) + Npad * 4
        nt_total = Npad // TN0
        # dense dots run the 3-pass bf16x3 split (_dot2 exact=False):
        # the hi/lo operand copies triple the resident X-tile bytes
        kmax = max(1, budget // (3 * Q * 2 * (B * TN0 * 4)))
        TN = TN0
        for k in range(min(nt_total, kmax), 0, -1):
            if nt_total % k == 0:
                TN = TN0 * k
                break
        eps2d = jnp.zeros((1, Npad), f32).at[0, :N].set(eps.astype(f32))
        xt = (XT_pad if Npad == N
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N))))
        lane_mask = (jnp.arange(Npad) < N).astype(f32).reshape(1, Npad)
    return xt, eps2d, lane_mask, TN, Npad, N


def _lane_rows(arr_pad, *, B: int, J: int, nr: int):
    """(Mpad,) block-padded array -> (nr, J, B) canonical strided-round
    lane-order rows (row (r, j) = block j*nr + r): a reshape + transpose,
    no gather."""
    return (arr_pad.reshape(J, nr, B).transpose(1, 0, 2))


def _merge_lane_rows(rows, Mpad):
    """Inverse of _lane_rows: (nr, J, B) -> (Mpad,)."""
    nr, J, B = rows.shape
    return rows.transpose(1, 0, 2).reshape(Mpad)


def _validate(nb, J, x_mean, XT_pad, fold_affine, missing=False):
    if nb % J:
        raise ValueError(f"jacobi sweep needs J | nb (J={J}, nb={nb})")
    if J > 128:
        raise ValueError("transposed jacobi sweep needs J <= 128 (lanes)")
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    miss = bool(missing)
    if miss and not packed:
        raise ValueError("the missing fast path needs 2-bit packed X "
                         "(int8 with missing calls: use the single-chain "
                         "kernel)")
    # missing mode runs the fold-affine algebra (raw-code dots) plus a
    # sparse mean-imputation correction driven by the in-word missing
    # indicator (code 3) -- see the module docstring
    fold = (bool(fold_affine) or miss) and quantized
    if quantized and not fold:
        raise ValueError("jacobi sweep supports dense, fold-affine, or "
                         "packed-missing quantized X only (int8 missing "
                         "calls: use the single-chain kernel)")
    return quantized, packed, fold, miss


def _warn_ablate():
    """BAYESR_T_ABLATE skips sweep phases for perf probing; a stale env
    var would silently yield statistically invalid chains (round-4 ADVICE
    item) -- warn loudly on every production kernel call."""
    a = os.environ.get("BAYESR_T_ABLATE", "")
    if a:
        import warnings

        warnings.warn(
            f"BAYESR_T_ABLATE={a!r} is set: the transposed Jacobi kernels "
            "SKIP part of the sweep and the chain is statistically "
            "INVALID.  Unset it unless you are running a perf ablation.",
            stacklevel=3)


def bayesr_jacobi_t_pallas(XT_pad, gram, xsq_pad, eps, beta_pad, labels_pad,
                           rho, inner_perm, p_arr, z_arr,
                           pi, cva, sigmaE, sigmaGG, g_assign_pad, valid_pad,
                           *, J: int = 64, tile_n: int = 512,
                           interpret: bool = False,
                           x_mean=None, x_scale=None, x_xsum=None,
                           fold_affine: bool = False, row_valid=None,
                           missing: bool = False):
    """Transposed-layout BayesR sweep with strided rounds.

    Argument conventions follow bayesr_jacobi_pallas EXCEPT the
    permutation pair: ``rho`` is the (nr,) round visit order and
    ``inner_perm`` the canonical (nb, B) within-block permutations; the
    blocks of round rho[r] are {j*nr + rho[r] : j < J} (the strided fixed
    partition -- see the module docstring).  The equivalent flat
    block_order for an oracle is ``(nr*arange(J)[None,:] +
    rho[:,None]).reshape(-1)``.

    ``missing=True`` (packed only): the words carry real MISSING_CODE
    entries decoding to 0 (mean imputation, matching the serial kernel's
    in-kernel decode, ops/pallas_sweep.py); the kernel applies the exact
    sparse correction from the in-word missing indicator (see
    _jacobi_t_kernel).  This keeps the Jacobi fast path on real
    (non-imputed) .bed data -- the reference instead requires user-side
    imputation in R (vignettes/BayesRR.Rmd:81-92).
    """
    nb, B, _ = gram.shape
    quantized, packed, fold, miss = _validate(nb, J, x_mean, XT_pad,
                                              fold_affine, missing)
    _warn_ablate()
    nr = nb // J
    f32 = jnp.float32
    G, K = pi.shape
    F = 3 * K + 4
    Q = auto_q(J)
    xt, eps2d, lane_mask, TN, Npad, N = _prep_x(
        XT_pad, eps, packed=packed, fold=fold, tile_n=tile_n, B=B, J=J,
        F=F, Q=Q, row_valid=row_valid)
    nt = Npad // TN
    Mpad = beta_pad.shape[0]

    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_strided(xsq_pad, g_assign_pad, valid_pad, p_arr,
                              z_arr, pi, cva, sigmaE, sigmaGG, P2,
                              B=B, J=J, nr=nr)
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    beta_lane = _lane_rows(beta_pad.astype(f32), B=B, J=J, nr=nr)
    gas_lane = _lane_rows(g_assign_pad.astype(jnp.int32), B=B, J=J, nr=nr)
    rho_i = rho.astype(jnp.int32)
    se1 = sigmaE.astype(f32).reshape(1)

    def im_xt(q):
        def f(r, ph, jq, t, rho_ref):
            return ((jq * Q + q) * nr + rho_ref[r], t)
        return f

    def im_round(r, ph, jq, t, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_full(r, ph, jq, t, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner (flat)
            pl.BlockSpec((1, B * F, J), im_round),         # pkgT
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, J, B), im_round),             # gas rows (lane)
            pl.BlockSpec((1, J, B), im_round),             # beta rows (lane)
            pl.BlockSpec((1, Npad), im_full),              # eps
            pl.BlockSpec(memory_space=pltpu.SMEM),         # sigmaE (1,)
        ])
    args = [xt] * Q + [inner_row, pkgT, gpT, gas_lane, beta_lane,
                       eps2d, se1]
    scratch = [
        pltpu.VMEM((J, B), f32),                           # r rows (lane)
        pltpu.VMEM((B, J), f32),                           # rT
        pltpu.VMEM((B, J), f32),                           # bT
        pltpu.VMEM((B, J), f32),                           # deltaT (pos)
        pltpu.VMEM((B, J), f32),                           # krecT (pos)
        pltpu.VMEM((J, B), f32),                           # delta (pos, row)
        pltpu.VMEM((J, B), f32),                           # delta (lane)
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round),    # srow rows
                     pl.BlockSpec((1, J, B), im_round),    # msrow rows
                     pl.BlockSpec((1, J, B), im_round),    # xsum rows
                     pl.BlockSpec(memory_space=pltpu.SMEM)]  # esum0 (1,)
        srow_r = _lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr)
        msrow_r = _lane_rows(
            x_mean.astype(f32) * x_scale.astype(f32), B=B, J=J, nr=nr)
        xsum_r = _lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr)
        args += [srow_r, msrow_r, xsum_r, jnp.sum(eps2d, axis=1)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]  # mean rows
            args += [_lane_rows(x_mean.astype(f32), B=B, J=J, nr=nr)]
        scratch += [pltpu.VMEM((1 + J, 1), f32)]           # esum ; dms_j
    out_specs = [
        pl.BlockSpec((1, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, J, B), im_round),                 # beta_out (lane)
        pl.BlockSpec((1, J, B), im_round),                 # klane_out
        pl.BlockSpec((1, G * K), im_full),                 # v_out
        pl.BlockSpec((1, G), im_full),                     # bacc_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), f32),
        jax.ShapeDtypeStruct((nr, J, B), f32),
        jax.ShapeDtypeStruct((nr, J, B), f32),
        jax.ShapeDtypeStruct((1, G * K), f32),
        jax.ShapeDtypeStruct((1, G), f32),
    ]
    kernel = functools.partial(_jacobi_t_kernel, B=B, TN=TN, K=K, G=G,
                               J=J, Q=Q, packed=packed, fold=fold,
                               miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, J // Q, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o, kl_o, v_o, bacc_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_i, *args)

    if fold:
        eps_o = eps_o * lane_mask  # re-zero drifted pad lanes
    # outputs are canonical lane-order slabs: merging back is a
    # transpose+reshape (no scatter)
    beta_flat = _merge_lane_rows(beta_o, Mpad)
    kv_flat = _merge_lane_rows(kl_o, Mpad)
    labels_flat = jnp.where(kv_flat >= 0.0, kv_flat.astype(jnp.int32),
                            labels_pad.astype(jnp.int32))
    return SweepResult(
        eps=eps_o[0, :N].astype(eps.dtype),
        beta=beta_flat.astype(beta_pad.dtype),
        labels=labels_flat,
        v=v_o.reshape(G, K).astype(eps.dtype),
        beta_acum=bacc_o[0].astype(eps.dtype),
    )


def horseshoe_jacobi_t_pallas(XT_pad, gram, xsq_pad, eps, beta_pad,
                              rho, inner_perm, z_arr,
                              lam_pad, tau, c2, sigmaE, valid_pad,
                              *, J: int = 64, tile_n: int = 512,
                              interpret: bool = False,
                              x_mean=None, x_scale=None, x_xsum=None,
                              fold_affine: bool = False, row_valid=None,
                              missing: bool = False):
    """Transposed-layout horseshoe sweep with strided rounds (same
    permutation and ``missing`` conventions as bayesr_jacobi_t_pallas)."""
    nb, B, _ = gram.shape
    quantized, packed, fold, miss = _validate(nb, J, x_mean, XT_pad,
                                              fold_affine, missing)
    _warn_ablate()
    nr = nb // J
    f32 = jnp.float32
    Q = auto_q(J)
    xt, eps2d, lane_mask, TN, Npad, N = _prep_x(
        XT_pad, eps, packed=packed, fold=fold, tile_n=tile_n, B=B, J=J,
        F=5, Q=Q, row_valid=row_valid)
    nt = Npad // TN
    Mpad = beta_pad.shape[0]

    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_hs_strided(xsq_pad, valid_pad, z_arr, lam_pad, tau,
                                 c2, sigmaE, P2, B=B, J=J, nr=nr)
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    beta_lane = _lane_rows(beta_pad.astype(f32), B=B, J=J, nr=nr)
    rho_i = rho.astype(jnp.int32)

    def im_xt(q):
        def f(r, ph, jq, t, rho_ref):
            return ((jq * Q + q) * nr + rho_ref[r], t)
        return f

    def im_round(r, ph, jq, t, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_full(r, ph, jq, t, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner (flat)
            pl.BlockSpec((1, B * 5, J), im_round),         # pkgT
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, J, B), im_round),             # beta rows (lane)
            pl.BlockSpec((1, Npad), im_full),              # eps
        ])
    args = [xt] * Q + [inner_row, pkgT, gpT, beta_lane, eps2d]
    scratch = [
        pltpu.VMEM((J, B), f32),                           # r rows (lane)
        pltpu.VMEM((B, J), f32),                           # rT
        pltpu.VMEM((B, J), f32),                           # bT
        pltpu.VMEM((B, J), f32),                           # deltaT (pos)
        pltpu.VMEM((J, B), f32),                           # delta (pos, row)
        pltpu.VMEM((J, B), f32),                           # delta (lane)
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round),
                     pl.BlockSpec((1, J, B), im_round),
                     pl.BlockSpec((1, J, B), im_round),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]
        srow_r = _lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr)
        msrow_r = _lane_rows(
            x_mean.astype(f32) * x_scale.astype(f32), B=B, J=J, nr=nr)
        xsum_r = _lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr)
        args += [srow_r, msrow_r, xsum_r, jnp.sum(eps2d, axis=1)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]  # mean rows
            args += [_lane_rows(x_mean.astype(f32), B=B, J=J, nr=nr)]
        scratch += [pltpu.VMEM((1 + J, 1), f32)]
    out_specs = [
        pl.BlockSpec((1, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, J, B), im_round),                 # beta_out (lane)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), f32),
        jax.ShapeDtypeStruct((nr, J, B), f32),
    ]
    kernel = functools.partial(_hs_jacobi_t_kernel, B=B, TN=TN, J=J, Q=Q,
                               packed=packed, fold=fold, miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, J // Q, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_i, *args)

    if fold:
        eps_o = eps_o * lane_mask
    beta_flat = _merge_lane_rows(beta_o, Mpad)
    return (eps_o[0, :N].astype(eps.dtype),
            beta_flat.astype(beta_pad.dtype))


# ------------------------------------------------------------ multi-chain

def build_pkgT_mc_strided(xsq, gas, valid, p, z, pi, cva, sigmaE, sigmaGG,
                          P2, *, B, J, nr):
    """Multi-chain transposed packed operand (nr, B*F*C, J), F = 3K+4:
    row (s*F + f)*C + c of slab r holds field f of position s for chain c.
    Per-chain fields from the per-chain hypers; xsq/valid duplicated per
    chain (keeps the step's field extraction a static (C, J) slice)."""
    f32 = jnp.float32
    C = sigmaE.shape[0]
    G, K = pi.shape[1], pi.shape[2]
    tblc = jax.vmap(_bayesr_tbl, in_axes=(None, None, 0, None, 0, 0))(
        xsq, gas, pi, cva, sigmaE, sigmaGG)                # (C, Mpad, 3K)
    xv = jnp.stack([xsq.astype(f32), valid.astype(f32)], axis=1)
    tbl = jnp.concatenate(
        [tblc, jnp.broadcast_to(xv[None], (C,) + xv.shape)], axis=2)
    T2c = tbl.reshape(C, J, nr, B, 3 * K + 2)
    per = jnp.einsum('jrms,cjrmf->rsfcj', P2, T2c,
                     preferred_element_type=f32)       # (nr,B,3K+2,C,J)
    # position-indexed per-chain randoms: position of (r, j, s) is
    # (r*J + j)*B + s (canonical slab order; rho applies in the kernel)
    p5 = p.astype(f32).reshape(C, nr, J, B).transpose(1, 3, 0, 2)[
        :, :, None, :, :]                              # (nr, B, 1, C, J)
    z5 = z.astype(f32).reshape(C, nr, J, B).transpose(1, 3, 0, 2)[
        :, :, None, :, :]
    pkg = jnp.concatenate(
        [per[:, :, :3 * K], p5, z5, per[:, :, 3 * K:]], axis=2)
    F = 3 * K + 4
    return pkg.reshape(nr, B * F * C, J)


def _jacobi_t_mc_kernel(rho_ref, *refs, B, TN, K, G, C, J, Q,
                        packed=False, fold=False, miss=False):
    """Multi-chain transposed Jacobi kernel (strided rounds): C chains
    share the X stream and the Gram operand; every per-step quantity adds
    a chain band.  refs layout:

    inputs:  xt_0..xt_{Q-1}, inner_row, pkgT, gpT, gas_lane (shared),
             beta_lane (C*J, B), hse (C, 1), eps_hbm (ANY)
             [, srow, msrow, xsum (shared), esum0 (C, 1)[, mcrow]]
    outputs: eps_out (C, Npad), beta_out (C*J, B), klane_out (C*J, B),
             v_out (C, G*K), bacc_out (C, G)
    scratch: rb (C*J, B), rT (C*B, J), bT (C*B, J), dposT (C*B, J),
             krecT (C*B, J), dpos (C*J, B), dlane (C*J, B), dma sem
             [, esum (C, 1), dms (C, J), dmsq (J/Q, C)[, rmb (C*J, B),
             dlm (C*J, B)]]
    """
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, pkg_ref, gpt_ref, gasl_ref, beta_ref, hse_ref,
     epsh_ref) = rest[:7]
    if fold:
        nf = 5 if miss else 4
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[7:11]
        mcrow_ref = rest[11] if miss else None
        outs = rest[7 + nf:12 + nf]
        scr = rest[12 + nf:]
        (rb_sc, rT_sc, bT_sc, dposT_sc, krecT_sc, dpos_sc, dlane_sc,
         sem, esum_sc, dms_sc, dmsq_sc) = scr[:11]
    else:
        outs = rest[7:12]
        (rb_sc, rT_sc, bT_sc, dposT_sc, krecT_sc, dpos_sc, dlane_sc,
         sem) = rest[12:]
    eps_out, beta_out, klane_out, v_out, bacc_out = outs

    r = pl.program_id(0)
    ph = pl.program_id(1)
    jq = pl.program_id(2)
    t = pl.program_id(3)
    f32 = jnp.float32
    F = 3 * K + 4
    JC, NC = _permute_chunks(J, B)
    CW = JC * B
    _ablate = os.environ.get("BAYESR_T_ABLATE", "")  # perf probe only
    x_cat, x_mcat, SUB, W, exact = _decoders(xt_refs, Q, TN, packed, fold)
    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    if miss:
        def mc_row():
            # (1, Q*B) per-marker (mean - 3) row of this grid step's
            # blocks (see _make_dots)
            return jnp.concatenate(
                [mcrow_ref[0, pl.ds(jq * Q + q, 1), :]
                 for q in range(Q)], axis=1) - 3.0
    else:
        mc_row = None
    dot_r, dot_a = _make_dots(x_cat, x_mcat, exact, miss, mc_row)


    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))

    @pl.when(first)
    def _init():
        # eps stays in HBM (ANY) on the input side -- one DMA fills the
        # resident output block (halves the eps VMEM footprint vs a
        # resident input block)
        copy = pltpu.make_async_copy(epsh_ref, eps_out, sem)
        copy.start()
        copy.wait()
        v_out[...] = jnp.zeros_like(v_out)
        bacc_out[...] = jnp.zeros_like(bacc_out)
        if fold:
            esum_sc[...] = esum0_ref[...]

    def _solve_noop():
        dposT_sc[...] = jnp.zeros_like(dposT_sc)
        krecT_sc[...] = jnp.full_like(krecT_sc, -1.0)
        dpos_sc[...] = jnp.zeros_like(dpos_sc)
        dlane_sc[...] = jnp.zeros_like(dlane_sc)
        beta_out[0] = beta_ref[0]
        klane_out[0] = jnp.full((C * J, B), -1.0, f32)
        if fold:
            dmsq_sc[...] = jnp.zeros_like(dmsq_sc)

    @pl.when(jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))
    def _zero_r():
        rb_sc[...] = jnp.zeros((C * J, B), f32)

    @pl.when(ph == 0)
    def _accumulate_r():
        acc = None
        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]   # (C, W)
            d = dot_r(eps_t, k)
            acc = d if acc is None else acc + d
        for q in range(Q):
            jj = jq * Q + q
            for c in range(C):
                rb_sc[pl.ds(c * J + jj, 1), :] += acc[c:c + 1,
                                                      q * B:(q + 1) * B]

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(jq == 0, t == 0)))
    def _solve():
        if _ablate == "solve":       # perf probe: X phases only
            _solve_noop()
            return
        if fold:
            for c in range(C):
                es = esum_sc[c, 0]
                rb_sc[c * J:(c + 1) * J, :] = (
                    rb_sc[c * J:(c + 1) * J, :] * srow_ref[0]
                    - msrow_ref[0] * es)

        for c in range(C):
            for ch in range(NC):
                # bands: chain c occupies rows [c*B, (c+1)*B) of the
                # (C*B, J) transposed scratches and rows [c*J, (c+1)*J)
                # of the (C*J, B) lane-order ones
                ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                rows = rb_sc[c * J + ch * JC:c * J + (ch + 1) * JC, :]
                rT_sc[c * B:(c + 1) * B, ch * JC:(ch + 1) * JC] = _tsp(
                    _lane_to_pos(rows, ir_c, B=B, JC=JC), JC)
                brows = beta_ref[0, c * J + ch * JC:c * J + (ch + 1) * JC, :]
                bT_sc[c * B:(c + 1) * B, ch * JC:(ch + 1) * JC] = _tsp(
                    _lane_to_pos(brows, ir_c, B=B, JC=JC), JC)

        Kf = jnp.float32(K)
        hse = hse_ref[...]                                  # (C, 1)

        def band(sc, s):
            # (C, J) read assembled from the C chain bands at position s
            return jnp.concatenate(
                [sc[pl.ds(c * B + s, 1), :] for c in range(C)], axis=0)

        def body(s, _):
            slab = pkg_ref[0, pl.ds(s * F * C, F * C), :]  # (F*C, J)

            def fld(f):
                return slab[f * C:(f + 1) * C, :]           # (C, J)

            lp = [fld(k) for k in range(K)]
            invd = [fld(K + k) for k in range(K)]
            sd = [fld(2 * K + k) for k in range(K)]
            p_s = fld(3 * K)
            z_s = fld(3 * K + 1)
            xsq_j = fld(3 * K + 2)
            okf = fld(3 * K + 3)

            r_jl = band(rT_sc, s)                           # (C, J)
            beta_old = band(bT_sc, s)

            num = r_jl + beta_old * xsq_j                   # (C, J)
            muk = [num * invd[k] for k in range(K)]         # K x (C, J)
            logL = [lp[k] + (hse * num) * muk[k] for k in range(K)]

            k_sel = jnp.full((C, J), Kf, f32)
            acum = jnp.zeros((C, J), f32)
            for k in range(K):
                lk = logL[k]
                g = jnp.abs(logL[1] - lk)
                for kk in range(2, K):
                    g = jnp.maximum(g, jnp.abs(logL[kk] - lk))
                guard = g > 700.0
                Ssum = jnp.exp(logL[0] - lk)
                for kk in range(1, K):
                    Ssum = Ssum + jnp.exp(logL[kk] - lk)
                w = jnp.where(guard, jnp.zeros((C, J), f32), 1.0 / Ssum)
                acum = acum + w
                hit = jnp.logical_and(p_s <= acum, k_sel == Kf)
                k_sel = jnp.where(hit, jnp.float32(k), k_sel)
            hitm = k_sel < Kf

            mu_sel = jnp.zeros((C, J), f32)
            sd_sel = jnp.zeros((C, J), f32)
            for k in range(K):
                selk = (k_sel == jnp.float32(k)).astype(f32)
                mu_sel = mu_sel + muk[k] * selk
                sd_sel = sd_sel + sd[k] * selk
            beta_new = jnp.where(hitm, mu_sel + sd_sel * z_s, beta_old)
            d = okf * (beta_new - beta_old)                 # (C, J)

            AT = gpt_ref[0, pl.ds(s * B, B), :]             # (B, J)
            kv = jnp.where(okf * hitm.astype(f32) > 0, k_sel,
                           jnp.float32(-1.0))
            for c in range(C):
                rT_sc[c * B:(c + 1) * B, :] -= AT * d[c:c + 1, :]
                dposT_sc[pl.ds(c * B + s, 1), :] = d[c:c + 1, :]
                krecT_sc[pl.ds(c * B + s, 1), :] = kv[c:c + 1, :]
            return ()

        if _ablate == "serial":      # perf probe: skip the dependent chain
            dposT_sc[...] = jnp.zeros_like(dposT_sc)
            krecT_sc[...] = jnp.full_like(krecT_sc, -1.0)
        else:
            lax.fori_loop(0, B, body, (), unroll=False)

        for c in range(C):
            for ch in range(NC):
                ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                lo, hi = c * J + ch * JC, c * J + (ch + 1) * JC
                cols = slice(ch * JC, (ch + 1) * JC)
                dpos_c = _tsp(dposT_sc[c * B:(c + 1) * B, cols], B)
                dpos_sc[lo:hi, :] = dpos_c                  # (JC, B)
                dlane_sc[lo:hi, :] = _pos_to_lane(dpos_c, ir_c, B=B, JC=JC)
                kpos_c = _tsp(krecT_sc[c * B:(c + 1) * B, cols], B)
                klane_out[0, lo:hi, :] = _pos_to_lane(kpos_c, ir_c,
                                                      B=B, JC=JC)

        beta_new_r = beta_ref[0] + dlane_sc[...]            # (C*J, B)
        beta_out[0] = beta_new_r
        gas_r = gasl_ref[0]                                 # (J, B) shared
        for c in range(C):
            kl = klane_out[0][c * J:(c + 1) * J, :]
            bn = beta_new_r[c * J:(c + 1) * J, :]
            slab2 = jnp.where(kl > 0.0, bn * bn, 0.0)
            vcols = []
            bcols = []
            for g in range(G):
                gm = (gas_r == g).astype(f32)
                for k in range(K):
                    km = (kl == jnp.float32(k)).astype(f32)
                    s1 = jnp.sum(km * gm, axis=1, keepdims=True)
                    vcols.append(jnp.sum(s1, axis=0, keepdims=True))
                sb = jnp.sum(slab2 * gm, axis=1, keepdims=True)
                bcols.append(jnp.sum(sb, axis=0, keepdims=True))
            v_out[c:c + 1, :] += jnp.concatenate(vcols, axis=1)
            bacc_out[c:c + 1, :] += jnp.concatenate(bcols, axis=1)

        if fold:
            for c in range(C):
                dl = dlane_sc[c * J:(c + 1) * J, :]         # (J, B)
                sub1 = jnp.sum(dl * xsum_ref[0], axis=1, keepdims=True)
                esum_sc[c:c + 1, :] -= jnp.sum(sub1, axis=0, keepdims=True)
                dms_c = jnp.sum(dl * msrow_ref[0], axis=1,
                                keepdims=True)              # (J, 1)
                dms_sc[c:c + 1, :] = _tsp(dms_c, J)         # row c: (1, J)
                dlane_sc[c * J:(c + 1) * J, :] = dl * srow_ref[0]
            # per-(grid-step, chain) pre-summed dms: row jq holds the sum
            # of its Q blocks' dms for each chain
            JQ2 = J // Q
            gmat = (jax.lax.broadcasted_iota(jnp.int32, (JQ2, J), 1) // Q
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (JQ2, J), 0)).astype(f32)
            dmsq_sc[...] = _dot2_vrhs(gmat, dms_sc[...])                 # (J/Q, C)

    @pl.when(ph == 1)
    def _apply_update():
        def catrows(sc):
            rows = []
            for c in range(C):
                rows.append(jnp.concatenate(
                    [sc[pl.ds(c * J + jq * Q + q, 1), :]
                     for q in range(Q)], axis=1))           # (1, Q*B)
            return jnp.concatenate(rows, axis=0)            # (C, Q*B)

        dlcat = catrows(dlane_sc)
        if fold:
            dms = _tsp(dmsq_sc[pl.ds(jq, 1), :], 1)         # (C, 1)
        for k in range(SUB):
            upd = dot_a(dlcat, k)
            if fold:
                upd = upd - dms
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def bayesr_jacobi_t_pallas_mc(XT_pad, gram, xsq_pad, eps, beta_pad,
                              labels_pad, rho, inner_perm, p_arr, z_arr,
                              pi, cva, sigmaE, sigmaGG, g_assign_pad,
                              valid_pad, *, J: int = 64, tile_n: int = 512,
                              interpret: bool = False,
                              x_mean=None, x_scale=None, x_xsum=None,
                              fold_affine: bool = False, row_valid=None,
                              missing: bool = False):
    """C-chain fused transposed Jacobi sweep (strided rounds).  Batched
    leaves carry a leading chain axis: eps (C, N-or-Npad), beta/labels
    (C, Mpad), p/z (C, Mpad) POSITION-indexed in canonical slab order,
    pi (C, G, K), sigmaE (C,), sigmaGG (C, G).  X/gram/permutations are
    shared (states never interact; independent p/z streams keep chains
    mutually independent -- the reference runs one chain per R process,
    src/BayesRv2.cpp:171).  ``missing`` follows bayesr_jacobi_t_pallas
    (per-chain missing-dot corrections; the indicator operand is shared).
    Returns an MCSweepResult."""
    from .pallas_multichain import MCSweepResult

    nb, B, _ = gram.shape
    quantized, packed, fold, miss = _validate(nb, J, x_mean, XT_pad,
                                              fold_affine, missing)
    _warn_ablate()
    nr = nb // J
    f32 = jnp.float32
    C = eps.shape[0]
    G, K = pi.shape[1], pi.shape[2]
    F = 3 * K + 4

    # VMEM budget: the (C*J, B) lane-order buffers pad their 32-lane dim
    # to 128 (4x), and pkgT grows linearly in C -- above 4 chains the
    # full-row N-tile no longer fits and the grid explodes.  The WIDE
    # kernel (bayesr_jacobi_t_pallas_mc8) solves this by tiling eps
    # through HBM and DMA-ing per-chain operands per solve group, so up
    # to 16 chains share ONE X stream + decode; fall back to <= 4-chain
    # groups (X re-streamed per group) when disabled.
    CG = int(os.environ.get("BAYESR_MC_GROUP", "4"))
    if C > CG:
        wide = os.environ.get("BAYESR_MC_WIDE", "1") != "0"
        if wide and C <= 16:
            return bayesr_jacobi_t_pallas_mc8(
                XT_pad, gram, xsq_pad, eps, beta_pad, labels_pad, rho,
                inner_perm, p_arr, z_arr, pi, cva, sigmaE, sigmaGG,
                g_assign_pad, valid_pad, J=J, interpret=interpret,
                x_mean=x_mean, x_scale=x_scale, x_xsum=x_xsum,
                fold_affine=fold_affine, row_valid=row_valid,
                missing=missing)
        outs = []
        for c0 in range(0, C, CG):
            sl = slice(c0, min(c0 + CG, C))
            outs.append(bayesr_jacobi_t_pallas_mc(
                XT_pad, gram, xsq_pad, eps[sl], beta_pad[sl],
                labels_pad[sl], rho, inner_perm, p_arr[sl], z_arr[sl],
                pi[sl], cva, sigmaE[sl], sigmaGG[sl], g_assign_pad,
                valid_pad, J=J, tile_n=tile_n, interpret=interpret,
                x_mean=x_mean, x_scale=x_scale, x_xsum=x_xsum,
                fold_affine=fold_affine, row_valid=row_valid,
                missing=missing))
        return MCSweepResult(*(jnp.concatenate([getattr(o, f) for o in outs],
                                               axis=0)
                               for f in MCSweepResult._fields))

    # pick (Q, TN) minimizing grid invocations (J/Q)*(Npad/TN) under the
    # VMEM model -- a too-large Q forces small N-tiles and the grid
    # overhead dwarfs the wider dot's gain
    if packed:
        Npad_ = XT_pad.shape[1] * 16
        best = None
        for q in (4, 2, 1):
            if J % q:
                continue
            tn = _packed_tile_n_mc(Npad_, B, J, F, q, C)
            inv = (J // q) * (Npad_ // tn)
            if best is None or inv < best[0]:
                best = (inv, q)
        Q = best[1]
    else:
        Q = auto_q(J)
    xt, epsC, lane_mask, TN, Npad, N = _prep_x_mc(
        XT_pad, eps, packed=packed, tile_n=tile_n, B=B, J=J, F=F, Q=Q,
        C=C, row_valid=row_valid)
    nt = Npad // TN
    Mpad = beta_pad.shape[1]

    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_mc_strided(xsq_pad, g_assign_pad, valid_pad, p_arr,
                                 z_arr, pi, cva, sigmaE, sigmaGG, P2,
                                 B=B, J=J, nr=nr)
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    # (C, Mpad) -> (nr, C*J, B) canonical lane slabs, rows (c, j)
    beta_lane = (beta_pad.astype(f32).reshape(C, J, nr, B)
                 .transpose(2, 0, 1, 3).reshape(nr, C * J, B))
    gas_lane = _lane_rows(g_assign_pad.astype(jnp.int32), B=B, J=J, nr=nr)
    hse2 = (0.5 / sigmaE.astype(f32)).reshape(C, 1)
    rho_i = rho.astype(jnp.int32)

    def im_xt(q):
        def f(r, ph, jq, t, rho_ref):
            return ((jq * Q + q) * nr + rho_ref[r], t)
        return f

    def im_round(r, ph, jq, t, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_full(r, ph, jq, t, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner (flat)
            pl.BlockSpec((1, B * F * C, J), im_round),     # pkgT
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, J, B), im_round),             # gas (shared)
            pl.BlockSpec((1, C * J, B), im_round),         # beta (lane)
            pl.BlockSpec((C, 1), im_full),                 # 0.5/sigmaE
            pl.BlockSpec(memory_space=pl.ANY),          # eps (HBM)
        ])
    args = [xt] * Q + [inner_row, pkgT, gpT, gas_lane, beta_lane, hse2,
                       epsC]
    scratch = [
        pltpu.VMEM((C * J, B), f32),                       # r rows (lane)
        pltpu.VMEM((C * B, J), f32),                       # rT bands
        pltpu.VMEM((C * B, J), f32),                       # bT bands
        pltpu.VMEM((C * B, J), f32),                       # deltaT bands
        pltpu.VMEM((C * B, J), f32),                       # krecT bands
        pltpu.VMEM((C * J, B), f32),                       # delta (pos)
        pltpu.VMEM((C * J, B), f32),                       # delta (lane)
        pltpu.SemaphoreType.DMA,                           # eps init copy
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round),    # srow (shared)
                     pl.BlockSpec((1, J, B), im_round),    # msrow
                     pl.BlockSpec((1, J, B), im_round),    # xsum
                     pl.BlockSpec((C, 1), im_full)]        # esum0
        srow_r = _lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr)
        msrow_r = _lane_rows(
            x_mean.astype(f32) * x_scale.astype(f32), B=B, J=J, nr=nr)
        xsum_r = _lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr)
        args += [srow_r, msrow_r, xsum_r,
                 jnp.sum(epsC, axis=1, keepdims=True)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]  # mean rows
            args += [_lane_rows(x_mean.astype(f32), B=B, J=J, nr=nr)]
        scratch += [pltpu.VMEM((C, 1), f32),               # esum / chain
                    pltpu.VMEM((C, J), f32),               # dms rows
                    pltpu.VMEM((J // Q, C), f32)]          # dms / grid step
    out_specs = [
        pl.BlockSpec((C, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, C * J, B), im_round),             # beta_out
        pl.BlockSpec((1, C * J, B), im_round),             # klane_out
        pl.BlockSpec((C, G * K), im_full),                 # v_out
        pl.BlockSpec((C, G), im_full),                     # bacc_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((C, Npad), f32),
        jax.ShapeDtypeStruct((nr, C * J, B), f32),
        jax.ShapeDtypeStruct((nr, C * J, B), f32),
        jax.ShapeDtypeStruct((C, G * K), f32),
        jax.ShapeDtypeStruct((C, G), f32),
    ]
    kernel = functools.partial(_jacobi_t_mc_kernel, B=B, TN=TN, K=K, G=G,
                               C=C, J=J, Q=Q, packed=packed, fold=fold,
                               miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, J // Q, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o, kl_o, v_o, bacc_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_i, *args)

    if fold:
        eps_o = eps_o * lane_mask                          # (1, Npad) bcast
    # (nr, C*J, B) canonical lane slabs -> (C, Mpad)
    beta_flat = (beta_o.reshape(nr, C, J, B).transpose(1, 2, 0, 3)
                 .reshape(C, Mpad))
    kv_flat = (kl_o.reshape(nr, C, J, B).transpose(1, 2, 0, 3)
               .reshape(C, Mpad))
    labels_flat = jnp.where(kv_flat >= 0.0, kv_flat.astype(jnp.int32),
                            labels_pad.astype(jnp.int32))
    return MCSweepResult(
        eps=(eps_o if packed else eps_o[:, :N]).astype(eps.dtype),
        beta=beta_flat.astype(beta_pad.dtype),
        labels=labels_flat,
        v=v_o.reshape(C, G, K).astype(eps.dtype),
        beta_acum=bacc_o.astype(eps.dtype),
    )


def _prep_x_mc(XT_pad, eps, *, packed, tile_n, B, J, F, Q, C, row_valid):
    """Multi-chain N-axis setup (eps is (C, N-or-Npad))."""
    f32 = jnp.float32
    if packed:
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        if Npad % 2048 or eps.shape[1] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        TN = _packed_tile_n_mc(Npad, B, J, F, Q, C)
        if row_valid is None:
            raise ValueError("packed fold_affine needs row_valid")
        N = Npad
        xt = XT_pad
        epsC = eps.astype(f32)
        lane_mask = row_valid.astype(f32).reshape(1, Npad)
    else:
        Mpad, N = XT_pad.shape
        TN = min(tile_n, max(128, 1 << (N - 1).bit_length()))
        Npad = -(-N // TN) * TN
        epsC = jnp.zeros((eps.shape[0], Npad), f32).at[:, :N].set(
            eps.astype(f32))
        xt = (XT_pad if Npad == N
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N))))
        lane_mask = (jnp.arange(Npad) < N).astype(f32).reshape(1, Npad)
    return xt, epsC, lane_mask, TN, Npad, N


def _packed_tile_n_mc(Npad, B, J, F, Q, C):
    """VMEM model for the multi-chain kernel: resident (C, Npad) eps out,
    double-buffered pkgT (B*F*C rows, J lanes), Q double-buffered X
    tiles.  VMEM blocks pad the lane dim to 128 (the (C*J, B) lane-order
    buffers pad 4x at B=32)."""
    cap_mb = float(os.environ.get("BAYESR_VMEM_CAP_MB", "13"))
    budget = int(cap_mb * 2 ** 20)
    lanes = max(J, 128)
    budget -= 2 * (B * B * lanes * 4)                       # gpT
    budget -= 2 * (B * F * C * lanes * 4)                   # pkgT
    budget -= 2 * 4 * (J * 128 * 4)                         # shared rows
    budget -= (2 + 2 * 2) * (C * J * 128 * 4)               # beta in+outs
    budget -= C * Npad * 4                     # eps out (input stays HBM)
    budget -= 3 * (C * J * 128 * 4) + 4 * (C * B * lanes * 4)  # scratches
    budget -= int(0.5 * 2 ** 20)
    nt_total = Npad // 2048
    kmax = max(1, budget // (Q * 2 * (B * 2048 // 4)))
    for k in range(min(nt_total, kmax), 0, -1):
        if nt_total % k == 0:
            return 2048 * k
    return 2048


def build_pkgT_hs_mc_strided(xsq, valid, z, lam, tau, c2, sigmaE, P2,
                             *, B, J, nr):
    """Multi-chain transposed horseshoe operand (nr, B*5*C, J): row
    (s*5 + f)*C + c holds field f of position s for chain c, fields
    [1/denom, sd, z, xsq, valid] (src/HorseshoeR.cpp:224, 234)."""
    f32 = jnp.float32
    C, Mpad = lam.shape
    xsq = xsq.astype(f32)
    lamf = lam.astype(f32)
    tauf = tau.astype(f32)[:, None]
    c2f = c2.astype(f32)[:, None]
    sE = sigmaE.astype(f32)[:, None]
    s_j = tauf * c2f * lamf / (tauf * lamf + c2f)          # (C, Mpad)
    denom = xsq[None, :] + sE / s_j
    xv = jnp.broadcast_to(
        jnp.stack([xsq, valid.astype(f32)], axis=1)[None], (C, Mpad, 2))
    tbl = jnp.concatenate(
        [jnp.stack([1.0 / denom, jnp.sqrt(sE / denom)], axis=2), xv],
        axis=2)                                            # (C, Mpad, 4)
    T2c = tbl.reshape(C, J, nr, B, 4)
    per = jnp.einsum('jrms,cjrmf->rsfcj', P2, T2c,
                     preferred_element_type=f32)           # (nr,B,4,C,J)
    z5 = z.astype(f32).reshape(C, nr, J, B).transpose(1, 3, 0, 2)[
        :, :, None, :, :]                                  # position-idx
    pkg = jnp.concatenate([per[:, :, :2], z5, per[:, :, 2:]], axis=2)
    return pkg.reshape(nr, B * 5 * C, J)


def _hs_jacobi_t_mc_kernel(rho_ref, *refs, B, TN, C, J, Q, packed=False,
                           fold=False, miss=False):
    """Multi-chain transposed horseshoe kernel: _jacobi_t_mc_kernel minus
    the selection loop and label/v/bacc outputs.  refs layout:

    inputs:  xt_0..xt_{Q-1}, inner_row, pkgT, gpT, beta_lane (C*J, B),
             eps_hbm (ANY)[, srow, msrow, xsum (shared), esum0 (C, 1)
             [, mcrow]]
    outputs: eps_out (C, Npad), beta_out (C*J, B)
    scratch: rb (C*J, B), rT (C*B, J), bT (C*B, J), dposT (C*B, J),
             dpos (C*J, B), dlane (C*J, B), dma sem
             [, esum (C, 1), dms (C, J), dmsq (J/Q, C)[, rmb (C*J, B),
             dlm (C*J, B)]]
    """
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, pkg_ref, gpt_ref, beta_ref, epsh_ref) = rest[:5]
    if fold:
        nf = 5 if miss else 4
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[5:9]
        mcrow_ref = rest[9] if miss else None
        eps_out, beta_out = rest[5 + nf:7 + nf]
        scr = rest[7 + nf:]
        (rb_sc, rT_sc, bT_sc, dposT_sc, dpos_sc, dlane_sc,
         sem, esum_sc, dms_sc, dmsq_sc) = scr[:10]
    else:
        eps_out, beta_out = rest[5:7]
        (rb_sc, rT_sc, bT_sc, dposT_sc, dpos_sc, dlane_sc,
         sem) = rest[7:]

    r = pl.program_id(0)
    ph = pl.program_id(1)
    jq = pl.program_id(2)
    t = pl.program_id(3)
    f32 = jnp.float32
    F = 5
    JC, NC = _permute_chunks(J, B)
    CW = JC * B
    x_cat, x_mcat, SUB, W, exact = _decoders(xt_refs, Q, TN, packed, fold)
    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    if miss:
        def mc_row():
            # (1, Q*B) per-marker (mean - 3) row of this grid step's
            # blocks (see _make_dots)
            return jnp.concatenate(
                [mcrow_ref[0, pl.ds(jq * Q + q, 1), :]
                 for q in range(Q)], axis=1) - 3.0
    else:
        mc_row = None
    dot_r, dot_a = _make_dots(x_cat, x_mcat, exact, miss, mc_row)


    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))

    @pl.when(first)
    def _init():
        copy = pltpu.make_async_copy(epsh_ref, eps_out, sem)
        copy.start()
        copy.wait()
        if fold:
            esum_sc[...] = esum0_ref[...]

    @pl.when(jnp.logical_and(ph == 0, jnp.logical_and(jq == 0, t == 0)))
    def _zero_r():
        rb_sc[...] = jnp.zeros((C * J, B), f32)

    @pl.when(ph == 0)
    def _accumulate_r():
        acc = None
        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]   # (C, W)
            d = dot_r(eps_t, k)
            acc = d if acc is None else acc + d
        for q in range(Q):
            jj = jq * Q + q
            for c in range(C):
                rb_sc[pl.ds(c * J + jj, 1), :] += acc[c:c + 1,
                                                      q * B:(q + 1) * B]

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(jq == 0, t == 0)))
    def _solve():
        if fold:
            for c in range(C):
                es = esum_sc[c, 0]
                rb_sc[c * J:(c + 1) * J, :] = (
                    rb_sc[c * J:(c + 1) * J, :] * srow_ref[0]
                    - msrow_ref[0] * es)

        for c in range(C):
            for ch in range(NC):
                ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                rows = rb_sc[c * J + ch * JC:c * J + (ch + 1) * JC, :]
                rT_sc[c * B:(c + 1) * B, ch * JC:(ch + 1) * JC] = _tsp(
                    _lane_to_pos(rows, ir_c, B=B, JC=JC), JC)
                brows = beta_ref[0, c * J + ch * JC:c * J + (ch + 1) * JC, :]
                bT_sc[c * B:(c + 1) * B, ch * JC:(ch + 1) * JC] = _tsp(
                    _lane_to_pos(brows, ir_c, B=B, JC=JC), JC)

        def band(sc, s):
            return jnp.concatenate(
                [sc[pl.ds(c * B + s, 1), :] for c in range(C)], axis=0)

        def body(s, _):
            slab = pkg_ref[0, pl.ds(s * F * C, F * C), :]  # (F*C, J)

            def fld(f):
                return slab[f * C:(f + 1) * C, :]           # (C, J)

            invd = fld(0)
            sdv = fld(1)
            z_s = fld(2)
            xsq_j = fld(3)
            okf = fld(4)

            r_jl = band(rT_sc, s)                           # (C, J)
            beta_old = band(bT_sc, s)

            num = r_jl + beta_old * xsq_j
            beta_new = num * invd + sdv * z_s
            d = okf * (beta_new - beta_old)                 # (C, J)

            AT = gpt_ref[0, pl.ds(s * B, B), :]             # (B, J)
            for c in range(C):
                rT_sc[c * B:(c + 1) * B, :] -= AT * d[c:c + 1, :]
                dposT_sc[pl.ds(c * B + s, 1), :] = d[c:c + 1, :]
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)

        for c in range(C):
            for ch in range(NC):
                ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                lo, hi = c * J + ch * JC, c * J + (ch + 1) * JC
                cols = slice(ch * JC, (ch + 1) * JC)
                dpos_c = _tsp(dposT_sc[c * B:(c + 1) * B, cols], B)
                dpos_sc[lo:hi, :] = dpos_c
                dlane_sc[lo:hi, :] = _pos_to_lane(dpos_c, ir_c, B=B, JC=JC)

        beta_out[0] = beta_ref[0] + dlane_sc[...]           # (C*J, B)

        if fold:
            for c in range(C):
                dl = dlane_sc[c * J:(c + 1) * J, :]
                sub1 = jnp.sum(dl * xsum_ref[0], axis=1, keepdims=True)
                esum_sc[c:c + 1, :] -= jnp.sum(sub1, axis=0, keepdims=True)
                dms_c = jnp.sum(dl * msrow_ref[0], axis=1, keepdims=True)
                dms_sc[c:c + 1, :] = _tsp(dms_c, J)
                dlane_sc[c * J:(c + 1) * J, :] = dl * srow_ref[0]
            JQ2 = J // Q
            gmat = (jax.lax.broadcasted_iota(jnp.int32, (JQ2, J), 1) // Q
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (JQ2, J), 0)).astype(f32)
            dmsq_sc[...] = _dot2_vrhs(gmat, dms_sc[...])                 # (J/Q, C)

    @pl.when(ph == 1)
    def _apply_update():
        def catrows(sc):
            rows = []
            for c in range(C):
                rows.append(jnp.concatenate(
                    [sc[pl.ds(c * J + jq * Q + q, 1), :]
                     for q in range(Q)], axis=1))
            return jnp.concatenate(rows, axis=0)            # (C, Q*B)

        dlcat = catrows(dlane_sc)
        if fold:
            dms = _tsp(dmsq_sc[pl.ds(jq, 1), :], 1)         # (C, 1)
        for k in range(SUB):
            upd = dot_a(dlcat, k)
            if fold:
                upd = upd - dms
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def horseshoe_jacobi_t_pallas_mc(XT_pad, gram, xsq_pad, eps, beta_pad,
                                 rho, inner_perm, z_arr,
                                 lam, tau, c2, sigmaE, valid_pad,
                                 *, J: int = 64, tile_n: int = 512,
                                 interpret: bool = False,
                                 x_mean=None, x_scale=None, x_xsum=None,
                                 fold_affine: bool = False, row_valid=None,
                                 missing: bool = False):
    """C-chain fused transposed horseshoe sweep (strided rounds): eps
    (C, N-or-Npad), beta/lam/z (C, Mpad) with z POSITION-indexed in
    canonical slab order, tau/c2/sigmaE (C,).  Returns (eps, beta)."""
    nb, B, _ = gram.shape
    quantized, packed, fold, miss = _validate(nb, J, x_mean, XT_pad,
                                              fold_affine, missing)
    _warn_ablate()
    nr = nb // J
    f32 = jnp.float32
    C = eps.shape[0]
    F = 5

    CG = int(os.environ.get("BAYESR_MC_GROUP", "4"))
    if C > CG:
        if os.environ.get("BAYESR_MC_WIDE", "1") != "0" and C <= 16:
            return horseshoe_jacobi_t_pallas_mc8(
                XT_pad, gram, xsq_pad, eps, beta_pad, rho, inner_perm,
                z_arr, lam, tau, c2, sigmaE, valid_pad, J=J,
                interpret=interpret, x_mean=x_mean, x_scale=x_scale,
                x_xsum=x_xsum, fold_affine=fold_affine,
                row_valid=row_valid, missing=missing)
        eps_parts, beta_parts = [], []
        for c0 in range(0, C, CG):
            sl = slice(c0, min(c0 + CG, C))
            e, b = horseshoe_jacobi_t_pallas_mc(
                XT_pad, gram, xsq_pad, eps[sl], beta_pad[sl], rho,
                inner_perm, z_arr[sl], lam[sl], tau[sl], c2[sl],
                sigmaE[sl], valid_pad, J=J, tile_n=tile_n,
                interpret=interpret, x_mean=x_mean, x_scale=x_scale,
                x_xsum=x_xsum, fold_affine=fold_affine,
                row_valid=row_valid, missing=missing)
            eps_parts.append(e)
            beta_parts.append(b)
        return (jnp.concatenate(eps_parts, axis=0),
                jnp.concatenate(beta_parts, axis=0))

    if packed:
        Npad_ = XT_pad.shape[1] * 16
        best = None
        for q in (4, 2, 1):
            if J % q:
                continue
            tn = _packed_tile_n_mc(Npad_, B, J, F, q, C)
            inv = (J // q) * (Npad_ // tn)
            if best is None or inv < best[0]:
                best = (inv, q)
        Q = best[1]
    else:
        Q = auto_q(J)
    xt, epsC, lane_mask, TN, Npad, N = _prep_x_mc(
        XT_pad, eps, packed=packed, tile_n=tile_n, B=B, J=J, F=F, Q=Q,
        C=C, row_valid=row_valid)
    nt = Npad // TN
    Mpad = beta_pad.shape[1]

    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_hs_mc_strided(xsq_pad, valid_pad, z_arr, lam, tau,
                                    c2, sigmaE, P2, B=B, J=J, nr=nr)
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    beta_lane = (beta_pad.astype(f32).reshape(C, J, nr, B)
                 .transpose(2, 0, 1, 3).reshape(nr, C * J, B))
    rho_i = rho.astype(jnp.int32)

    def im_xt(q):
        def f(r, ph, jq, t, rho_ref):
            return ((jq * Q + q) * nr + rho_ref[r], t)
        return f

    def im_round(r, ph, jq, t, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_full(r, ph, jq, t, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner (flat)
            pl.BlockSpec((1, B * F * C, J), im_round),     # pkgT
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, C * J, B), im_round),         # beta (lane)
            pl.BlockSpec(memory_space=pl.ANY),          # eps (HBM)
        ])
    args = [xt] * Q + [inner_row, pkgT, gpT, beta_lane, epsC]
    scratch = [
        pltpu.VMEM((C * J, B), f32),                       # r rows (lane)
        pltpu.VMEM((C * B, J), f32),                       # rT bands
        pltpu.VMEM((C * B, J), f32),                       # bT bands
        pltpu.VMEM((C * B, J), f32),                       # deltaT bands
        pltpu.VMEM((C * J, B), f32),                       # delta (pos)
        pltpu.VMEM((C * J, B), f32),                       # delta (lane)
        pltpu.SemaphoreType.DMA,                           # eps init copy
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round),    # srow (shared)
                     pl.BlockSpec((1, J, B), im_round),    # msrow
                     pl.BlockSpec((1, J, B), im_round),    # xsum
                     pl.BlockSpec((C, 1), im_full)]        # esum0
        srow_r = _lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr)
        msrow_r = _lane_rows(
            x_mean.astype(f32) * x_scale.astype(f32), B=B, J=J, nr=nr)
        xsum_r = _lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr)
        args += [srow_r, msrow_r, xsum_r,
                 jnp.sum(epsC, axis=1, keepdims=True)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]
            args += [_lane_rows(x_mean.astype(f32), B=B, J=J, nr=nr)]
        scratch += [pltpu.VMEM((C, 1), f32),
                    pltpu.VMEM((C, J), f32),
                    pltpu.VMEM((J // Q, C), f32)]
    out_specs = [
        pl.BlockSpec((C, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, C * J, B), im_round),             # beta_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((C, Npad), f32),
        jax.ShapeDtypeStruct((nr, C * J, B), f32),
    ]
    kernel = functools.partial(_hs_jacobi_t_mc_kernel, B=B, TN=TN, C=C,
                               J=J, Q=Q, packed=packed, fold=fold,
                               miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, J // Q, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_i, *args)

    if fold:
        eps_o = eps_o * lane_mask
    beta_flat = (beta_o.reshape(nr, C, J, B).transpose(1, 2, 0, 3)
                 .reshape(C, Mpad))
    return ((eps_o if packed else eps_o[:, :N]).astype(eps.dtype),
            beta_flat.astype(beta_pad.dtype))


# ------------------------------------------------- sharded chunked driver

class StridedOperands:
    """Per-iteration operands of the transposed strided sweep, built once
    and shared by every chunk call (see bayesr_jacobi_t_rounds)."""

    def __init__(self, *, inner_row, pkgT, gpT, gas_lane, beta_lane,
                 labels_lane, srow=None, msrow=None, xsum=None,
                 mcrow=None):
        self.inner_row = inner_row
        self.pkgT = pkgT
        self.gpT = gpT
        self.gas_lane = gas_lane
        self.beta_lane = beta_lane
        self.labels_lane = labels_lane
        self.srow, self.msrow, self.xsum = srow, msrow, xsum
        self.mcrow = mcrow


def build_strided_operands(gram, xsq_pad, g_assign_pad, valid_pad, p_arr,
                           z_arr, pi, cva, sigmaE, sigmaGG, beta_pad,
                           labels_pad, inner_perm, *, B, J,
                           x_mean=None, x_scale=None, x_xsum=None,
                           fold=False, missing=False):
    """All per-iteration operands for the transposed strided sweep in
    canonical slab order (gather-free; see the module docstring)."""
    f32 = jnp.float32
    nb = gram.shape[0]
    nr = nb // J
    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_strided(xsq_pad, g_assign_pad, valid_pad, p_arr,
                              z_arr, pi, cva, sigmaE, sigmaGG, P2,
                              B=B, J=J, nr=nr)
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    kw = {}
    if fold or missing:
        kw = dict(
            srow=_lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr),
            msrow=_lane_rows(x_mean.astype(f32) * x_scale.astype(f32),
                             B=B, J=J, nr=nr),
            xsum=_lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr))
        if missing:
            kw["mcrow"] = _lane_rows(x_mean.astype(f32), B=B, J=J,
                                     nr=nr)
    return StridedOperands(
        inner_row=inner_row, pkgT=pkgT, gpT=gpT,
        gas_lane=_lane_rows(g_assign_pad.astype(jnp.int32), B=B, J=J,
                            nr=nr),
        beta_lane=_lane_rows(beta_pad.astype(f32), B=B, J=J, nr=nr),
        labels_lane=_lane_rows(labels_pad.astype(jnp.int32), B=B, J=J,
                               nr=nr), **kw)


def bayesr_jacobi_t_rounds(XT_pad, ops, rho_chunk, eps2d, sigmaE, *,
                           J, B, K, G, nr_total, packed, fold,
                           tile_n=512, row_valid=None,
                           interpret=False, missing=False,
                           visit_out=True):
    """Sweep ONE CHUNK of strided rounds (the sharded (m, 1) driver's
    unit of work: one cross-slice eps psum per chunk).  ``ops`` holds the
    full-iteration operands (build_strided_operands); ``rho_chunk`` the
    GLOBAL round ids this call visits.  Outputs beta/kv slabs arrive in
    VISIT order (scatter back with ``.at[rho_chunk].set`` -- a
    slab-granular update, not an element scatter) unless
    ``visit_out=False``: then the rho-indexed output maps land slabs in
    CANONICAL round order directly (the Dm == 1 all-rounds-in-one-call
    case, where the host-side permutation scatter was pure overhead).

    Returns (eps2d, beta_slabs (nrc, J, B), kv_slabs (nrc, J, B),
    v (1, G*K), bacc (1, G))."""
    f32 = jnp.float32
    F = 3 * K + 4
    Q = auto_q(J)
    miss = bool(missing)
    fold = bool(fold) or miss
    _warn_ablate()
    nrc = rho_chunk.shape[0]
    if packed:
        Npad = XT_pad.shape[1] * 16
        TN = _packed_tile_n_t(Npad, B, J, F, Q)
    else:
        Npad = eps2d.shape[1]
        TN = min(tile_n, max(128, 1 << (Npad - 1).bit_length()))
        TN = min(TN, Npad)
        if Npad % TN:
            TN = Npad          # whole-row tile when N is not tileable
    nt = Npad // TN

    def im_xt(q):
        def f(r, ph, jq, t, rho_ref):
            return ((jq * Q + q) * nr_total + rho_ref[r], t)
        return f

    def im_round(r, ph, jq, t, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_visit(r, ph, jq, t, rho_ref):
        return (r, 0, 0)

    def im_full(r, ph, jq, t, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),
            pl.BlockSpec((1, B * F, J), im_round),
            pl.BlockSpec((1, B * B, J), im_round),
            pl.BlockSpec((1, J, B), im_round),             # gas
            pl.BlockSpec((1, J, B), im_round),             # beta
            pl.BlockSpec((1, Npad), im_full),              # eps
            pl.BlockSpec(memory_space=pltpu.SMEM),         # sigmaE
        ])
    args = [XT_pad] * Q + [ops.inner_row, ops.pkgT, ops.gpT,
                           ops.gas_lane, ops.beta_lane, eps2d,
                           sigmaE.astype(f32).reshape(1)]
    scratch = [
        pltpu.VMEM((J, B), f32), pltpu.VMEM((B, J), f32),
        pltpu.VMEM((B, J), f32), pltpu.VMEM((B, J), f32),
        pltpu.VMEM((B, J), f32), pltpu.VMEM((J, B), f32),
        pltpu.VMEM((J, B), f32),
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round)] * 3 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [ops.srow, ops.msrow, ops.xsum, jnp.sum(eps2d, axis=1)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]
            args += [ops.mcrow]
        scratch += [pltpu.VMEM((1 + J, 1), f32)]
    im_bkv = im_visit if visit_out else im_round
    out_specs = [
        pl.BlockSpec((1, Npad), im_full),
        pl.BlockSpec((1, J, B), im_bkv),                   # beta
        pl.BlockSpec((1, J, B), im_bkv),                   # kv
        pl.BlockSpec((1, G * K), im_full),
        pl.BlockSpec((1, G), im_full),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), f32),
        jax.ShapeDtypeStruct((nrc, J, B), f32),
        jax.ShapeDtypeStruct((nrc, J, B), f32),
        jax.ShapeDtypeStruct((1, G * K), f32),
        jax.ShapeDtypeStruct((1, G), f32),
    ]
    kernel = functools.partial(_jacobi_t_kernel, B=B, TN=TN, K=K, G=G,
                               J=J, Q=Q, packed=packed, fold=fold,
                               miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrc, 2, J // Q, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_chunk.astype(jnp.int32), *args)


class StridedOperandsMC:
    """Per-iteration operands of the fused multi-chain transposed sweep
    (the sharded run_chains unit; see bayesr_jacobi_t_mc_rounds)."""

    def __init__(self, *, inner_row, pkgT, gpT, gas_lane, beta_lane, hse,
                 srow=None, msrow=None, xsum=None, mcrow=None):
        self.inner_row = inner_row
        self.pkgT = pkgT
        self.gpT = gpT
        self.gas_lane = gas_lane
        self.beta_lane = beta_lane
        self.hse = hse
        self.srow, self.msrow, self.xsum = srow, msrow, xsum
        self.mcrow = mcrow


def build_strided_operands_mc(gram, xsq_pad, g_assign_pad, valid_pad,
                              p_arr, z_arr, pi, cva, sigmaE, sigmaGG,
                              beta_pad, inner_perm, *, B, J,
                              x_mean=None, x_scale=None, x_xsum=None,
                              fold=False, missing=False):
    """Multi-chain analog of build_strided_operands: p/z/beta carry a
    leading chain axis (C, Mpad), pi (C, G, K), sigmaE (C,), sigmaGG
    (C, G); X/gram/permutations shared across chains."""
    f32 = jnp.float32
    nb = gram.shape[0]
    nr = nb // J
    C = beta_pad.shape[0]
    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_mc_strided(xsq_pad, g_assign_pad, valid_pad, p_arr,
                                 z_arr, pi, cva, sigmaE, sigmaGG, P2,
                                 B=B, J=J, nr=nr)
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    beta_lane = (beta_pad.astype(f32).reshape(C, J, nr, B)
                 .transpose(2, 0, 1, 3).reshape(nr, C * J, B))
    kw = {}
    if fold or missing:
        kw = dict(
            srow=_lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr),
            msrow=_lane_rows(x_mean.astype(f32) * x_scale.astype(f32),
                             B=B, J=J, nr=nr),
            xsum=_lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr))
        if missing:
            kw["mcrow"] = _lane_rows(x_mean.astype(f32), B=B, J=J,
                                     nr=nr)
    return StridedOperandsMC(
        inner_row=inner_row, pkgT=pkgT, gpT=gpT,
        gas_lane=_lane_rows(g_assign_pad.astype(jnp.int32), B=B, J=J,
                            nr=nr),
        beta_lane=beta_lane,
        hse=(0.5 / sigmaE.astype(f32)).reshape(C, 1), **kw)


def bayesr_jacobi_t_mc_rounds(XT_pad, ops, rho_chunk, epsC, *, J, B, K, G,
                              C, nr_total, packed, fold, missing=False,
                              tile_n=512, interpret=False):
    """Sweep ONE CHUNK of strided rounds for C FUSED chains -- the
    sharded run_chains unit of work (one cross-slice (C, Npad) eps psum
    per chunk; X streamed once per chunk for ALL chains).  ``ops`` holds
    the full-iteration operands (build_strided_operands_mc); beta/kv
    output slabs arrive in VISIT order.  Reference gap this closes at
    pod scale: one chain per R process (src/BayesRv2.cpp:171).

    Returns (epsC (C, Npad), beta_slabs (nrc, C*J, B), kv_slabs
    (nrc, C*J, B), v (C, G*K), bacc (C, G))."""
    f32 = jnp.float32
    miss = bool(missing)
    fold = bool(fold) or miss
    _warn_ablate()
    F = 3 * K + 4
    nrc = rho_chunk.shape[0]
    if packed:
        Npad = XT_pad.shape[1] * 16
        best = None
        for q in (4, 2, 1):
            if J % q:
                continue
            tn = _packed_tile_n_mc(Npad, B, J, F, q, C)
            inv = (J // q) * (Npad // tn)
            if best is None or inv < best[0]:
                best = (inv, q, tn)
        _, Q, TN = best
    else:
        Q = auto_q(J)
        Npad = epsC.shape[1]
        TN = min(tile_n, max(128, 1 << (Npad - 1).bit_length()))
        TN = min(TN, Npad)
        if Npad % TN:
            TN = Npad
    nt = Npad // TN

    def im_xt(q):
        def f(r, ph, jq, t, rho_ref):
            return ((jq * Q + q) * nr_total + rho_ref[r], t)
        return f

    def im_round(r, ph, jq, t, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_visit(r, ph, jq, t, rho_ref):
        return (r, 0, 0)

    def im_full(r, ph, jq, t, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),
            pl.BlockSpec((1, B * F * C, J), im_round),     # pkgT
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, J, B), im_round),             # gas (shared)
            pl.BlockSpec((1, C * J, B), im_round),         # beta (lane)
            pl.BlockSpec((C, 1), im_full),                 # 0.5/sigmaE
            pl.BlockSpec(memory_space=pl.ANY),             # eps (HBM)
        ])
    args = [XT_pad] * Q + [ops.inner_row, ops.pkgT, ops.gpT,
                           ops.gas_lane, ops.beta_lane, ops.hse,
                           epsC.astype(f32)]
    scratch = [
        pltpu.VMEM((C * J, B), f32), pltpu.VMEM((C * B, J), f32),
        pltpu.VMEM((C * B, J), f32), pltpu.VMEM((C * B, J), f32),
        pltpu.VMEM((C * B, J), f32), pltpu.VMEM((C * J, B), f32),
        pltpu.VMEM((C * J, B), f32),
        pltpu.SemaphoreType.DMA,
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round)] * 3 + [
            pl.BlockSpec((C, 1), im_full)]
        args += [ops.srow, ops.msrow, ops.xsum,
                 jnp.sum(epsC.astype(f32), axis=1, keepdims=True)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]
            args += [ops.mcrow]
        scratch += [pltpu.VMEM((C, 1), f32),
                    pltpu.VMEM((C, J), f32),
                    pltpu.VMEM((J // Q, C), f32)]
    out_specs = [
        pl.BlockSpec((C, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, C * J, B), im_visit),             # beta (visit)
        pl.BlockSpec((1, C * J, B), im_visit),             # kv (visit)
        pl.BlockSpec((C, G * K), im_full),
        pl.BlockSpec((C, G), im_full),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((C, Npad), f32),
        jax.ShapeDtypeStruct((nrc, C * J, B), f32),
        jax.ShapeDtypeStruct((nrc, C * J, B), f32),
        jax.ShapeDtypeStruct((C, G * K), f32),
        jax.ShapeDtypeStruct((C, G), f32),
    ]
    kernel = functools.partial(_jacobi_t_mc_kernel, B=B, TN=TN, K=K, G=G,
                               C=C, J=J, Q=Q, packed=packed, fold=fold,
                               miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrc, 2, J // Q, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_chunk.astype(jnp.int32), *args)


# ------------------------------------------ wide multi-chain (one stream)

def _jacobi_t_mc8_kernel(rho_ref, *refs, B, TN, K, G, C, CGS, J, Q, nt,
                         packed=False, fold=False, miss=False):
    """Wide multi-chain transposed Jacobi kernel: ALL C chains (e.g. 8)
    share ONE X stream AND one decode per iteration.  VMEM fits because
    (a) eps lives in HBM (ANY) and is tiled through a (C, TN) VMEM
    scratch by explicit in-kernel DMA -- grid is (nr, 2, nt, J/Q) with
    t OUTER and jq INNER, so each tile is loaded once per (phase, tile),
    accumulates all J block updates in phase 1, and is stored back once
    -- and (b) the
    per-chain solve operands (pkgT / beta bands) live in ANY memory and
    are DMA'd per solve group of CGS chains (the serial solve batches
    (CGS, J) instead of (C, J); its ~1 ms cost scales by C/CGS while the
    dominant stream+decode is paid ONCE for all chains).

    refs layout:
    inputs:  xt_0..xt_{Q-1}, inner_row, gpT, gas_lane, hse (C, 1),
             eps_hbm (ANY), pkg_any (ANY), beta_lane ((1, C*J, B) block)
             [, srow, msrow, xsum, esum0 (C, 1)[, mcrow]]
    outputs: eps_out (ANY, (C, Npad)), beta_out ((1, C*J, B) block),
             klane_out ((1, C*J, B) block), v_out (C, G*K),
             bacc_out (C, G)
    scratch: rb (C*J, B), dpos (C*J, B), dlane (C*J, B),
             pkg_sc (B*F*CGS, J), rT (CGS*B, J), bT (CGS*B, J),
             dposT (CGS*B, J), krecT (CGS*B, J), eps_sc (C, TN),
             sem, sem3
             [, esum (C, 1), dms (C, J), dmsq (J/Q, C)[, rmb (C*J, B),
             dlm (C*J, B)]]

    Only pkgT streams via explicit DMA (its lane dim is J = 128-aligned;
    the 32-lane beta/kv bands cannot be DMA-sliced under the (1, 128)
    VMEM tiling, so they ride ordinary pipelined block specs).
    """
    ng = C // CGS
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, gpt_ref, gasl_ref, hse_ref, epsh_ref, pkg_ref,
     beta_ref) = rest[:7]
    if fold:
        nf = 5 if miss else 4
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[7:11]
        mcrow_ref = rest[11] if miss else None
        outs = rest[7 + nf:12 + nf]
        scr = rest[12 + nf:]
    else:
        outs = rest[7:12]
        scr = rest[12:]
    eps_out, betao_ref, klaneo_ref, v_out, bacc_out = outs
    (rb_sc, dpos_sc, dlane_sc, pkg_sc,
     rT_sc, bT_sc, dposT_sc, krecT_sc, eps_sc, sem,
     sem3) = scr[:11]
    if fold:
        esum_sc, dms_sc, dmsq_sc = scr[11:14]

    r = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    jq = pl.program_id(3)
    f32 = jnp.float32
    F = 3 * K + 4
    JC, NC = _permute_chunks(J, B)
    CW = JC * B
    x_cat, x_mcat, SUB, W, exact = _decoders(xt_refs, Q, TN, packed, fold)
    if miss:
        def mc_row():
            # (1, Q*B) per-marker (mean - 3) row of this grid step's
            # blocks (see _make_dots)
            return jnp.concatenate(
                [mcrow_ref[0, pl.ds(jq * Q + q, 1), :]
                 for q in range(Q)], axis=1) - 3.0
    else:
        mc_row = None
    dot_r, dot_a = _make_dots(x_cat, x_mcat, exact, miss, mc_row)

    rho_r = rho_ref[r]
    JQ_LAST = J // Q - 1

    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(t == 0, jq == 0)))

    @pl.when(first)
    def _init():
        cp0 = pltpu.make_async_copy(epsh_ref, eps_out, sem3)
        cp0.start()
        cp0.wait()
        v_out[...] = jnp.zeros_like(v_out)
        bacc_out[...] = jnp.zeros_like(bacc_out)
        if fold:
            esum_sc[...] = esum0_ref[...]

    @pl.when(jq == 0)
    def _load_tile():
        # eps rides HBM as (SUB, C, NW) plane-major (genotypes._lane_perm):
        # one strided DMA loads tile t's (SUB, C, W) block, each bit-plane
        # k a contiguous (C, W) page of the scratch
        cp = pltpu.make_async_copy(
            eps_out.at[:, :, pl.ds(t * W, W)], eps_sc, sem3)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(ph == 0, jnp.logical_and(t == 0, jq == 0)))
    def _zero_r():
        rb_sc[...] = jnp.zeros((C * J, B), f32)

    @pl.when(ph == 0)
    def _accumulate_r():
        acc = None
        for k in range(SUB):
            eps_t = eps_sc[k]                               # (C, W)
            d = dot_r(eps_t, k)
            acc = d if acc is None else acc + d
        for q in range(Q):
            jj = jq * Q + q
            for c in range(C):
                rb_sc[pl.ds(c * J + jj, 1), :] += acc[c:c + 1,
                                                      q * B:(q + 1) * B]

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(t == 0, jq == 0)))
    def _solve():
        if fold:
            for c in range(C):
                es = esum_sc[c, 0]
                rb_sc[c * J:(c + 1) * J, :] = (
                    rb_sc[c * J:(c + 1) * J, :] * srow_ref[0]
                    - msrow_ref[0] * es)

        hse = hse_ref[...]                                  # (C, 1)
        Kf = jnp.float32(K)
        for gg in range(ng):
            # stream this group's per-chain solve table from HBM
            cp = pltpu.make_async_copy(pkg_ref.at[rho_r, gg], pkg_sc, sem)
            cp.start()
            cp.wait()

            for cl in range(CGS):
                c = gg * CGS + cl
                for ch in range(NC):
                    ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                    rows = rb_sc[c * J + ch * JC:c * J + (ch + 1) * JC, :]
                    rT_sc[cl * B:(cl + 1) * B,
                          ch * JC:(ch + 1) * JC] = _tsp(
                        _lane_to_pos(rows, ir_c, B=B, JC=JC), JC)
                    brows = beta_ref[0, c * J + ch * JC:
                                     c * J + (ch + 1) * JC, :]
                    bT_sc[cl * B:(cl + 1) * B,
                          ch * JC:(ch + 1) * JC] = _tsp(
                        _lane_to_pos(brows, ir_c, B=B, JC=JC), JC)

            hse_g = jnp.concatenate(
                [hse[gg * CGS + cl:gg * CGS + cl + 1, :]
                 for cl in range(CGS)], axis=0)             # (CGS, 1)

            def band(sc, s):
                return jnp.concatenate(
                    [sc[pl.ds(cl * B + s, 1), :] for cl in range(CGS)],
                    axis=0)                                 # (CGS, J)

            def body(s, _):
                slab = pkg_sc[pl.ds(s * F * CGS, F * CGS), :]

                def fld(f):
                    return slab[f * CGS:(f + 1) * CGS, :]   # (CGS, J)

                lp = [fld(k) for k in range(K)]
                invd = [fld(K + k) for k in range(K)]
                sd = [fld(2 * K + k) for k in range(K)]
                p_s = fld(3 * K)
                z_s = fld(3 * K + 1)
                xsq_j = fld(3 * K + 2)
                okf = fld(3 * K + 3)

                r_jl = band(rT_sc, s)                       # (CGS, J)
                beta_old = band(bT_sc, s)
                num = r_jl + beta_old * xsq_j
                muk = [num * invd[k] for k in range(K)]
                logL = [lp[k] + (hse_g * num) * muk[k] for k in range(K)]

                k_sel = jnp.full((CGS, J), Kf, f32)
                acum = jnp.zeros((CGS, J), f32)
                for k in range(K):
                    lk = logL[k]
                    g = jnp.abs(logL[1] - lk)
                    for kk in range(2, K):
                        g = jnp.maximum(g, jnp.abs(logL[kk] - lk))
                    guard = g > 700.0
                    Ssum = jnp.exp(logL[0] - lk)
                    for kk in range(1, K):
                        Ssum = Ssum + jnp.exp(logL[kk] - lk)
                    w = jnp.where(guard, jnp.zeros((CGS, J), f32),
                                  1.0 / Ssum)
                    acum = acum + w
                    hit = jnp.logical_and(p_s <= acum, k_sel == Kf)
                    k_sel = jnp.where(hit, jnp.float32(k), k_sel)
                hitm = k_sel < Kf

                mu_sel = jnp.zeros((CGS, J), f32)
                sd_sel = jnp.zeros((CGS, J), f32)
                for k in range(K):
                    selk = (k_sel == jnp.float32(k)).astype(f32)
                    mu_sel = mu_sel + muk[k] * selk
                    sd_sel = sd_sel + sd[k] * selk
                beta_new = jnp.where(hitm, mu_sel + sd_sel * z_s, beta_old)
                d = okf * (beta_new - beta_old)             # (CGS, J)

                AT = gpt_ref[0, pl.ds(s * B, B), :]         # (B, J)
                kv = jnp.where(okf * hitm.astype(f32) > 0, k_sel,
                               jnp.float32(-1.0))
                for cl in range(CGS):
                    rT_sc[cl * B:(cl + 1) * B, :] -= AT * d[cl:cl + 1, :]
                    dposT_sc[pl.ds(cl * B + s, 1), :] = d[cl:cl + 1, :]
                    krecT_sc[pl.ds(cl * B + s, 1), :] = kv[cl:cl + 1, :]
                return ()

            lax.fori_loop(0, B, body, (), unroll=False)

            gas_r = gasl_ref[0]                             # (J, B) shared
            for cl in range(CGS):
                c = gg * CGS + cl
                for ch in range(NC):
                    ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                    cols = slice(ch * JC, (ch + 1) * JC)
                    dpos_c = _tsp(dposT_sc[cl * B:(cl + 1) * B, cols], B)
                    dpos_sc[c * J + ch * JC:c * J + (ch + 1) * JC,
                            :] = dpos_c
                    dlane_sc[c * J + ch * JC:c * J + (ch + 1) * JC,
                             :] = _pos_to_lane(dpos_c, ir_c, B=B, JC=JC)
                    kpos_c = _tsp(krecT_sc[cl * B:(cl + 1) * B, cols], B)
                    klaneo_ref[0, c * J + ch * JC:c * J + (ch + 1) * JC,
                               :] = _pos_to_lane(kpos_c, ir_c, B=B, JC=JC)

                dl = dlane_sc[c * J:(c + 1) * J, :]         # (J, B)
                bn = beta_ref[0, c * J:(c + 1) * J, :] + dl
                betao_ref[0, c * J:(c + 1) * J, :] = bn
                kl = klaneo_ref[0, c * J:(c + 1) * J, :]
                slab2 = jnp.where(kl > 0.0, bn * bn, 0.0)
                vcols = []
                bcols = []
                for g in range(G):
                    gm = (gas_r == g).astype(f32)
                    for k in range(K):
                        km = (kl == jnp.float32(k)).astype(f32)
                        s1 = jnp.sum(km * gm, axis=1, keepdims=True)
                        vcols.append(jnp.sum(s1, axis=0, keepdims=True))
                    sb = jnp.sum(slab2 * gm, axis=1, keepdims=True)
                    bcols.append(jnp.sum(sb, axis=0, keepdims=True))
                v_out[c:c + 1, :] += jnp.concatenate(vcols, axis=1)
                bacc_out[c:c + 1, :] += jnp.concatenate(bcols, axis=1)

                if fold:
                    sub1 = jnp.sum(dl * xsum_ref[0], axis=1, keepdims=True)
                    esum_sc[c:c + 1, :] -= jnp.sum(sub1, axis=0,
                                                   keepdims=True)
                    dms_c = jnp.sum(dl * msrow_ref[0], axis=1,
                                    keepdims=True)
                    dms_sc[c:c + 1, :] = _tsp(dms_c, J)
                    dlane_sc[c * J:(c + 1) * J, :] = dl * srow_ref[0]

        if fold:
            JQ2 = J // Q
            gmat = (jax.lax.broadcasted_iota(jnp.int32, (JQ2, J), 1) // Q
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (JQ2, J), 0)).astype(f32)
            dmsq_sc[...] = _dot2_vrhs(gmat, dms_sc[...])                 # (J/Q, C)

    @pl.when(ph == 1)
    def _apply_update():
        def catrows(sc):
            rows = []
            for c in range(C):
                rows.append(jnp.concatenate(
                    [sc[pl.ds(c * J + jq * Q + q, 1), :]
                     for q in range(Q)], axis=1))
            return jnp.concatenate(rows, axis=0)            # (C, Q*B)

        dlcat = catrows(dlane_sc)
        if fold:
            dms = _tsp(dmsq_sc[pl.ds(jq, 1), :], 1)         # (C, 1)
        for k in range(SUB):
            upd = dot_a(dlcat, k)
            if fold:
                upd = upd - dms
            eps_sc[k, :, :] -= upd

        @pl.when(jq == JQ_LAST)
        def _store_tile():
            cp = pltpu.make_async_copy(
                eps_sc, eps_out.at[:, :, pl.ds(t * W, W)], sem3)
            cp.start()
            cp.wait()


def _mc8_plan_q_tn(Npad, B, J, F, C, CGS, packed):
    """Jointly pick (Q, TN) minimizing grid invocations under the wide
    kernel's VMEM model: a wider per-step dot (Q blocks fused) divides
    the jq axis, a larger N-tile divides the t axis -- both axes
    multiply into the invocation count that dominated the first mc8
    measurement (55k invocations/iter at Q=4, TN=14336)."""
    best = None
    for q in (16, 8, 4, 2, 1):
        if J % q:
            continue
        tn = _mc8_tile_n(Npad, B, J, F, q, C, CGS, False, packed)
        inv = (J // q) * (Npad // tn)
        if best is None or inv < best[0]:
            best = (inv, q, tn)
    return best[1], best[2]


def _mc8_tile_n(Npad, B, J, F, Q, C, CGS, miss, packed):
    """Largest N-tile under the wide-mc kernel's VMEM model."""
    cap_mb = float(os.environ.get("BAYESR_VMEM_CAP_MB", "13"))
    budget = int(cap_mb * 2 ** 20)
    lanes = max(J, 128)
    budget -= 2 * (B * B * lanes * 4)                   # gpT dbl
    budget -= B * F * CGS * lanes * 4                   # pkg scratch
    budget -= 3 * 2 * (C * J * 128 * 4)                 # beta in+2 outs dbl
    budget -= 3 * (C * J * 128 * 4)                     # full-C scratches
    budget -= 4 * (CGS * B * lanes * 4)                 # rT/bT/dposT/krecT
    budget -= 2 * 6 * (J * 128 * 4)                     # row operands
    budget -= int(0.5 * 2 ** 20)
    xb = (B // 4) if packed else (B * 4)                # X bytes per TN unit
    per_tn = C * 4 + Q * 2 * xb                         # eps tile + X
    nt_total = Npad // 2048
    kmax = max(1, budget // (per_tn * 2048))
    for k in range(min(nt_total, kmax), 0, -1):
        if nt_total % k == 0:
            return 2048 * k
    return 2048


def bayesr_jacobi_t_pallas_mc8(XT_pad, gram, xsq_pad, eps, beta_pad,
                               labels_pad, rho, inner_perm, p_arr, z_arr,
                               pi, cva, sigmaE, sigmaGG, g_assign_pad,
                               valid_pad, *, J: int = 64,
                               interpret: bool = False,
                               x_mean=None, x_scale=None, x_xsum=None,
                               fold_affine: bool = False, row_valid=None,
                               missing: bool = False):
    """Wide fused multi-chain sweep: same contract as
    bayesr_jacobi_t_pallas_mc but ALL C chains run in ONE kernel call
    sharing one X stream and one decode (see _jacobi_t_mc8_kernel).
    Requires C % CGS == 0 (CGS = solve chain-group, default 4)."""
    from .pallas_multichain import MCSweepResult

    nb, B, _ = gram.shape
    quantized, packed, fold, miss = _validate(nb, J, x_mean, XT_pad,
                                              fold_affine, missing)
    _warn_ablate()
    nr = nb // J
    f32 = jnp.float32
    C = eps.shape[0]
    G, K = pi.shape[1], pi.shape[2]
    F = 3 * K + 4
    CGS = int(os.environ.get("BAYESR_MC8_SOLVE_GROUP", "4"))
    CGS = min(CGS, C)
    while C % CGS:
        CGS -= 1
    ng = C // CGS

    if packed:
        Mpad_x, Nw = XT_pad.shape
        Npad = Nw * 16
        if Npad % 2048 or eps.shape[1] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        Q, TN = _mc8_plan_q_tn(Npad, B, J, F, C, CGS, True)
        xt = XT_pad
        epsC = eps.astype(f32)
        lane_mask = row_valid.astype(f32).reshape(1, Npad)
        SUBk = 16
    else:
        Q = auto_q(J)
        Mpad_x, N0 = XT_pad.shape
        TN = min(512, max(128, 1 << (N0 - 1).bit_length()))
        Npad = -(-N0 // TN) * TN
        epsC = jnp.zeros((C, Npad), f32).at[:, :N0].set(eps.astype(f32))
        xt = (XT_pad if Npad == N0
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N0))))
        lane_mask = (jnp.arange(Npad) < N0).astype(f32).reshape(1, Npad)
        SUBk = 1
    nt = Npad // TN
    # eps travels to/from the kernel as a (SUB, C, NW) plane-major view
    # (each bit-plane a contiguous page; one strided DMA per N-tile) -- a
    # 3 MB-class transpose per sweep call, invisible next to the X stream
    eps3 = epsC.reshape(C, SUBk, Npad // SUBk).transpose(1, 0, 2)
    Mpad = beta_pad.shape[1]

    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_mc_strided(xsq_pad, g_assign_pad, valid_pad, p_arr,
                                 z_arr, pi, cva, sigmaE, sigmaGG, P2,
                                 B=B, J=J, nr=nr)
    # regroup rows (s*F + f)*C + c -> (gg, (s*F + f)*CGS + cl) for the
    # per-solve-group DMA bands
    pkgG = (pkgT.reshape(nr, B * F, ng, CGS, J)
            .transpose(0, 2, 1, 3, 4).reshape(nr, ng, B * F * CGS, J))
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    beta_lane = (beta_pad.astype(f32).reshape(C, J, nr, B)
                 .transpose(2, 0, 1, 3).reshape(nr, C * J, B))
    gas_lane = _lane_rows(g_assign_pad.astype(jnp.int32), B=B, J=J, nr=nr)
    hse2 = (0.5 / sigmaE.astype(f32)).reshape(C, 1)
    rho_i = rho.astype(jnp.int32)

    def im_xt(q):
        def f(r, ph, t, jq, rho_ref):
            return ((jq * Q + q) * nr + rho_ref[r], t)
        return f

    def im_round(r, ph, t, jq, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_full(r, ph, t, jq, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, J, B), im_round),             # gas
            pl.BlockSpec((C, 1), im_full),                 # 0.5/sigmaE
            pl.BlockSpec(memory_space=pl.ANY),             # eps (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # pkg (HBM)
            pl.BlockSpec((1, C * J, B), im_round),         # beta (lane)
        ])
    args = [xt] * Q + [inner_row, gpT, gas_lane, hse2, eps3, pkgG,
                       beta_lane]
    scratch = [
        pltpu.VMEM((C * J, B), f32),                       # rb
        pltpu.VMEM((C * J, B), f32),                       # dpos
        pltpu.VMEM((C * J, B), f32),                       # dlane
        pltpu.VMEM((B * F * CGS, J), f32),                 # pkg band
        pltpu.VMEM((CGS * B, J), f32),                     # rT
        pltpu.VMEM((CGS * B, J), f32),                     # bT
        pltpu.VMEM((CGS * B, J), f32),                     # dposT
        pltpu.VMEM((CGS * B, J), f32),                     # krecT
        pltpu.VMEM((SUBk, C, TN // SUBk), f32),            # eps tile
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round)] * 3 + [
            pl.BlockSpec((C, 1), im_full)]
        srow_r = _lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr)
        msrow_r = _lane_rows(
            x_mean.astype(f32) * x_scale.astype(f32), B=B, J=J, nr=nr)
        xsum_r = _lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr)
        args += [srow_r, msrow_r, xsum_r,
                 jnp.sum(epsC, axis=1, keepdims=True)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]
            args += [_lane_rows(x_mean.astype(f32), B=B, J=J, nr=nr)]
        scratch += [pltpu.VMEM((C, 1), f32),               # esum
                    pltpu.VMEM((C, J), f32),               # dms
                    pltpu.VMEM((J // Q, C), f32)]          # dmsq
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                 # eps (HBM)
        pl.BlockSpec((1, C * J, B), im_round),             # beta_out
        pl.BlockSpec((1, C * J, B), im_round),             # klane_out
        pl.BlockSpec((C, G * K), im_full),
        pl.BlockSpec((C, G), im_full),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((SUBk, C, Npad // SUBk), f32),
        jax.ShapeDtypeStruct((nr, C * J, B), f32),
        jax.ShapeDtypeStruct((nr, C * J, B), f32),
        jax.ShapeDtypeStruct((C, G * K), f32),
        jax.ShapeDtypeStruct((C, G), f32),
    ]
    kernel = functools.partial(_jacobi_t_mc8_kernel, B=B, TN=TN, K=K, G=G,
                               C=C, CGS=CGS, J=J, Q=Q, nt=nt,
                               packed=packed, fold=fold, miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, nt, J // Q),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o, kl_o, v_o, bacc_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_i, *args)

    eps_o = eps_o.transpose(1, 0, 2).reshape(C, -1)        # plane-major back
    if fold:
        eps_o = eps_o * lane_mask
    beta_flat = (beta_o.reshape(nr, C, J, B).transpose(1, 2, 0, 3)
                 .reshape(C, Mpad))
    kv_flat = (kl_o.reshape(nr, C, J, B).transpose(1, 2, 0, 3)
               .reshape(C, Mpad))
    labels_flat = jnp.where(kv_flat >= 0.0, kv_flat.astype(jnp.int32),
                            labels_pad.astype(jnp.int32))
    return MCSweepResult(
        eps=(eps_o if packed else eps_o[:, :eps.shape[1]]).astype(eps.dtype),
        beta=beta_flat.astype(beta_pad.dtype),
        labels=labels_flat,
        v=v_o.reshape(C, G, K).astype(eps.dtype),
        beta_acum=bacc_o.astype(eps.dtype),
    )


def _hs_jacobi_t_mc8_kernel(rho_ref, *refs, B, TN, C, CGS, J, Q, nt,
                            packed=False, fold=False, miss=False):
    """Wide multi-chain transposed horseshoe kernel: _jacobi_t_mc8_kernel
    minus the selection loop and label/v/bacc outputs (same eps-via-DMA
    tiling and per-group pkg streaming).  refs layout:

    inputs:  xt_0..xt_{Q-1}, inner_row, gpT, eps_hbm (ANY),
             pkg_any (ANY), beta_lane ((1, C*J, B) block)
             [, srow, msrow, xsum, esum0 (C, 1)[, mcrow]]
    outputs: eps_out (ANY, (C, Npad)), beta_out ((1, C*J, B) block)
    scratch: rb (C*J, B), dpos (C*J, B), dlane (C*J, B),
             pkg_sc (B*5*CGS, J), rT (CGS*B, J), bT (CGS*B, J),
             dposT (CGS*B, J), eps_sc (C, TN), sem, sem3
             [, esum (C, 1), dms (C, J), dmsq (J/Q, C)[, rmb (C*J, B),
             dlm (C*J, B)]]
    """
    ng = C // CGS
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, gpt_ref, epsh_ref, pkg_ref, beta_ref) = rest[:5]
    if fold:
        nf = 5 if miss else 4
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[5:9]
        mcrow_ref = rest[9] if miss else None
        outs = rest[5 + nf:7 + nf]
        scr = rest[7 + nf:]
    else:
        outs = rest[5:7]
        scr = rest[7:]
    eps_out, betao_ref = outs
    (rb_sc, dpos_sc, dlane_sc, pkg_sc,
     rT_sc, bT_sc, dposT_sc, eps_sc, sem, sem3) = scr[:10]
    if fold:
        esum_sc, dms_sc, dmsq_sc = scr[10:13]

    r = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    jq = pl.program_id(3)
    f32 = jnp.float32
    F = 5
    JC, NC = _permute_chunks(J, B)
    CW = JC * B
    x_cat, x_mcat, SUB, W, exact = _decoders(xt_refs, Q, TN, packed, fold)
    if miss:
        def mc_row():
            # (1, Q*B) per-marker (mean - 3) row of this grid step's
            # blocks (see _make_dots)
            return jnp.concatenate(
                [mcrow_ref[0, pl.ds(jq * Q + q, 1), :]
                 for q in range(Q)], axis=1) - 3.0
    else:
        mc_row = None
    dot_r, dot_a = _make_dots(x_cat, x_mcat, exact, miss, mc_row)

    rho_r = rho_ref[r]
    JQ_LAST = J // Q - 1

    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(t == 0, jq == 0)))

    @pl.when(first)
    def _init():
        cp0 = pltpu.make_async_copy(epsh_ref, eps_out, sem3)
        cp0.start()
        cp0.wait()
        if fold:
            esum_sc[...] = esum0_ref[...]

    @pl.when(jq == 0)
    def _load_tile():
        # eps rides HBM as (SUB, C, NW) plane-major (genotypes._lane_perm):
        # one strided DMA loads tile t's (SUB, C, W) block, each bit-plane
        # k a contiguous (C, W) page of the scratch
        cp = pltpu.make_async_copy(
            eps_out.at[:, :, pl.ds(t * W, W)], eps_sc, sem3)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(ph == 0, jnp.logical_and(t == 0, jq == 0)))
    def _zero_r():
        rb_sc[...] = jnp.zeros((C * J, B), f32)

    @pl.when(ph == 0)
    def _accumulate_r():
        acc = None
        for k in range(SUB):
            eps_t = eps_sc[k]                               # (C, W)
            d = dot_r(eps_t, k)
            acc = d if acc is None else acc + d
        for q in range(Q):
            jj = jq * Q + q
            for c in range(C):
                rb_sc[pl.ds(c * J + jj, 1), :] += acc[c:c + 1,
                                                      q * B:(q + 1) * B]

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(t == 0, jq == 0)))
    def _solve():
        if fold:
            for c in range(C):
                es = esum_sc[c, 0]
                rb_sc[c * J:(c + 1) * J, :] = (
                    rb_sc[c * J:(c + 1) * J, :] * srow_ref[0]
                    - msrow_ref[0] * es)

        for gg in range(ng):
            cp = pltpu.make_async_copy(pkg_ref.at[rho_r, gg], pkg_sc, sem)
            cp.start()
            cp.wait()

            for cl in range(CGS):
                c = gg * CGS + cl
                for ch in range(NC):
                    ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                    rows = rb_sc[c * J + ch * JC:c * J + (ch + 1) * JC, :]
                    rT_sc[cl * B:(cl + 1) * B,
                          ch * JC:(ch + 1) * JC] = _tsp(
                        _lane_to_pos(rows, ir_c, B=B, JC=JC), JC)
                    brows = beta_ref[0, c * J + ch * JC:
                                     c * J + (ch + 1) * JC, :]
                    bT_sc[cl * B:(cl + 1) * B,
                          ch * JC:(ch + 1) * JC] = _tsp(
                        _lane_to_pos(brows, ir_c, B=B, JC=JC), JC)

            def band(sc, s):
                return jnp.concatenate(
                    [sc[pl.ds(cl * B + s, 1), :] for cl in range(CGS)],
                    axis=0)                                 # (CGS, J)

            def body(s, _):
                slab = pkg_sc[pl.ds(s * F * CGS, F * CGS), :]

                def fld(f):
                    return slab[f * CGS:(f + 1) * CGS, :]   # (CGS, J)

                invd = fld(0)
                sdv = fld(1)
                z_s = fld(2)
                xsq_j = fld(3)
                okf = fld(4)

                r_jl = band(rT_sc, s)                       # (CGS, J)
                beta_old = band(bT_sc, s)
                num = r_jl + beta_old * xsq_j
                beta_new = num * invd + sdv * z_s
                d = okf * (beta_new - beta_old)             # (CGS, J)

                AT = gpt_ref[0, pl.ds(s * B, B), :]         # (B, J)
                for cl in range(CGS):
                    rT_sc[cl * B:(cl + 1) * B, :] -= AT * d[cl:cl + 1, :]
                    dposT_sc[pl.ds(cl * B + s, 1), :] = d[cl:cl + 1, :]
                return ()

            lax.fori_loop(0, B, body, (), unroll=False)

            for cl in range(CGS):
                c = gg * CGS + cl
                for ch in range(NC):
                    ir_c = innr_ref[0][:, ch * CW:(ch + 1) * CW]
                    cols = slice(ch * JC, (ch + 1) * JC)
                    dpos_c = _tsp(dposT_sc[cl * B:(cl + 1) * B, cols], B)
                    dpos_sc[c * J + ch * JC:c * J + (ch + 1) * JC,
                            :] = dpos_c
                    dlane_sc[c * J + ch * JC:c * J + (ch + 1) * JC,
                             :] = _pos_to_lane(dpos_c, ir_c, B=B, JC=JC)

                dl = dlane_sc[c * J:(c + 1) * J, :]         # (J, B)
                betao_ref[0, c * J:(c + 1) * J, :] = \
                    beta_ref[0, c * J:(c + 1) * J, :] + dl

                if fold:
                    sub1 = jnp.sum(dl * xsum_ref[0], axis=1, keepdims=True)
                    esum_sc[c:c + 1, :] -= jnp.sum(sub1, axis=0,
                                                   keepdims=True)
                    dms_c = jnp.sum(dl * msrow_ref[0], axis=1,
                                    keepdims=True)
                    dms_sc[c:c + 1, :] = _tsp(dms_c, J)
                    dlane_sc[c * J:(c + 1) * J, :] = dl * srow_ref[0]

        if fold:
            JQ2 = J // Q
            gmat = (jax.lax.broadcasted_iota(jnp.int32, (JQ2, J), 1) // Q
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (JQ2, J), 0)).astype(f32)
            dmsq_sc[...] = _dot2_vrhs(gmat, dms_sc[...])                 # (J/Q, C)

    @pl.when(ph == 1)
    def _apply_update():
        def catrows(sc):
            rows = []
            for c in range(C):
                rows.append(jnp.concatenate(
                    [sc[pl.ds(c * J + jq * Q + q, 1), :]
                     for q in range(Q)], axis=1))
            return jnp.concatenate(rows, axis=0)            # (C, Q*B)

        dlcat = catrows(dlane_sc)
        if fold:
            dms = _tsp(dmsq_sc[pl.ds(jq, 1), :], 1)         # (C, 1)
        for k in range(SUB):
            upd = dot_a(dlcat, k)
            if fold:
                upd = upd - dms
            eps_sc[k, :, :] -= upd

        @pl.when(jq == JQ_LAST)
        def _store_tile():
            cp = pltpu.make_async_copy(
                eps_sc, eps_out.at[:, :, pl.ds(t * W, W)], sem3)
            cp.start()
            cp.wait()


def horseshoe_jacobi_t_pallas_mc8(XT_pad, gram, xsq_pad, eps, beta_pad,
                                  rho, inner_perm, z_arr, lam, tau, c2,
                                  sigmaE, valid_pad, *, J: int = 64,
                                  interpret: bool = False,
                                  x_mean=None, x_scale=None, x_xsum=None,
                                  fold_affine: bool = False,
                                  row_valid=None, missing: bool = False):
    """Wide fused multi-chain horseshoe sweep (one X stream + decode for
    all C chains); same contract as horseshoe_jacobi_t_pallas_mc."""
    nb, B, _ = gram.shape
    quantized, packed, fold, miss = _validate(nb, J, x_mean, XT_pad,
                                              fold_affine, missing)
    _warn_ablate()
    nr = nb // J
    f32 = jnp.float32
    C = eps.shape[0]
    F = 5
    CGS = int(os.environ.get("BAYESR_MC8_SOLVE_GROUP", "4"))
    CGS = min(CGS, C)
    while C % CGS:
        CGS -= 1
    ng = C // CGS

    if packed:
        Mpad_x, Nw = XT_pad.shape
        Npad = Nw * 16
        if Npad % 2048 or eps.shape[1] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        Q, TN = _mc8_plan_q_tn(Npad, B, J, F, C, CGS, True)
        xt = XT_pad
        epsC = eps.astype(f32)
        lane_mask = row_valid.astype(f32).reshape(1, Npad)
        SUBk = 16
    else:
        Q = auto_q(J)
        Mpad_x, N0 = XT_pad.shape
        TN = min(512, max(128, 1 << (N0 - 1).bit_length()))
        Npad = -(-N0 // TN) * TN
        epsC = jnp.zeros((C, Npad), f32).at[:, :N0].set(eps.astype(f32))
        xt = (XT_pad if Npad == N0
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N0))))
        lane_mask = (jnp.arange(Npad) < N0).astype(f32).reshape(1, Npad)
        SUBk = 1
    nt = Npad // TN
    # eps travels to/from the kernel as a (SUB, C, NW) plane-major view
    # (each bit-plane a contiguous page; one strided DMA per N-tile) -- a
    # 3 MB-class transpose per sweep call, invisible next to the X stream
    eps3 = epsC.reshape(C, SUBk, Npad // SUBk).transpose(1, 0, 2)
    Mpad = beta_pad.shape[1]

    P2 = build_onehot_inner(inner_perm, B=B, J=J, nr=nr)
    pkgT = build_pkgT_hs_mc_strided(xsq_pad, valid_pad, z_arr, lam, tau,
                                    c2, sigmaE, P2, B=B, J=J, nr=nr)
    pkgG = (pkgT.reshape(nr, B * F, ng, CGS, J)
            .transpose(0, 2, 1, 3, 4).reshape(nr, ng, B * F * CGS, J))
    gpT = build_gpT_strided(gram, P2, B=B, J=J, nr=nr)
    inner_row = (inner_perm.astype(jnp.int32).reshape(J, nr, B)
                 .transpose(1, 0, 2).reshape(nr, 1, J * B))
    beta_lane = (beta_pad.astype(f32).reshape(C, J, nr, B)
                 .transpose(2, 0, 1, 3).reshape(nr, C * J, B))
    rho_i = rho.astype(jnp.int32)

    def im_xt(q):
        def f(r, ph, t, jq, rho_ref):
            return ((jq * Q + q) * nr + rho_ref[r], t)
        return f

    def im_round(r, ph, t, jq, rho_ref):
        return (rho_ref[r], 0, 0)

    def im_full(r, ph, t, jq, rho_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec(memory_space=pl.ANY),             # eps (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # pkg (HBM)
            pl.BlockSpec((1, C * J, B), im_round),         # beta (lane)
        ])
    args = [xt] * Q + [inner_row, gpT, eps3, pkgG, beta_lane]
    scratch = [
        pltpu.VMEM((C * J, B), f32),                       # rb
        pltpu.VMEM((C * J, B), f32),                       # dpos
        pltpu.VMEM((C * J, B), f32),                       # dlane
        pltpu.VMEM((B * F * CGS, J), f32),                 # pkg band
        pltpu.VMEM((CGS * B, J), f32),                     # rT
        pltpu.VMEM((CGS * B, J), f32),                     # bT
        pltpu.VMEM((CGS * B, J), f32),                     # dposT
        pltpu.VMEM((SUBk, C, TN // SUBk), f32),            # eps tile
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if fold:
        in_specs += [pl.BlockSpec((1, J, B), im_round)] * 3 + [
            pl.BlockSpec((C, 1), im_full)]
        srow_r = _lane_rows(x_scale.astype(f32), B=B, J=J, nr=nr)
        msrow_r = _lane_rows(
            x_mean.astype(f32) * x_scale.astype(f32), B=B, J=J, nr=nr)
        xsum_r = _lane_rows(x_xsum.astype(f32), B=B, J=J, nr=nr)
        args += [srow_r, msrow_r, xsum_r,
                 jnp.sum(epsC, axis=1, keepdims=True)]
        if miss:
            in_specs += [pl.BlockSpec((1, J, B), im_round)]
            args += [_lane_rows(x_mean.astype(f32), B=B, J=J, nr=nr)]
        scratch += [pltpu.VMEM((C, 1), f32),
                    pltpu.VMEM((C, J), f32),
                    pltpu.VMEM((J // Q, C), f32)]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                 # eps (HBM)
        pl.BlockSpec((1, C * J, B), im_round),             # beta_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((SUBk, C, Npad // SUBk), f32),
        jax.ShapeDtypeStruct((nr, C * J, B), f32),
    ]
    kernel = functools.partial(_hs_jacobi_t_mc8_kernel, B=B, TN=TN, C=C,
                               CGS=CGS, J=J, Q=Q, nt=nt, packed=packed,
                               fold=fold, miss=miss)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, nt, J // Q),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(rho_i, *args)

    eps_o = eps_o.transpose(1, 0, 2).reshape(C, -1)        # plane-major back
    if fold:
        eps_o = eps_o * lane_mask
    beta_flat = (beta_o.reshape(nr, C, J, B).transpose(1, 2, 0, 3)
                 .reshape(C, Mpad))
    return ((eps_o if packed else eps_o[:, :eps.shape[1]]).astype(eps.dtype),
            beta_flat.astype(beta_pad.dtype))
