"""Transposed (B, J)-layout Jacobi sweep: the serial step reads lane vectors.

The round-3 interleaved-Gp kernel (ops/pallas_jacobi.py) spends ~2.6 us per
serial step, dominated by the dependent chain's (2J, B) mask-multiply +
lane-reduce that extracts position s's r/beta for all J blocks, and by
per-step ops shaped (J, K)/(J, 1) that use J sublanes but only K lanes.

This kernel transposes the serial solve so J rides the LANE axis:

- r and the pre-block betas live in (B, J) scratches (row s = position s,
  col j = round-block j): the per-step read is ONE dynamic sublane slice
  ``rT[s, :]`` -- no mask, no reduction;
- the per-(position, block) constants arrive as a (nr, B*F, J) operand
  (row s*F + f is field f of position s): one dynamic sublane slice yields
  an (F, J) tile and every selection op becomes a (K, J)/(1, J) lane
  vector -- full 128-lane utilisation at J = 128;
- the Gram rows arrive as a (nr, B*B, J) operand (row s*B + pos is
  Gp_j[s, pos] in col j): the J rank-1 updates of a step are ONE dynamic
  sublane slice + ONE (B, J) FMA into rT.

Round-scope permutation work is batched onto the MXU instead of looping
over J blocks (a J-iteration fori_loop costs ~J x 0.25 us per round --
~8 ms/iteration at J=128 on the biobank shape):

- beta and the group rows arrive PRE-PERMUTED to position order from XLA
  (the builder already gathers per-iteration operands; beta_out/kpos_out
  leave in position order and XLA scatters them back with the same index
  map), so only r (computed in-kernel from the X stream) and the outgoing
  deltas permute in-kernel;
- those two permutes run as chunked one-hot matmuls: with Pcat the
  (B, J*B) stacked one-hot [m, (j,s)] = (m == inner_j[s]),
  r_pos = (r @ Pcat masked to its own block-diagonal) @ Itile -- two MXU
  ops per 32-block chunk, exact in f32 (every sum adds one nonzero);
- layout hops (B, J) <-> (J, B) are identity-matmul transposes (exact).

Because the lane axis caps J at 128, the sweet spot pairs a large J with a
small B at the same Jacobi window J*B (4096 markers per round -- the
staleness validated in round 3); ops/pallas_jacobi.auto_jacobi_plan picks
the (J, B) split by measurement.

To keep grid overhead flat, each grid step streams Q blocks' X tiles
(Q index-mapped views of the same array): the grid is (nr, 2, J/Q, nt).

Semantics are identical to ops/pallas_jacobi.py: exact sequential Gibbs
within each B-block, block-Jacobi across the J blocks of a round (the
sharded Dm=J cross-slice semantics).  Reference per-update math:
src/BayesRv2.cpp:186-245 (bayesr), src/HorseshoeR.cpp:219-240 (horseshoe).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep import SweepResult


def auto_q(J: int) -> int:
    """X-streams per grid step: amortise grid overhead without exceeding
    the VMEM X-tile budget (Q double-buffered tiles)."""
    for q in (4, 2):
        if J % q == 0:
            return q
    return 1


def build_gpT_interleaved(gram, border, inner_sel, *, B, J):
    """Transposed interleaved-Gp operand (nr, B*B, J): row s*B + pos holds
    Gp_j[s, pos] in column j, where Gp_j = G_{border[r*J+j]} permuted to
    this iteration's position order (rows AND cols by inner_j)."""
    nr = border.shape[0] // J
    bsel = border.reshape(nr * J)
    g_sel = jnp.take(gram, bsel, axis=0)                   # (nr*J, B, B)
    inn = inner_sel.reshape(nr * J, B).astype(jnp.int32)
    rows = jnp.take_along_axis(g_sel, inn[:, :, None], axis=1)
    gpb = jnp.take_along_axis(rows, inn[:, None, :], axis=2)
    return (gpb.reshape(nr, J, B, B).transpose(0, 2, 3, 1)
            .reshape(nr, B * B, J).astype(jnp.float32))


def build_pkgT_jacobi(xsq, gas, valid, p, z, pi, cva, sigmaE, sigmaGG,
                      border, inner, *, B, J):
    """Transposed per-iteration packed operand (nr, B*F, J), F = 3K+4:
    row s*F + f holds field f of position s across the round's J blocks.
    Field order matches ops.pallas_jacobi.build_pkg_jacobi:
    [lp(K), 1/denom(K, spike col 0), sd(K, spike col 0), p, z, xsq, valid].
    Also returns (inner_sel (nr, J, B), gidx (nr, J, B)) -- gidx maps
    (round, block, position) to the padded marker index."""
    f32 = jnp.float32
    Mpad = xsq.shape[0]
    G, K = pi.shape
    nb = Mpad // B
    nr = nb // J
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
    tbl = jnp.concatenate([
        lp, invd, sd, xsq[:, None], valid.astype(f32)[:, None]], axis=1)

    bsel = border.reshape(nr, J)                           # (nr, J)
    inner_sel = jnp.take(inner, bsel, axis=0)              # (nr, J, B)
    gidx = bsel[:, :, None] * B + inner_sel                # (nr, J, B)
    per = jnp.take(tbl, gidx.reshape(-1), axis=0).reshape(nr, J, B, 3 * K + 2)
    # position-indexed randoms: sweep position of (round r, block j, pos s)
    # is (r*J + j)*B + s  (identical to the row-layout kernel)
    p3 = p.astype(f32).reshape(nr, J, B)[..., None]
    z3 = z.astype(f32).reshape(nr, J, B)[..., None]
    pkg = jnp.concatenate(
        [per[..., : 3 * K], p3, z3, per[..., 3 * K:]], axis=3)
    F = 3 * K + 4
    pkgT = pkg.transpose(0, 2, 3, 1).reshape(nr, B * F, J)  # row s*F + f
    return pkgT, inner_sel.astype(jnp.int32), gidx.astype(jnp.int32)


def build_pkgT_hs_jacobi(xsq, valid, z, lam, tau, c2, sigmaE,
                         border, inner, *, B, J):
    """Transposed horseshoe operand (nr, B*5, J): row s*5 + f holds field f
    of position s, fields [1/denom, sd, z, xsq, valid] (same math as
    ops.pallas_jacobi.build_pkg_hs_jacobi; src/HorseshoeR.cpp:224, 234).
    Also returns (inner_sel, gidx), both (nr, J, B)."""
    f32 = jnp.float32
    Mpad = xsq.shape[0]
    nb = Mpad // B
    nr = nb // J
    xsq = xsq.astype(f32)
    lam = lam.astype(f32)
    tauf = tau.astype(f32)
    sE = sigmaE.astype(f32)
    s_j = tauf * c2 * lam / (tauf * lam + c2)
    denom = xsq + sE / s_j
    tbl = jnp.stack([1.0 / denom, jnp.sqrt(sE / denom), xsq,
                     valid.astype(f32)], axis=1)           # (Mpad, 4)

    bsel = border.reshape(nr, J)
    inner_sel = jnp.take(inner, bsel, axis=0)              # (nr, J, B)
    gidx = bsel[:, :, None] * B + inner_sel
    per = jnp.take(tbl, gidx.reshape(-1), axis=0).reshape(nr, J, B, 4)
    z3 = z.astype(f32).reshape(nr, J, B)[..., None]        # position-indexed
    pkg = jnp.concatenate([per[..., :2], z3, per[..., 2:]], axis=3)
    pkgT = pkg.transpose(0, 2, 3, 1).reshape(nr, B * 5, J)
    return pkgT, inner_sel.astype(jnp.int32), gidx.astype(jnp.int32)


def _tsp(a, n):
    """Exact MXU transpose of a 2D f32 array via the identity one-hot:
    out[c, r] = sum_rho a[rho, c] I[rho, r] = a[r, c] (products are x*1 or
    x*0; the sum adds one non-zero -- bit-exact)."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(a.dtype)
    return jax.lax.dot_general(a, eye, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


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

    pcat[m, (j, s)] = (m == inner_j[s]); the full product
    rows @ pcat carries cross-block terms, the block-diagonal mask kills
    them, and Itile[(j, s), s'] = (s == s') folds the masked groups back
    to (JC, B).  Every output element sums exactly one nonzero product --
    bit-exact vs the per-block one-hot dots."""
    f32 = jnp.float32
    CW = JC * B
    pcat = (jax.lax.broadcasted_iota(jnp.int32, (B, CW), 0)
            == ir_c).astype(f32)                           # (B, CW)
    full = jax.lax.dot_general(rows, pcat, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)  # (JC, CW)
    gm = (jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 1) // B
          == jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 0)).astype(f32)
    itile = (jax.lax.broadcasted_iota(jnp.int32, (CW, B), 0) % B
             == jax.lax.broadcasted_iota(jnp.int32, (CW, B), 1)).astype(f32)
    return jax.lax.dot_general(full * gm, itile, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)  # (JC, B)


def _pos_to_lane(rows_pos, ir_c, *, B, JC):
    """Chunked batched un-permute: rows_pos (JC, B) position order ->
    marker-lane order (the inverse of _lane_to_pos; same masked two-matmul
    structure with the tiled identity on the left and Pcat' on the
    right)."""
    f32 = jnp.float32
    CW = JC * B
    tileT = (jax.lax.broadcasted_iota(jnp.int32, (B, CW), 1) % B
             == jax.lax.broadcasted_iota(jnp.int32, (B, CW), 0)).astype(f32)
    exp = jax.lax.dot_general(rows_pos, tileT, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)   # (JC, CW)
    gm = (jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 1) // B
          == jax.lax.broadcasted_iota(jnp.int32, (JC, CW), 0)).astype(f32)
    pcat2 = (jax.lax.broadcasted_iota(jnp.int32, (CW, B), 1)
             == ir_c.reshape(CW, 1)).astype(f32)            # (CW, B)
    return jax.lax.dot_general(exp * gm, pcat2, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)  # (JC, B)


def _jacobi_t_kernel(border_ref,                            # scalar prefetch
                     *refs, B, TN, K, G, J, Q, packed=False, fold=False):
    """Transposed Jacobi sweep kernel body.  refs layout:

    inputs:  xt_0..xt_{Q-1}, inner_row, pkgT, gpT, gas_pos, beta_pos,
             eps, sigmaE[, srow_r, msrow_r, xsum_r, esum0]
    outputs: eps_out, beta_out (pos), kpos_out (pos, f32), v_out, bacc_out
    scratch: rb (J, B), rT (B, J), bT (B, J), dposT (B, J), krecT (B, J),
             dpos (J, B), dlane (J, B)[, fold (1+J, 1)]
    """
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, pkg_ref, gpt_ref, gasp_ref, beta_ref,
     eps_ref, se_ref) = rest[:7]
    if fold:
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[7:11]
        outs = rest[11:16]
        (rb_sc, rT_sc, bT_sc, dposT_sc, krecT_sc,
         dpos_sc, dlane_sc, fold_sc) = rest[16:]
    else:
        outs = rest[7:12]
        (rb_sc, rT_sc, bT_sc, dposT_sc, krecT_sc,
         dpos_sc, dlane_sc) = rest[12:]
    eps_out, beta_out, kpos_out, v_out, bacc_out = outs

    r = pl.program_id(0)
    ph = pl.program_id(1)
    jq = pl.program_id(2)
    t = pl.program_id(3)
    f32 = jnp.float32
    sE = se_ref[0]
    F = 3 * K + 4
    JC, NC = _permute_chunks(J, B)
    CW = JC * B
    import os
    _ablate = os.environ.get("BAYESR_T_ABLATE", "")  # perf probe only

    if packed:
        SUB, W = 16, TN // 16
        if _ablate == "k1":          # perf probe: 1 of 16 subwords
            SUB = 1

        def x_sub(q, k):
            if _ablate == "noshift":  # perf probe: skip the bit extracts
                return xt_refs[q][...].astype(f32)
            c = (xt_refs[q][...] >> (2 * k)) & 3           # (B, W) int32
            return c.astype(f32)
    else:
        SUB, W = 1, TN

        def x_sub(q, k):
            xr = xt_refs[q]
            if fold and xr.dtype != jnp.float32:
                return xr[...].astype(f32)
            return xr[...]

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
        # r_j += eps_tile . X_j_tile' for this grid step's Q blocks
        for q in range(Q):
            jj = jq * Q + q
            for k in range(SUB):
                eps_t = eps_out[:, pl.ds(t * TN + k * W, W)]   # (1, W)
                rb_sc[pl.ds(jj, 1), :] += jax.lax.dot_general(
                    eps_t, x_sub(q, k), (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)                 # (1, B)

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(jq == 0, t == 0)))
    def _solve():
        if _ablate == "solve":       # perf probe: X phases only
            dposT_sc[...] = jnp.zeros_like(dposT_sc)
            krecT_sc[...] = jnp.full_like(krecT_sc, -1.0)
            dpos_sc[...] = jnp.zeros_like(dpos_sc)
            dlane_sc[...] = jnp.zeros_like(dlane_sc)
            beta_out[0] = beta_ref[0]
            kpos_out[0] = jnp.full((J, B), -1.0, f32)
            if fold:
                fold_sc[1:1 + J, :] = jnp.zeros((J, 1), f32)
            return
        if fold:
            # code-domain r -> standardized domain, whole round at once
            # (srow/msrow rows are in LANE order, like rb at this point)
            es = fold_sc[0, 0]
            rb_sc[...] = rb_sc[...] * srow_ref[0] - msrow_ref[0] * es

        # r to position order + transposed layout; beta arrives
        # pre-permuted from XLA and only needs the transpose
        for c in range(NC):
            ir_c = innr_ref[0][:, c * CW:(c + 1) * CW]     # (1, CW)
            rpos = _lane_to_pos(rb_sc[c * JC:(c + 1) * JC, :], ir_c,
                                B=B, JC=JC)
            rT_sc[:, c * JC:(c + 1) * JC] = _tsp(rpos, JC)
            bT_sc[:, c * JC:(c + 1) * JC] = _tsp(
                beta_ref[0, c * JC:(c + 1) * JC, :], JC)

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

        # back to row layout; deltas un-permute to marker-lane order for
        # the eps update, kpos/beta leave in position order (XLA scatters)
        for c in range(NC):
            ir_c = innr_ref[0][:, c * CW:(c + 1) * CW]
            dpos_c = _tsp(dposT_sc[:, c * JC:(c + 1) * JC], B)  # (JC, B)
            dpos_sc[c * JC:(c + 1) * JC, :] = dpos_c
            dlane_sc[c * JC:(c + 1) * JC, :] = _pos_to_lane(
                dpos_c, ir_c, B=B, JC=JC)
            kpos_out[0, c * JC:(c + 1) * JC, :] = _tsp(
                krecT_sc[:, c * JC:(c + 1) * JC], B)

        # whole-round outputs (vectorised; position order throughout)
        beta_new_r = beta_ref[0] + dpos_sc[...]            # (J, B)
        beta_out[0] = beta_new_r
        kl = kpos_out[0]
        gas_r = gasp_ref[0]                                # (J, B) int32
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
        for k in range(SUB):
            acc = None
            for q in range(Q):
                jj = jq * Q + q
                dl = dlane_sc[pl.ds(jj, 1), :]             # (1, B)
                upd = jax.lax.dot_general(
                    dl, x_sub(q, k), (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)            # (1, W)
                if fold:
                    upd = upd - fold_sc[pl.ds(1 + jj, 1), :]
                acc = upd if acc is None else acc + upd
            eps_out[:, pl.ds(t * TN + k * W, W)] -= acc


def _hs_jacobi_t_kernel(border_ref, *refs, B, TN, J, Q, packed=False,
                        fold=False):
    """Transposed horseshoe Jacobi kernel (src/HorseshoeR.cpp:219-240):
    same phase structure as _jacobi_t_kernel minus the selection loop and
    label/v/bacc outputs.  refs layout:

    inputs:  xt_0..xt_{Q-1}, inner_row, pkgT, gpT, beta_pos, eps
             [, srow_r, msrow_r, xsum_r, esum0]
    outputs: eps_out, beta_out (pos)
    scratch: rb (J, B), rT (B, J), bT (B, J), dposT (B, J), dpos (J, B),
             dlane (J, B)[, fold (1+J, 1)]
    """
    (xt_refs, rest) = (refs[:Q], refs[Q:])
    (innr_ref, pkg_ref, gpt_ref, beta_ref, eps_ref) = rest[:5]
    if fold:
        srow_ref, msrow_ref, xsum_ref, esum0_ref = rest[5:9]
        eps_out, beta_out = rest[9:11]
        (rb_sc, rT_sc, bT_sc, dposT_sc,
         dpos_sc, dlane_sc, fold_sc) = rest[11:]
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

    if packed:
        SUB, W = 16, TN // 16

        def x_sub(q, k):
            c = (xt_refs[q][...] >> (2 * k)) & 3
            return c.astype(f32)
    else:
        SUB, W = 1, TN

        def x_sub(q, k):
            xr = xt_refs[q]
            if fold and xr.dtype != jnp.float32:
                return xr[...].astype(f32)
            return xr[...]

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
        for q in range(Q):
            jj = jq * Q + q
            for k in range(SUB):
                eps_t = eps_out[:, pl.ds(t * TN + k * W, W)]
                rb_sc[pl.ds(jj, 1), :] += jax.lax.dot_general(
                    eps_t, x_sub(q, k), (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)

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
            bT_sc[:, c * JC:(c + 1) * JC] = _tsp(
                beta_ref[0, c * JC:(c + 1) * JC, :], JC)

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

        beta_out[0] = beta_ref[0] + dpos_sc[...]           # (J, B) pos

        if fold:
            dl = dlane_sc[...]
            sub1 = jnp.sum(dl * xsum_ref[0], axis=1, keepdims=True)
            fold_sc[0:1, :] -= jnp.sum(sub1, axis=0, keepdims=True)
            fold_sc[1:1 + J, :] = jnp.sum(dl * msrow_ref[0], axis=1,
                                          keepdims=True)
            dlane_sc[...] = dl * srow_ref[0]

    @pl.when(ph == 1)
    def _apply_update():
        for k in range(SUB):
            acc = None
            for q in range(Q):
                jj = jq * Q + q
                dl = dlane_sc[pl.ds(jj, 1), :]
                upd = jax.lax.dot_general(
                    dl, x_sub(q, k), (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                if fold:
                    upd = upd - fold_sc[pl.ds(1 + jj, 1), :]
                acc = upd if acc is None else acc + upd
            eps_out[:, pl.ds(t * TN + k * W, W)] -= acc


def _packed_tile_n_t(Npad, B, J, F, Q):
    """Largest N-tile (a 2048-multiple dividing Npad) under the transposed
    kernel's VMEM residency model: Q double-buffered X tiles (B*TN/4 bytes
    each), double-buffered gpT (B*B*J*4) + pkgT (B*F*J*4) + the round
    metadata rows, eps (Npad*4), ~1 MiB of small scratches."""
    import os
    cap_mb = float(os.environ.get("BAYESR_VMEM_CAP_MB", "13"))
    budget = int(cap_mb * 2 ** 20)
    lanes = max(J, 128)      # VMEM blocks pad the lane dim to 128
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
        TN = min(tile_n, max(128, 1 << (N - 1).bit_length()))
        Npad = -(-N // TN) * TN
        eps2d = jnp.zeros((1, Npad), f32).at[0, :N].set(eps.astype(f32))
        xt = (XT_pad if Npad == N
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N))))
        lane_mask = (jnp.arange(Npad) < N).astype(f32).reshape(1, Npad)
    return xt, eps2d, lane_mask, TN, Npad, N


def bayesr_jacobi_t_pallas(XT_pad, gram, xsq_pad, eps, beta_pad, labels_pad,
                           block_order, inner_perm, p_arr, z_arr,
                           pi, cva, sigmaE, sigmaGG, g_assign_pad, valid_pad,
                           *, J: int = 64, tile_n: int = 512,
                           interpret: bool = False,
                           x_mean=None, x_scale=None, x_xsum=None,
                           fold_affine: bool = False, row_valid=None):
    """Transposed-layout drop-in for bayesr_jacobi_pallas (same argument
    conventions; J must divide the block count and be <= 128).  Supports
    dense f32 X and the fold-affine raw-code paths (int8 / 2-bit packed,
    no real missing calls)."""
    nb, B, _ = gram.shape
    if nb % J:
        raise ValueError(f"jacobi sweep needs J | nb (J={J}, nb={nb})")
    if J > 128:
        raise ValueError("transposed jacobi sweep needs J <= 128 (lanes)")
    nr = nb // J
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if quantized and not fold:
        raise ValueError("jacobi sweep supports dense or fold-affine "
                         "quantized X only (missing calls: use the "
                         "single-chain kernel)")
    f32 = jnp.float32
    G, K = pi.shape
    F = 3 * K + 4
    Q = auto_q(J)
    xt, eps2d, lane_mask, TN, Npad, N = _prep_x(
        XT_pad, eps, packed=packed, fold=fold, tile_n=tile_n, B=B, J=J,
        F=F, Q=Q, row_valid=row_valid)
    nt = Npad // TN
    Mpad = beta_pad.shape[0]

    pkgT, inner_sel, gidx = build_pkgT_jacobi(
        xsq_pad, g_assign_pad, valid_pad, p_arr, z_arr, pi, cva,
        sigmaE, sigmaGG, block_order, inner_perm, B=B, J=J)
    border = block_order.astype(jnp.int32)
    gpT = build_gpT_interleaved(gram, border, inner_sel, B=B, J=J)
    gflat = gidx.reshape(-1)
    import os
    if os.environ.get("BAYESR_T_ABLATE", "") == "xla":   # perf probe: no
        # pallas call -- measures the per-iteration XLA glue alone (operand
        # builds consumed by cheap reduces; outputs shaped like the real
        # ones so the step's downstream XLA runs too)
        bogus = (jnp.sum(pkgT) + jnp.sum(gpT)
                 + jnp.sum(jnp.take(beta_pad.astype(f32), gflat)))
        beta_flat = jnp.zeros((Mpad,), f32).at[gflat].set(
            beta_pad.astype(f32)[gflat] + bogus * 1e-30)
        kv_flat = jnp.zeros((Mpad,), f32).at[gflat].set(-1.0)
        return SweepResult(
            eps=eps.astype(eps.dtype),
            beta=beta_flat.astype(beta_pad.dtype),
            labels=jnp.where(kv_flat >= 0.0, kv_flat.astype(jnp.int32),
                             labels_pad.astype(jnp.int32)),
            v=jnp.zeros((G, K), eps.dtype),
            beta_acum=jnp.zeros((G,), eps.dtype),
        )
    # beta/gas pre-permuted to position order (round, block, position)
    beta_pos = jnp.take(beta_pad.astype(f32), gflat).reshape(nr, J, B)
    gas_pos = jnp.take(g_assign_pad.astype(jnp.int32), gflat).reshape(
        nr, J, B)
    inner_row = inner_sel.reshape(nr, 1, J * B)
    se1 = sigmaE.astype(f32).reshape(1)

    def im_xt(q):
        def f(r, ph, jq, t, border_ref):
            return (border_ref[r * J + jq * Q + q], t)
        return f

    def im_round(r, ph, jq, t, border_ref):
        return (r, 0, 0)

    def im_full(r, ph, jq, t, border_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner (flat)
            pl.BlockSpec((1, B * F, J), im_round),         # pkgT
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, J, B), im_round),             # gas rows (pos)
            pl.BlockSpec((1, J, B), im_round),             # beta rows (pos)
            pl.BlockSpec((1, Npad), im_full),              # eps
            pl.BlockSpec(memory_space=pltpu.SMEM),         # sigmaE (1,)
        ])
    args = [xt] * Q + [inner_row, pkgT, gpT, gas_pos, beta_pos, eps2d, se1]
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
        srow_r = _round_gather_rows(x_scale, border, B=B, J=J)
        msrow_r = _round_gather_rows(
            x_mean.astype(f32) * x_scale.astype(f32), border, B=B, J=J)
        xsum_r = _round_gather_rows(x_xsum, border, B=B, J=J)
        args += [srow_r, msrow_r, xsum_r, jnp.sum(eps2d, axis=1)]
        scratch += [pltpu.VMEM((1 + J, 1), f32)]           # esum ; dms_j
    out_specs = [
        pl.BlockSpec((1, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, J, B), im_round),                 # beta_out (pos)
        pl.BlockSpec((1, J, B), im_round),                 # kpos_out (pos)
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
                               J=J, Q=Q, packed=packed, fold=fold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, J // Q, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o, kpos_o, v_o, bacc_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(border, *args)

    if fold:
        eps_o = eps_o * lane_mask  # re-zero drifted pad lanes
    # position-order outputs scatter back through the iteration's index
    # map; labels select in XLA (exact integer ops)
    beta_flat = jnp.zeros((Mpad,), f32).at[gflat].set(beta_o.reshape(-1))
    kv_flat = jnp.zeros((Mpad,), f32).at[gflat].set(kpos_o.reshape(-1))
    labels_flat = jnp.where(kv_flat >= 0.0, kv_flat.astype(jnp.int32),
                            labels_pad.astype(jnp.int32))
    return SweepResult(
        eps=eps_o[0, :N].astype(eps.dtype),
        beta=beta_flat.astype(beta_pad.dtype),
        labels=labels_flat,
        v=v_o.reshape(G, K).astype(eps.dtype),
        beta_acum=bacc_o[0].astype(eps.dtype),
    )


def _round_gather_rows(arr_pad, border, *, B: int, J: int):
    """(Mpad,) block-padded array -> (nr, J, B) round-gathered LANE-order
    rows (for the fold-affine srow/msrow/xsum operands)."""
    nb = arr_pad.shape[0] // B
    nr = border.shape[0] // J
    return jnp.take(arr_pad.astype(jnp.float32).reshape(nb, B),
                    border.reshape(nr * J), axis=0).reshape(nr, J, B)


def horseshoe_jacobi_t_pallas(XT_pad, gram, xsq_pad, eps, beta_pad,
                              block_order, inner_perm, z_arr,
                              lam_pad, tau, c2, sigmaE, valid_pad,
                              *, J: int = 64, tile_n: int = 512,
                              interpret: bool = False,
                              x_mean=None, x_scale=None, x_xsum=None,
                              fold_affine: bool = False, row_valid=None):
    """Transposed-layout drop-in for horseshoe_jacobi_pallas (same argument
    conventions; J <= 128 and J | nb)."""
    nb, B, _ = gram.shape
    if nb % J:
        raise ValueError(f"jacobi sweep needs J | nb (J={J}, nb={nb})")
    if J > 128:
        raise ValueError("transposed jacobi sweep needs J <= 128 (lanes)")
    nr = nb // J
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if quantized and not fold:
        raise ValueError("jacobi sweep supports dense or fold-affine "
                         "quantized X only (missing calls: use the "
                         "single-chain kernel)")
    f32 = jnp.float32
    Q = auto_q(J)
    xt, eps2d, lane_mask, TN, Npad, N = _prep_x(
        XT_pad, eps, packed=packed, fold=fold, tile_n=tile_n, B=B, J=J,
        F=5, Q=Q, row_valid=row_valid)
    nt = Npad // TN
    Mpad = beta_pad.shape[0]

    pkgT, inner_sel, gidx = build_pkgT_hs_jacobi(
        xsq_pad, valid_pad, z_arr, lam_pad, tau, c2, sigmaE,
        block_order, inner_perm, B=B, J=J)
    border = block_order.astype(jnp.int32)
    gpT = build_gpT_interleaved(gram, border, inner_sel, B=B, J=J)
    gflat = gidx.reshape(-1)
    beta_pos = jnp.take(beta_pad.astype(f32), gflat).reshape(nr, J, B)
    inner_row = inner_sel.reshape(nr, 1, J * B)

    def im_xt(q):
        def f(r, ph, jq, t, border_ref):
            return (border_ref[r * J + jq * Q + q], t)
        return f

    def im_round(r, ph, jq, t, border_ref):
        return (r, 0, 0)

    def im_full(r, ph, jq, t, border_ref):
        return (0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = (
        [pl.BlockSpec((B, x_tile_w), im_xt(q)) for q in range(Q)] + [
            pl.BlockSpec((1, 1, J * B), im_round),         # inner (flat)
            pl.BlockSpec((1, B * 5, J), im_round),         # pkgT
            pl.BlockSpec((1, B * B, J), im_round),         # gpT
            pl.BlockSpec((1, J, B), im_round),             # beta rows (pos)
            pl.BlockSpec((1, Npad), im_full),              # eps
        ])
    args = [xt] * Q + [inner_row, pkgT, gpT, beta_pos, eps2d]
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
        srow_r = _round_gather_rows(x_scale, border, B=B, J=J)
        msrow_r = _round_gather_rows(
            x_mean.astype(f32) * x_scale.astype(f32), border, B=B, J=J)
        xsum_r = _round_gather_rows(x_xsum, border, B=B, J=J)
        args += [srow_r, msrow_r, xsum_r, jnp.sum(eps2d, axis=1)]
        scratch += [pltpu.VMEM((1 + J, 1), f32)]
    out_specs = [
        pl.BlockSpec((1, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, J, B), im_round),                 # beta_out (pos)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), f32),
        jax.ShapeDtypeStruct((nr, J, B), f32),
    ]
    kernel = functools.partial(_hs_jacobi_t_kernel, B=B, TN=TN, J=J, Q=Q,
                               packed=packed, fold=fold)
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
    )(border, *args)

    if fold:
        eps_o = eps_o * lane_mask
    beta_flat = jnp.zeros((Mpad,), f32).at[gflat].set(beta_o.reshape(-1))
    return (eps_o[0, :N].astype(eps.dtype),
            beta_flat.astype(beta_pad.dtype))
