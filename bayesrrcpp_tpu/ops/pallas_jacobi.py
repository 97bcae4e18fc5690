"""Jacobi-batched Pallas sweep: J Gram blocks of ONE chain per serial step.

Why: the single-chain sweep kernel's per-marker serial update costs ~800
cycles of dependent narrow VPU work (measured via tools/solve_ablation.py);
its ops use 1 sublane of 8.  The fused multi-chain kernel showed the fix --
batch the serial math on the SUBLANE axis -- but a single chain has no chain
axis to batch.  It does have a BLOCK axis: sweep J Gram blocks per round
against the same round-start residual, batching the per-marker update over
the J blocks, then apply all J residual updates at once.

Semantics: exact sequential Gibbs WITHIN each block; block-Jacobi ACROSS the
J blocks of a round (each block sees eps as of the round start).  This is
identical to the mesh-sharded sampler's cross-slice semantics with Dm = J
(parallel/sharded.py; posterior equivalence validated statistically in
tests/test_sharded.py) -- here the "slices" share one chip.  J = 1 reduces
to the single-chain kernel's math exactly.

Layout (everything forced by the dynamic-index-on-sublanes rule):

- the kernel re-permutes each block to POSITION order on entry: a one-hot
  permutation matrix P_j (built on demand from the block's inner
  permutation, exact in f32) permutes r and beta, while the Gram blocks
  arrive PRE-permuted and INTERLEAVED from XLA (_build_gp_interleaved:
  row s*J + j of the per-round operand is Gp_j[s, :]) so the serial loop
  indexes everything by the shared position s -- no per-j dynamic marker
  indices survive, and the J rank-1 updates of a step collapse to one
  dynamic sublane slice + one (J, B) FMA;
- per-(position, j) constants (K log-priors, reciprocal denominators, slab
  sds, p/z variates, xsq, valid) are precomputed OUTSIDE (build_pkg_jacobi,
  vectorized XLA) into a (nr, B*J, 3K+4) operand whose row s*J + j is
  position s of round-block j: one dynamic sublane slice feeds all J lanes
  of a step (the multi-chain kernel's pkg trick, ops/pallas_multichain.py);
- r and the pre-block betas stack in one (2J, B) scratch so the per-step
  gather is a single mask-multiply + lane reduction;
- v/bacc/labels reconstruct per block AFTER the serial loop from a (J, B)
  krec record, exactly like the multi-chain kernel.

Storage modes: dense f32 and the fold-affine raw-code paths (int8 / 2-bit
packed with no real missing calls).  Quantized-with-missing falls back to
the single-chain kernel (ops/pallas_sweep.py).

Reference semantics per update: src/BayesRv2.cpp:186-245.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep import SweepResult
from .pallas_jacobi_t import _dot2_rows


def auto_jacobi(M: int, B: int):
    """Default (J, B) for the Jacobi-batched sweep when the caller did not
    pick one (VERDICT round-2 ask: the fast path without magic kwargs).

    Constraints:
    - VMEM: the kernel's two (J*B, B) f32 scratches (P one-hot + Gp) must
      fit the ~16 MiB VMEM alongside the X tile / Gram block / pkg operands;
      budget J*B^2 <= 2^20 elements (8 MiB for the pair).
    - staleness: the cross-block Jacobi window is J*B markers per round;
      cap it at M/8 so small problems stay (near-)sequential.  J=1 is the
      exact sequential kernel.

    B may shrink to 128 when that buys a larger J -- the serial-step count
    is Mpad/J, so maximizing J at the smallest full-lane block wins
    (measured on v5e: J=16/B=256 at 165.9 ms beat J=4-feasible B=512 in
    round 2; the interleaved-Gp kernel makes J=64/B=128 feasible).
    """
    import numpy as _np

    def no_pad(J, Bc):
        # the sampler pads Mpad to B*8*J/gcd(8,J) units AT SCALE (the
        # nb % 8 codegen rule only kicks in at >= 64 blocks; below that
        # the unit is just B*J); when X is a near-HBM-sized packed array,
        # jnp.pad's transient second copy OOMs the chip -- prefer the
        # largest J that divides M exactly
        unit8 = Bc * 8 * J // _np.gcd(8, J)
        if M < 64 * Bc:
            unit8 = Bc * J
        return M % unit8 == 0

    best = (1, B, no_pad(1, B))
    for Bc in dict.fromkeys((B, min(B, 256), 128)):
        jmax_vmem = max(1, (1 << 20) // (Bc * Bc))
        J = 1
        while J * 2 <= jmax_vmem and (J * 2) * Bc * 8 <= M:
            J *= 2
        while J > 1 and not no_pad(J, Bc) and no_pad(J // 2, Bc):
            J //= 2
        cand = (J, Bc, no_pad(J, Bc))
        # rank: padding-free first, then largest J
        if (cand[2], cand[0]) > (best[2], best[0]):
            best = cand
    return best[0], best[1]


def auto_jacobi_plan(M: int, B: int):
    """Default (J, B, layout) for the Jacobi sweep; layout is "row"
    (ops/pallas_jacobi.py, J on sublanes) or "t" (ops/pallas_jacobi_t.py,
    J on lanes).

    The transposed kernel caps J at 128 (the lane width) but cuts the
    per-step dependent chain ~2x and the streamed Gram bytes B/32-fold, so
    it prefers MANY SMALL blocks: the window W = J*B stays at the proven
    4096-marker staleness cap (or M/8 for small problems) while J rides to
    128.  The row kernel remains for explicit jacobi_blocks choices and
    J > 128 experiments.

    Ranking mirrors auto_jacobi: padding-free first (jnp.pad's transient
    copy of a near-HBM packed X OOMs the chip), then largest J, then
    largest B.  Falls back to the row-layout auto_jacobi when no transposed
    candidate with J >= 8 exists (tiny M).
    """
    import numpy as _np

    def unit8(J, Bc):
        # the sampler pads Mpad to this unit at scale (nb % 8 == 0 for
        # XLA codegen size); below 64 blocks it pads to B*J only
        u = Bc * J
        if M >= 64 * Bc:
            u = Bc * 8 * J // _np.gcd(8, J)
        return u

    wmax = 1
    while wmax * 2 <= max(1, M // 8) and wmax * 2 <= 4096:
        wmax *= 2
    best = None
    w = wmax
    while w >= 256:
        # B >= 32: Mosaic rejects the kernel's chunked one-hot permute
        # broadcasts at B = 8/16 on real TPUs ((1, JC*B) -> (B, JC*B)
        # "Invalid input layout"), so small blocks trade lanes (smaller
        # J) rather than sublanes
        J = min(128, w // 32)
        Bc = w // J
        cand = (M % unit8(J, Bc) == 0, J, Bc)
        if best is None or cand > best:
            best = cand
        w //= 2
    if best is not None and best[1] >= 8:
        if not best[0]:
            # no padding-free window: take the largest (padding was
            # already unavoidable; dense/host paths pad cheaply)
            J = min(128, wmax // 32)
            return J, wmax // J, "t"
        return best[1], best[2], "t"
    J, Bc = auto_jacobi(M, B)
    return J, Bc, "row"


def planned_mpad(M: int, block_size: int = 512) -> int:
    """The padded marker count the default (auto-plan) sampler will use
    for M markers -- so HOST loaders can pre-pad packed words and skip the
    on-device pad entirely (a near-HBM-sized device array cannot be
    padded in place: input + output both live during the copy, and at
    biobank scale that OOMs the chip -- see io.bed.read_bed_packed's
    ``mpad``).  Mirrors the samplers' blocking logic;
    tests/test_jacobi_t.py pins the two against each other."""
    import numpy as _np

    B = min(block_size, 1 << max(1, (M - 1).bit_length()))
    B = max(8, min(B, block_size))
    J, B, _layout = auto_jacobi_plan(M, B)
    unit = B * J
    Mpad = -(-M // unit) * unit
    if Mpad // B >= 64:
        unit8 = B * 8 * J // _np.gcd(8, J)
        Mpad = -(-M // unit8) * unit8
    return Mpad


def _build_gp_interleaved(gram, border, inner_sel, *, B, J):
    """Interleaved position-order Gram operand (nr, B*J, B): row s*J + j is
    Gp_j[s, :] where Gp_j = G_{border[r*J+j]} permuted to this iteration's
    position order (rows AND cols by inner_j).  Built as two XLA gathers +
    one transpose (~2 HBM passes over Mpad*B*4 bytes per iteration); lets
    the kernel's serial step do its J rank-1 updates as ONE dynamic sublane
    slice + ONE (J, B) FMA."""
    nr = border.shape[0] // J
    bsel = border.reshape(nr * J)
    g_sel = jnp.take(gram, bsel, axis=0)                   # (nr*J, B, B)
    inn = inner_sel.reshape(nr * J, B).astype(jnp.int32)
    rows = jnp.take_along_axis(g_sel, inn[:, :, None], axis=1)
    gpb = jnp.take_along_axis(rows, inn[:, None, :], axis=2)
    return (gpb.reshape(nr, J, B, B).transpose(0, 2, 1, 3)
            .reshape(nr, B * J, B).astype(jnp.float32))


def _packed_tile_n(Npad, B, J=1, F=0):
    """Largest N-tile (a 2048-multiple dividing Npad) that keeps the
    kernel's VMEM residency under ~12.5 MiB of the ~16 MiB core budget:
    fewer, fatter grid steps on the two X-streaming phases (the
    (nr, 2, J, nt) grid at TN=2048 was ~200k invocations per iteration at
    biobank scale; nt=1 removes the t axis entirely).

    Residency model: double-buffered X tile (B*TN/4 bytes int32 words),
    double-buffered interleaved-Gp round operand (J*B*B*4), double-buffered
    pkg (B*J*F*4), ~1.5 MiB for eps / small operands / scratches."""
    import os
    cap_mb = float(os.environ.get("BAYESR_VMEM_CAP_MB", "13"))
    budget = int(cap_mb * 2 ** 20) - 2 * (J * B * B * 4) - 2 * (B * J * F * 4)
    budget -= int(1.2 * 2 ** 20) + 2 * Npad * 4
    nt_total = Npad // 2048
    kmax = max(1, budget // (2 * (B * 2048 // 4)))
    for k in range(min(nt_total, kmax), 0, -1):
        if nt_total % k == 0:
            return 2048 * k
    return 2048


def build_pkg_jacobi(xsq, gas, valid, p, z, pi, cva, sigmaE, sigmaGG,
                     border, inner, *, B, J):
    """Per-iteration packed operand (nr, B*J, 3K+4): row s*J + j holds
    position s of the j-th block of the round, fields
    [lp(K), 1/denom(K, spike col 0), sd(K, spike col 0), p, z, xsq, valid].

    Same per-marker formulas as the single-chain kernel's in-kernel
    precompute (src/BayesRv2.cpp:199, 207-211), evaluated vectorized over
    all markers then gathered into sweep order.  Also returns the (nr, J, B)
    inner-permutation operand the kernel builds P_j from.
    """
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
    # is (r*J + j)*B + s
    p3 = p.astype(f32).reshape(nr, J, B)[..., None]
    z3 = z.astype(f32).reshape(nr, J, B)[..., None]
    pkg = jnp.concatenate(
        [per[..., : 3 * K], p3, z3, per[..., 3 * K:]], axis=3)
    F = 3 * K + 4
    pkg = pkg.transpose(0, 2, 1, 3).reshape(nr, B * J, F)  # row s*J + j
    return pkg, inner_sel.astype(jnp.int32)


def _jacobi_kernel(border_ref,                              # scalar prefetch
                   xt_ref, inner_ref, pkg_ref, gpint_ref, gasr_ref,
                   beta_ref, labels_ref, eps_ref, se_ref,
                   eps_out, beta_out, labels_out, v_out, bacc_out,
                   rb_sc, dpos_sc, krec_sc, dlane_sc,
                   *, B, TN, K, G, J, packed=False,
                   srow_ref=None, msrow_ref=None, xsum_ref=None,
                   esum0_ref=None, sms_sc=None, fold_sc=None):
    r = pl.program_id(0)
    ph = pl.program_id(1)
    j = pl.program_id(2)
    t = pl.program_id(3)
    f32 = jnp.float32
    fold = srow_ref is not None
    sE = se_ref[0]

    def onehot_p(jj):
        # one-hot permutation P_j[m, s] = (m == inner_j[s]); exact in f32.
        # Rebuilt on demand (an iota compare) instead of cached in VMEM --
        # the old (J*B, B) P scratch cost 2-4 MiB that the streamed
        # interleaved-Gp operand now needs.
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        return (sub == inner_ref[0, pl.ds(jj, 1), :]).astype(f32)

    if packed:
        SUB, W = 16, TN // 16

        def x_sub(k):
            c = (xt_ref[...] >> (2 * k)) & 3               # (B, W) int32
            return c.astype(f32)
    else:
        SUB, W = 1, TN

        def x_sub(k):
            # fold-mode int8 codes must cast before the dot (the compiled
            # TPU lowering of a mixed int8 x f32 dot_general differs from
            # the proven f32 path; matches pallas_sweep.py's fold branch)
            if fold and xt_ref.dtype != jnp.float32:
                return xt_ref[...].astype(f32)
            return xt_ref[...]

    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    # codes/int8 are bf16-exact -> 2-pass split dot; decoded/dense f32
    # falls back to the 3-pass bf16x3 expansion (see _dot2_rows)
    x_exact = fold and (packed or xt_ref.dtype != jnp.float32)
    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(j == 0, t == 0)))

    @pl.when(first)
    def _init():
        eps_out[...] = eps_ref[...]
        v_out[...] = jnp.zeros_like(v_out)
        bacc_out[...] = jnp.zeros_like(bacc_out)
        if fold:
            fold_sc[0:1, :] = jnp.full((1, 1), esum0_ref[0], f32)

    @pl.when(jnp.logical_and(ph == 0, t == 0))
    def _per_block_precompute():
        # pre-block betas in position order; zero this block's r row.
        # (Gp_j = P_j' G_j P_j now arrives pre-gathered from XLA in the
        # interleaved gpint operand -- no in-kernel Gram permute.)
        pj = onehot_p(j)
        rb_sc[pl.ds(J + j, 1), :] = jax.lax.dot_general(
            beta_ref[0], pj, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        rb_sc[pl.ds(j, 1), :] = jnp.zeros((1, B), f32)
        if fold:
            sms_sc[pl.ds(j, 1), :] = srow_ref[0]
            sms_sc[pl.ds(J + j, 1), :] = msrow_ref[0]
            sms_sc[pl.ds(2 * J + j, 1), :] = xsum_ref[0]

    @pl.when(ph == 0)
    def _accumulate_r():
        # r_j += eps_tile . X_j_tile' (marker-lane order at this point)
        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]   # (1, W)
            rb_sc[pl.ds(j, 1), :] += _dot2_rows(eps_t, x_sub(k), 1, x_exact)

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(j == 0, t == 0)))
    def _solve():
        dpos_sc[...] = jnp.zeros_like(dpos_sc)
        krec_sc[...] = jnp.full((J, B), -1.0, f32)
        if fold:
            # code-domain r -> standardized domain (see pallas_sweep fold
            # notes); esum is the round-start sum over eps lanes, shared by
            # all J blocks of the round.  Scalar read + splat (mosaic cannot
            # broadcast a (1,1) vector to (J,B) in one op).
            es = fold_sc[0, 0]
            rb_sc[0:J, :] = (rb_sc[0:J, :] * sms_sc[0:J, :]
                             - sms_sc[J:2 * J, :] * es)
        # r rows to position order (one (1,B)x(B,B) MXU dot per block)
        for jj in range(J):
            rb_sc[pl.ds(jj, 1), :] = jax.lax.dot_general(
                rb_sc[jj:jj + 1, :], onehot_p(jj),
                (((1,), (0,)), ((), ())), preferred_element_type=f32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1).astype(f32)
        Kf = jnp.float32(K)
        half_invsE = 0.5 / sE

        def body(s, _):
            row = pkg_ref[0, pl.ds(s * J, J), :]           # (J, 3K+4)
            lp = row[:, 0:K]
            invd = row[:, K:2 * K]
            sd = row[:, 2 * K:3 * K]
            p_s = row[:, 3 * K:3 * K + 1]
            z_s = row[:, 3 * K + 1:3 * K + 2]
            xsq_j = row[:, 3 * K + 2:3 * K + 3]
            okf = row[:, 3 * K + 3:3 * K + 4]

            maskf = (lane == s).astype(f32)                # (1, B)
            both = jnp.sum(rb_sc[...] * maskf, axis=1, keepdims=True)
            r_jl = both[0:J, :]                            # (J, 1)
            beta_old = both[J:2 * J, :]

            num = r_jl + beta_old * xsq_j                  # (J, 1)
            muk = num * invd                               # (J, K), col0=0
            logL = lp + (half_invsE * num) * muk
            logLs = logL[:, 1:]

            # reference categorical draw with the overflow guard, unrolled
            # over K; all J blocks draw in lockstep (src/BayesRv2.cpp:216-242)
            k_sel = jnp.full((J, 1), Kf, f32)
            acum = jnp.zeros((J, 1), f32)
            for k in range(K):
                lk = logL[:, k:k + 1]
                guard = jnp.max(jnp.abs(logLs - lk), axis=1,
                                keepdims=True) > 700.0
                Ssum = jnp.sum(jnp.exp(logL - lk), axis=1, keepdims=True)
                w = jnp.where(guard, jnp.zeros((J, 1), f32), 1.0 / Ssum)
                acum = acum + w
                hit = jnp.logical_and(p_s <= acum, k_sel == Kf)
                k_sel = jnp.where(hit, jnp.float32(k), k_sel)
            hitm = k_sel < Kf

            selm = (kcol == k_sel).astype(f32)             # (J, K)
            mu_sel = jnp.sum(muk * selm, axis=1, keepdims=True)
            sd_sel = jnp.sum(sd * selm, axis=1, keepdims=True)
            beta_drawn = mu_sel + sd_sel * z_s
            beta_new = jnp.where(hitm, beta_drawn, beta_old)
            d = okf * (beta_new - beta_old)                # (J, 1)

            # rank-1 updates against the position-ordered Gram rows: the
            # interleaved gpint row s*J + jj is Gp_jj[s, :], so ONE dynamic
            # sublane slice + ONE (J, B) FMA covers all J blocks (was J
            # separate (1, B) row updates -- the dominant per-step cost)
            A = gpint_ref[0, pl.ds(s * J, J), :]           # (J, B)
            rb_sc[0:J, :] -= A * d
            dpos_sc[...] += maskf * d                      # (J, B)
            take = okf * hitm.astype(f32)
            kv = jnp.where(take > 0, k_sel, jnp.float32(-1.0))
            krec_sc[...] += maskf * (kv + 1.0)
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)

        # deltas back to marker-lane order (exact one-hot matmuls); fold
        # mode also tracks esum analytically and pre-scales for the raw
        # code-domain eps update
        for jj in range(J):
            dlane_sc[pl.ds(jj, 1), :] = jax.lax.dot_general(
                dpos_sc[jj:jj + 1, :], onehot_p(jj),
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
        if fold:
            dl = dlane_sc[...]                             # (J, B) unscaled
            sub = jnp.sum(dl * sms_sc[2 * J:3 * J, :], axis=1, keepdims=True)
            fold_sc[0:1, :] -= jnp.sum(sub, axis=0, keepdims=True)
            fold_sc[1:1 + J, :] = jnp.sum(dl * sms_sc[J:2 * J, :], axis=1,
                                          keepdims=True)   # dms per block
            dlane_sc[...] = dl * sms_sc[0:J, :]

    @pl.when(jnp.logical_and(ph == 1, t == 0))
    def _reconstruct_block():
        # per-block outputs off the serial chain (multi-chain kernel style):
        # select this block's row, un-permute krec via P_j (one-hot, exact)
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
                  == j).astype(f32)
        pj = onehot_p(j)
        dlane_j = jax.lax.dot_general(
            jnp.sum(dpos_sc[...] * rowsel, axis=0, keepdims=True), pj,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # (1, B)
        beta_new_b = beta_ref[0] + dlane_j                 # (1, B)
        beta_out[0] = beta_new_b
        krec_j = jax.lax.dot_general(
            jnp.sum(krec_sc[...] * rowsel, axis=0, keepdims=True), pj,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # (1, B)
        labels_out[0] = jnp.where(krec_j >= 0.0, krec_j.astype(jnp.int32),
                                  labels_ref[0])
        gas_row = gasr_ref[0]                              # (1, B) int32
        slab2 = jnp.where(krec_j > 0.0, beta_new_b * beta_new_b, 0.0)
        vcols = []
        bcols = []
        for g in range(G):
            gm = (gas_row == g).astype(f32)
            for k in range(K):
                km = (krec_j == jnp.float32(k)).astype(f32)
                vcols.append(jnp.sum(km * gm, axis=1, keepdims=True))
            bcols.append(jnp.sum(slab2 * gm, axis=1, keepdims=True))
        v_out[...] += jnp.concatenate(vcols, axis=1)       # (1, G*K)
        bacc_out[...] += jnp.concatenate(bcols, axis=1)    # (1, G)

    @pl.when(ph == 1)
    def _apply_update():
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
                  == j).astype(f32)
        dl = jnp.sum(dlane_sc[...] * rowsel, axis=0, keepdims=True)  # (1, B)
        for k in range(SUB):
            upd = _dot2_rows(dl, x_sub(k), 0, x_exact)
            if fold:
                upd = upd - fold_sc[pl.ds(1 + j, 1), :]
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def _jacobi_kernel_f(border_ref, xt_ref, inner_ref, pkg_ref, gpint_ref,
                     gasr_ref, beta_ref, labels_ref, eps_ref, se_ref,
                     srow_ref, msrow_ref, xsum_ref, esum0_ref,
                     eps_out, beta_out, labels_out, v_out, bacc_out,
                     rb_sc, dpos_sc, krec_sc, dlane_sc,
                     sms_sc, fold_sc, *, B, TN, K, G, J, packed=False):
    """Fold-affine positional-argument adapter (pallas passes refs
    positionally; the extra fold inputs/scratches are keyword-only in
    _jacobi_kernel)."""
    return _jacobi_kernel(border_ref, xt_ref, inner_ref, pkg_ref, gpint_ref,
                          gasr_ref, beta_ref, labels_ref, eps_ref, se_ref,
                          eps_out, beta_out, labels_out, v_out, bacc_out,
                          rb_sc, dpos_sc, krec_sc, dlane_sc,
                          B=B, TN=TN, K=K, G=G, J=J, packed=packed,
                          srow_ref=srow_ref, msrow_ref=msrow_ref,
                          xsum_ref=xsum_ref, esum0_ref=esum0_ref,
                          sms_sc=sms_sc, fold_sc=fold_sc)


def _round_solve_kernel(inner_ref, pkg_ref, gram_ref, gasr_ref,
                        beta_ref, labels_ref, r_ref, se_ref,
                        dlane_out, beta_out, labels_out, v_out, bacc_out,
                        p_sc, gp_sc, rb_sc, dpos_sc, krec_sc,
                        *, B, K, G, J):
    """Solve-only round kernel: the batched serial phase of _jacobi_kernel
    with r precomputed OUTSIDE (partial X'eps matmul + psum over the "n"
    mesh axis) and the rank-1 eps update applied OUTSIDE (delta'X matmul +
    psum over "m").  This is what makes the pallas fast path row-shardable
    (Dn > 1): the two X-streaming passes become sharded XLA matmuls and
    only the VMEM-sized sequential solve stays in pallas.

    Inputs are one round's J blocks: r (J, B) lane-order standardized-domain
    correlations, gram (J, B, B), beta/labels/gas (J, B), inner (J, B),
    pkg (B*J, 3K+4) with row s*J + j = position s of block j
    (build_pkg_jacobi layout).  Outputs dlane/beta/labels (J, B) lane-order
    and the v/bacc accumulators.  Reference per-update semantics:
    src/BayesRv2.cpp:186-245."""
    ph = pl.program_id(0)
    j = pl.program_id(1)
    f32 = jnp.float32
    sE = se_ref[0]

    @pl.when(jnp.logical_and(ph == 0, j == 0))
    def _init():
        v_out[...] = jnp.zeros_like(v_out)
        bacc_out[...] = jnp.zeros_like(bacc_out)

    @pl.when(ph == 0)
    def _per_block_precompute():
        # one-hot permutation P_j[m, s] = (m == inner_j[s]); exact in f32
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        pj = (sub == inner_ref[pl.ds(j, 1), :]).astype(f32)    # (B, B)
        p_sc[pl.ds(j * B, B), :] = pj
        gp1 = jax.lax.dot_general(gram_ref[0], pj, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        gp_sc[pl.ds(j * B, B), :] = jax.lax.dot_general(
            pj, gp1, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        rb_sc[pl.ds(J + j, 1), :] = jax.lax.dot_general(
            beta_ref[...], pj, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        rb_sc[pl.ds(j, 1), :] = r_ref[...]                     # lane order

    @pl.when(jnp.logical_and(ph == 1, j == 0))
    def _solve():
        dpos_sc[...] = jnp.zeros_like(dpos_sc)
        krec_sc[...] = jnp.full((J, B), -1.0, f32)
        # r rows to position order (one (1,B)x(B,B) MXU dot per block)
        for jj in range(J):
            rb_sc[pl.ds(jj, 1), :] = jax.lax.dot_general(
                rb_sc[jj:jj + 1, :], p_sc[pl.ds(jj * B, B), :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1).astype(f32)
        Kf = jnp.float32(K)
        half_invsE = 0.5 / sE

        def body(s, _):
            row = pkg_ref[pl.ds(s * J, J), :]                  # (J, 3K+4)
            lp = row[:, 0:K]
            invd = row[:, K:2 * K]
            sd = row[:, 2 * K:3 * K]
            p_s = row[:, 3 * K:3 * K + 1]
            z_s = row[:, 3 * K + 1:3 * K + 2]
            xsq_j = row[:, 3 * K + 2:3 * K + 3]
            okf = row[:, 3 * K + 3:3 * K + 4]

            maskf = (lane == s).astype(f32)                    # (1, B)
            both = jnp.sum(rb_sc[...] * maskf, axis=1, keepdims=True)
            r_jl = both[0:J, :]                                # (J, 1)
            beta_old = both[J:2 * J, :]

            num = r_jl + beta_old * xsq_j                      # (J, 1)
            muk = num * invd                                   # (J, K)
            logL = lp + (half_invsE * num) * muk
            logLs = logL[:, 1:]

            # reference categorical draw with the overflow guard
            # (src/BayesRv2.cpp:216-242), all J blocks in lockstep
            k_sel = jnp.full((J, 1), Kf, f32)
            acum = jnp.zeros((J, 1), f32)
            for k in range(K):
                lk = logL[:, k:k + 1]
                guard = jnp.max(jnp.abs(logLs - lk), axis=1,
                                keepdims=True) > 700.0
                Ssum = jnp.sum(jnp.exp(logL - lk), axis=1, keepdims=True)
                w = jnp.where(guard, jnp.zeros((J, 1), f32), 1.0 / Ssum)
                acum = acum + w
                hit = jnp.logical_and(p_s <= acum, k_sel == Kf)
                k_sel = jnp.where(hit, jnp.float32(k), k_sel)
            hitm = k_sel < Kf

            selm = (kcol == k_sel).astype(f32)                 # (J, K)
            mu_sel = jnp.sum(muk * selm, axis=1, keepdims=True)
            sd_sel = jnp.sum(sd * selm, axis=1, keepdims=True)
            beta_drawn = mu_sel + sd_sel * z_s
            beta_new = jnp.where(hitm, beta_drawn, beta_old)
            d = okf * (beta_new - beta_old)                    # (J, 1)

            for jj in range(J):
                rb_sc[pl.ds(jj, 1), :] -= (
                    gp_sc[pl.ds(jj * B + s, 1), :] * d[jj:jj + 1, :])
            dpos_sc[...] += maskf * d                          # (J, B)
            take = okf * hitm.astype(f32)
            kv = jnp.where(take > 0, k_sel, jnp.float32(-1.0))
            krec_sc[...] += maskf * (kv + 1.0)
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)

    @pl.when(ph == 1)
    def _reconstruct_block():
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
                  == j).astype(f32)
        dlane_j = jax.lax.dot_general(
            jnp.sum(dpos_sc[...] * rowsel, axis=0, keepdims=True),
            p_sc[pl.ds(j * B, B), :],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # (1, B)
        dlane_out[...] = dlane_j
        beta_new_b = beta_ref[...] + dlane_j                   # (1, B)
        beta_out[...] = beta_new_b
        krec_j = jax.lax.dot_general(
            jnp.sum(krec_sc[...] * rowsel, axis=0, keepdims=True),
            p_sc[pl.ds(j * B, B), :],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # (1, B)
        labels_out[...] = jnp.where(krec_j >= 0.0, krec_j.astype(jnp.int32),
                                    labels_ref[...])
        gas_row = gasr_ref[...]                                # (1, B) int32
        slab2 = jnp.where(krec_j > 0.0, beta_new_b * beta_new_b, 0.0)
        vcols = []
        bcols = []
        for g in range(G):
            gm = (gas_row == g).astype(f32)
            for k in range(K):
                km = (krec_j == jnp.float32(k)).astype(f32)
                vcols.append(jnp.sum(km * gm, axis=1, keepdims=True))
            bcols.append(jnp.sum(slab2 * gm, axis=1, keepdims=True))
        v_out[...] += jnp.concatenate(vcols, axis=1)           # (1, G*K)
        bacc_out[...] += jnp.concatenate(bcols, axis=1)        # (1, G)


def bayesr_round_solve_pallas(r_rows, gram_rows, beta_rows, labels_rows,
                              gas_rows, inner_rows, pkg, sigmaE, *,
                              K: int, G: int, interpret: bool = False):
    """One round's batched sequential solve for the split (row-shardable)
    sweep.  All operands are the round's J blocks (VMEM-sized; no X):

    r_rows (J, B) standardized-domain correlations (lane order),
    gram_rows (J, B, B), beta/labels/gas_rows (J, B), inner_rows (J, B),
    pkg (B*J, 3K+4) in build_pkg_jacobi row order, sigmaE scalar.

    Returns (dlane (J, B), beta_new (J, B), labels_new (J, B),
    v (G, K), bacc (G,)) -- all lane-order f32/int32.
    """
    J, B = r_rows.shape
    f32 = jnp.float32

    def im_full2(ph, j):
        return (0, 0)

    def im_j2(ph, j):
        return (j, 0)

    def im_j3(ph, j):
        return (j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(2, J),
        in_specs=[
            pl.BlockSpec((J, B), im_full2),                    # inner
            pl.BlockSpec((B * J, 3 * K + 4), im_full2),        # pkg
            pl.BlockSpec((1, B, B), im_j3),                    # gram
            pl.BlockSpec((1, B), im_j2),                       # gas row
            pl.BlockSpec((1, B), im_j2),                       # beta
            pl.BlockSpec((1, B), im_j2),                       # labels
            pl.BlockSpec((1, B), im_j2),                       # r
            pl.BlockSpec(memory_space=pltpu.SMEM),             # sigmaE (1,)
        ],
        out_specs=[
            pl.BlockSpec((1, B), im_j2),                       # dlane
            pl.BlockSpec((1, B), im_j2),                       # beta_out
            pl.BlockSpec((1, B), im_j2),                       # labels_out
            pl.BlockSpec((1, G * K), im_full2),                # v_out
            pl.BlockSpec((1, G), im_full2),                    # bacc_out
        ],
        scratch_shapes=[
            pltpu.VMEM((J * B, B), f32),                       # P (one-hot)
            pltpu.VMEM((J * B, B), f32),                       # Gp
            pltpu.VMEM((2 * J, B), f32),                       # r ; beta0
            pltpu.VMEM((J, B), f32),                           # delta (pos)
            pltpu.VMEM((J, B), f32),                           # krec (pos)
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((J, B), f32),
        jax.ShapeDtypeStruct((J, B), f32),
        jax.ShapeDtypeStruct((J, B), jnp.int32),
        jax.ShapeDtypeStruct((1, G * K), f32),
        jax.ShapeDtypeStruct((1, G), f32),
    ]
    kernel = functools.partial(_round_solve_kernel, B=B, K=K, G=G, J=J)
    dlane, beta_o, labels_o, v_o, bacc_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(inner_rows.astype(jnp.int32), pkg.astype(f32),
      gram_rows.astype(f32), gas_rows.astype(jnp.int32),
      beta_rows.astype(f32), labels_rows.astype(jnp.int32),
      r_rows.astype(f32), sigmaE.astype(f32).reshape(1))
    return dlane, beta_o, labels_o, v_o.reshape(G, K), bacc_o.reshape(G)


def _hs_round_solve_kernel(inner_ref, pkg_ref, gram_ref, beta_ref, r_ref,
                           dlane_out, beta_out,
                           p_sc, gp_sc, rb_sc, dpos_sc, *, B, J):
    """Horseshoe solve-only round kernel (see _round_solve_kernel): the
    dense conjugate draw has no selection loop or label/v/bacc outputs.
    Reference per-update semantics: src/HorseshoeR.cpp:219-240."""
    ph = pl.program_id(0)
    j = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(ph == 0)
    def _per_block_precompute():
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        pj = (sub == inner_ref[pl.ds(j, 1), :]).astype(f32)    # (B, B)
        p_sc[pl.ds(j * B, B), :] = pj
        gp1 = jax.lax.dot_general(gram_ref[0], pj, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        gp_sc[pl.ds(j * B, B), :] = jax.lax.dot_general(
            pj, gp1, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        rb_sc[pl.ds(J + j, 1), :] = jax.lax.dot_general(
            beta_ref[...], pj, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        rb_sc[pl.ds(j, 1), :] = r_ref[...]                     # lane order

    @pl.when(jnp.logical_and(ph == 1, j == 0))
    def _solve():
        dpos_sc[...] = jnp.zeros_like(dpos_sc)
        for jj in range(J):
            rb_sc[pl.ds(jj, 1), :] = jax.lax.dot_general(
                rb_sc[jj:jj + 1, :], p_sc[pl.ds(jj * B, B), :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

        def body(s, _):
            row = pkg_ref[pl.ds(s * J, J), :]                  # (J, 5)
            invd = row[:, 0:1]
            sd = row[:, 1:2]
            z_s = row[:, 2:3]
            xsq_j = row[:, 3:4]
            okf = row[:, 4:5]

            maskf = (lane == s).astype(f32)
            both = jnp.sum(rb_sc[...] * maskf, axis=1, keepdims=True)
            r_jl = both[0:J, :]
            beta_old = both[J:2 * J, :]

            num = r_jl + beta_old * xsq_j
            beta_new = num * invd + sd * z_s
            d = okf * (beta_new - beta_old)

            for jj in range(J):
                rb_sc[pl.ds(jj, 1), :] -= (
                    gp_sc[pl.ds(jj * B + s, 1), :] * d[jj:jj + 1, :])
            dpos_sc[...] += maskf * d
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)

    @pl.when(ph == 1)
    def _reconstruct_block():
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
                  == j).astype(f32)
        dlane_j = jax.lax.dot_general(
            jnp.sum(dpos_sc[...] * rowsel, axis=0, keepdims=True),
            p_sc[pl.ds(j * B, B), :],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dlane_out[...] = dlane_j
        beta_out[...] = beta_ref[...] + dlane_j


def horseshoe_round_solve_pallas(r_rows, gram_rows, beta_rows, inner_rows,
                                 pkg, *, interpret: bool = False):
    """One round's batched horseshoe solve for the split (row-shardable)
    sweep.  pkg is (B*J, 5) in build_pkg_hs_jacobi row order.  Returns
    (dlane (J, B), beta_new (J, B)) lane-order f32."""
    J, B = r_rows.shape
    f32 = jnp.float32

    def im_full2(ph, j):
        return (0, 0)

    def im_j2(ph, j):
        return (j, 0)

    def im_j3(ph, j):
        return (j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(2, J),
        in_specs=[
            pl.BlockSpec((J, B), im_full2),                    # inner
            pl.BlockSpec((B * J, 5), im_full2),                # pkg
            pl.BlockSpec((1, B, B), im_j3),                    # gram
            pl.BlockSpec((1, B), im_j2),                       # beta
            pl.BlockSpec((1, B), im_j2),                       # r
        ],
        out_specs=[
            pl.BlockSpec((1, B), im_j2),                       # dlane
            pl.BlockSpec((1, B), im_j2),                       # beta_out
        ],
        scratch_shapes=[
            pltpu.VMEM((J * B, B), f32),                       # P
            pltpu.VMEM((J * B, B), f32),                       # Gp
            pltpu.VMEM((2 * J, B), f32),                       # r ; beta0
            pltpu.VMEM((J, B), f32),                           # delta (pos)
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((J, B), f32),
        jax.ShapeDtypeStruct((J, B), f32),
    ]
    kernel = functools.partial(_hs_round_solve_kernel, B=B, J=J)
    dlane, beta_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(inner_rows.astype(jnp.int32), pkg.astype(f32), gram_rows.astype(f32),
      beta_rows.astype(f32), r_rows.astype(f32))
    return dlane, beta_o


def build_pkg_hs_jacobi(xsq, valid, z, lam, tau, c2, sigmaE,
                        border, inner, *, B, J):
    """Horseshoe per-iteration packed operand (nr, B*J, 5): row s*J + j
    holds position s of the j-th block of the round, fields
    [1/denom, sd, z, xsq, valid].

    denom/sd use the regularized-horseshoe effective prior variance
    s_j = tau*c2*lam_j/(tau*lam_j + c2) with lambda fixed during the sweep
    (src/HorseshoeR.cpp:224, 234), evaluated vectorized over all markers
    then gathered into sweep order.  Also returns the (nr, J, B) inner
    permutation operand."""
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
                     valid.astype(f32)], axis=1)              # (Mpad, 4)

    bsel = border.reshape(nr, J)                              # (nr, J)
    inner_sel = jnp.take(inner, bsel, axis=0)                 # (nr, J, B)
    gidx = bsel[:, :, None] * B + inner_sel                   # (nr, J, B)
    per = jnp.take(tbl, gidx.reshape(-1), axis=0).reshape(nr, J, B, 4)
    z3 = z.astype(f32).reshape(nr, J, B)[..., None]           # position-idx
    pkg = jnp.concatenate([per[..., :2], z3, per[..., 2:]], axis=3)
    pkg = pkg.transpose(0, 2, 1, 3).reshape(nr, B * J, 5)     # row s*J + j
    return pkg, inner_sel.astype(jnp.int32)


def _hs_jacobi_kernel(border_ref,                             # scalar prefetch
                      xt_ref, inner_ref, pkg_ref, gpint_ref,
                      beta_ref, eps_ref,
                      eps_out, beta_out,
                      rb_sc, dpos_sc, dlane_sc,
                      *, B, TN, J, packed=False,
                      srow_ref=None, msrow_ref=None, xsum_ref=None,
                      esum0_ref=None, sms_sc=None, fold_sc=None):
    """Jacobi-batched horseshoe sweep: J blocks of ONE chain per serial
    step (src/HorseshoeR.cpp:219-240).  Identical phase structure to
    _jacobi_kernel minus the selection loop and label/v/bacc outputs --
    the per-step dependent chain is just num -> beta -> rank-1."""
    r = pl.program_id(0)
    ph = pl.program_id(1)
    j = pl.program_id(2)
    t = pl.program_id(3)
    f32 = jnp.float32
    fold = srow_ref is not None

    def onehot_p(jj):
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        return (sub == inner_ref[0, pl.ds(jj, 1), :]).astype(f32)

    if packed:
        SUB, W = 16, TN // 16

        def x_sub(k):
            c = (xt_ref[...] >> (2 * k)) & 3                  # (B, W) int32
            return c.astype(f32)
    else:
        SUB, W = 1, TN

        def x_sub(k):
            if fold and xt_ref.dtype != jnp.float32:
                return xt_ref[...].astype(f32)
            return xt_ref[...]

    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    # codes/int8 are bf16-exact -> 2-pass split dot; decoded/dense f32
    # falls back to the 3-pass bf16x3 expansion (see _dot2_rows)
    x_exact = fold and (packed or xt_ref.dtype != jnp.float32)
    first = jnp.logical_and(
        r == 0, jnp.logical_and(ph == 0, jnp.logical_and(j == 0, t == 0)))

    @pl.when(first)
    def _init():
        eps_out[...] = eps_ref[...]
        if fold:
            fold_sc[0:1, :] = jnp.full((1, 1), esum0_ref[0], f32)

    @pl.when(jnp.logical_and(ph == 0, t == 0))
    def _per_block_precompute():
        pj = onehot_p(j)
        rb_sc[pl.ds(J + j, 1), :] = jax.lax.dot_general(
            beta_ref[0], pj, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        rb_sc[pl.ds(j, 1), :] = jnp.zeros((1, B), f32)
        if fold:
            sms_sc[pl.ds(j, 1), :] = srow_ref[0]
            sms_sc[pl.ds(J + j, 1), :] = msrow_ref[0]
            sms_sc[pl.ds(2 * J + j, 1), :] = xsum_ref[0]

    @pl.when(ph == 0)
    def _accumulate_r():
        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]      # (1, W)
            rb_sc[pl.ds(j, 1), :] += _dot2_rows(eps_t, x_sub(k), 1, x_exact)

    @pl.when(jnp.logical_and(ph == 1, jnp.logical_and(j == 0, t == 0)))
    def _solve():
        dpos_sc[...] = jnp.zeros_like(dpos_sc)
        if fold:
            es = fold_sc[0, 0]
            rb_sc[0:J, :] = (rb_sc[0:J, :] * sms_sc[0:J, :]
                             - sms_sc[J:2 * J, :] * es)
        for jj in range(J):
            rb_sc[pl.ds(jj, 1), :] = jax.lax.dot_general(
                rb_sc[jj:jj + 1, :], onehot_p(jj),
                (((1,), (0,)), ((), ())), preferred_element_type=f32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

        def body(s, _):
            row = pkg_ref[0, pl.ds(s * J, J), :]              # (J, 5)
            invd = row[:, 0:1]
            sd = row[:, 1:2]
            z_s = row[:, 2:3]
            xsq_j = row[:, 3:4]
            okf = row[:, 4:5]

            maskf = (lane == s).astype(f32)                   # (1, B)
            both = jnp.sum(rb_sc[...] * maskf, axis=1, keepdims=True)
            r_jl = both[0:J, :]                               # (J, 1)
            beta_old = both[J:2 * J, :]

            num = r_jl + beta_old * xsq_j                     # (J, 1)
            beta_new = num * invd + sd * z_s
            d = okf * (beta_new - beta_old)                   # (J, 1)

            A = gpint_ref[0, pl.ds(s * J, J), :]              # (J, B)
            rb_sc[0:J, :] -= A * d
            dpos_sc[...] += maskf * d                         # (J, B)
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)

        for jj in range(J):
            dlane_sc[pl.ds(jj, 1), :] = jax.lax.dot_general(
                dpos_sc[jj:jj + 1, :], onehot_p(jj),
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
        if fold:
            dl = dlane_sc[...]                                # (J, B)
            sub = jnp.sum(dl * sms_sc[2 * J:3 * J, :], axis=1, keepdims=True)
            fold_sc[0:1, :] -= jnp.sum(sub, axis=0, keepdims=True)
            fold_sc[1:1 + J, :] = jnp.sum(dl * sms_sc[J:2 * J, :], axis=1,
                                          keepdims=True)
            dlane_sc[...] = dl * sms_sc[0:J, :]

    @pl.when(jnp.logical_and(ph == 1, t == 0))
    def _reconstruct_block():
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
                  == j).astype(f32)
        dlane_j = jax.lax.dot_general(
            jnp.sum(dpos_sc[...] * rowsel, axis=0, keepdims=True),
            onehot_p(j),
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # (1, B)
        beta_out[0] = beta_ref[0] + dlane_j

    @pl.when(ph == 1)
    def _apply_update():
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
                  == j).astype(f32)
        dl = jnp.sum(dlane_sc[...] * rowsel, axis=0, keepdims=True)  # (1, B)
        for k in range(SUB):
            upd = _dot2_rows(dl, x_sub(k), 0, x_exact)
            if fold:
                upd = upd - fold_sc[pl.ds(1 + j, 1), :]
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def _hs_jacobi_kernel_f(border_ref, xt_ref, inner_ref, pkg_ref, gpint_ref,
                        beta_ref, eps_ref,
                        srow_ref, msrow_ref, xsum_ref, esum0_ref,
                        eps_out, beta_out,
                        rb_sc, dpos_sc, dlane_sc,
                        sms_sc, fold_sc, *, B, TN, J, packed=False):
    """Fold-affine positional-argument adapter (see _jacobi_kernel_f)."""
    return _hs_jacobi_kernel(border_ref, xt_ref, inner_ref, pkg_ref,
                             gpint_ref, beta_ref, eps_ref,
                             eps_out, beta_out,
                             rb_sc, dpos_sc, dlane_sc,
                             B=B, TN=TN, J=J, packed=packed,
                             srow_ref=srow_ref, msrow_ref=msrow_ref,
                             xsum_ref=xsum_ref, esum0_ref=esum0_ref,
                             sms_sc=sms_sc, fold_sc=fold_sc)


def horseshoe_jacobi_pallas(XT_pad, gram, xsq_pad, eps, beta_pad,
                            block_order, inner_perm, z_arr,
                            lam_pad, tau, c2, sigmaE, valid_pad,
                            *, J: int = 8, tile_n: int = 512,
                            interpret: bool = False,
                            x_mean=None, x_scale=None, x_xsum=None,
                            fold_affine: bool = False, row_valid=None):
    """Jacobi-batched drop-in for horseshoe_sweep_pallas (J blocks/round).

    Same argument conventions as ops.pallas_sweep.horseshoe_sweep_pallas;
    supports dense f32 X and the fold-affine raw-code paths (int8 / 2-bit
    packed, no real missing calls).  J must divide the block count.
    Semantics: exact sequential within each block, block-Jacobi across the
    J blocks of a round (see the module docstring); J=1 equals the serial
    kernel's math exactly.
    """
    nb, B, _ = gram.shape
    if nb % J:
        raise ValueError(f"jacobi sweep needs J | nb (J={J}, nb={nb})")
    nr = nb // J
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if quantized and not fold:
        raise ValueError("jacobi sweep supports dense or fold-affine "
                         "quantized X only (missing calls: use the "
                         "single-chain kernel)")
    f32 = jnp.float32
    if packed:
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        if Npad % 2048 or eps.shape[0] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        TN = _packed_tile_n(Npad, B, J, 5)
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
    nt = Npad // TN

    pkg, inner_sel = build_pkg_hs_jacobi(
        xsq_pad, valid_pad, z_arr, lam_pad, tau, c2, sigmaE,
        block_order, inner_perm, B=B, J=J)
    border = block_order.astype(jnp.int32)
    gp_int = _build_gp_interleaved(gram, border, inner_sel, B=B, J=J)
    beta2 = beta_pad.astype(f32).reshape(nb, 1, B)

    def im_xt(r, ph, j, t, border_ref):
        return (border_ref[r * J + j], t)

    def im_blk3(r, ph, j, t, border_ref):
        return (border_ref[r * J + j], 0, 0)

    def im_round(r, ph, j, t, border_ref):
        return (r, 0, 0)

    def im_full(r, ph, j, t, border_ref):
        return (0, 0)

    def im_pos3(r, ph, j, t, border_ref):
        return (r * J + j, 0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = [
        pl.BlockSpec((B, x_tile_w), im_xt),                   # xt
        pl.BlockSpec((1, J, B), im_round),                    # inner perms
        pl.BlockSpec((1, B * J, 5), im_round),                # pkg
        pl.BlockSpec((1, B * J, B), im_round),                # Gp interleaved
        pl.BlockSpec((1, 1, B), im_blk3),                     # beta
        pl.BlockSpec((1, Npad), im_full),                     # eps
    ]
    args = [xt, inner_sel, pkg, gp_int, beta2, eps2d]
    scratch = [
        pltpu.VMEM((2 * J, B), f32),                          # r ; beta0
        pltpu.VMEM((J, B), f32),                              # delta (pos)
        pltpu.VMEM((J, B), f32),                              # delta (lane)
    ]
    if fold:
        row_b = functools.partial(pl.BlockSpec, (1, 1, B), im_blk3)
        srow3 = x_scale.astype(f32).reshape(nb, 1, B)
        msrow3 = (x_mean.astype(f32) * x_scale.astype(f32)).reshape(nb, 1, B)
        xsum3 = x_xsum.astype(f32).reshape(nb, 1, B)
        in_specs += [row_b(), row_b(), row_b(),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]   # esum0 (1,)
        args += [srow3, msrow3, xsum3, jnp.sum(eps2d, axis=1)]
        scratch += [pltpu.VMEM((3 * J, B), f32),              # srow;msrow;xsum
                    pltpu.VMEM((1 + J, 1), f32)]              # esum ; dms_j
    out_specs = [
        pl.BlockSpec((1, Npad), im_full),                     # eps_out
        pl.BlockSpec((1, 1, B), im_pos3),                     # beta_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), f32),
        jax.ShapeDtypeStruct((nb, 1, B), f32),
    ]
    kernel = functools.partial(
        _hs_jacobi_kernel_f if fold else _hs_jacobi_kernel,
        B=B, TN=TN, J=J, packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, J, nt),
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
        eps_o = eps_o * lane_mask  # re-zero drifted pad lanes
    lane = jnp.arange(B, dtype=border.dtype)
    idx = (border[:, None] * B + lane[None, :]).reshape(-1)
    beta_flat = jnp.zeros((Mpad,), f32).at[idx].set(beta_o.reshape(-1))
    return (eps_o[0, :N].astype(eps.dtype),
            beta_flat.astype(beta_pad.dtype))


def bayesr_jacobi_pallas(XT_pad, gram, xsq_pad, eps, beta_pad, labels_pad,
                         block_order, inner_perm, p_arr, z_arr,
                         pi, cva, sigmaE, sigmaGG, g_assign_pad, valid_pad,
                         *, J: int = 8, tile_n: int = 512,
                         interpret: bool = False,
                         x_mean=None, x_scale=None, x_xsum=None,
                         fold_affine: bool = False, row_valid=None):
    """Jacobi-batched drop-in for bayesr_sweep_pallas (J blocks per round).

    Same argument conventions as ops.pallas_sweep.bayesr_sweep_pallas;
    supports dense f32 X and the fold-affine raw-code paths (int8 / 2-bit
    packed, no real missing calls).  J must divide the block count.
    """
    nb, B, _ = gram.shape
    if nb % J:
        raise ValueError(f"jacobi sweep needs J | nb (J={J}, nb={nb})")
    nr = nb // J
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if quantized and not fold:
        raise ValueError("jacobi sweep supports dense or fold-affine "
                         "quantized X only (missing calls: use the "
                         "single-chain kernel)")
    f32 = jnp.float32
    if packed:
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        if Npad % 2048 or eps.shape[0] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        TN = _packed_tile_n(Npad, B, J, 3 * pi.shape[1] + 4)
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
    nt = Npad // TN
    G, K = pi.shape
    F = 3 * K + 4

    pkg, inner_sel = build_pkg_jacobi(
        xsq_pad, g_assign_pad, valid_pad, p_arr, z_arr, pi, cva,
        sigmaE, sigmaGG, block_order, inner_perm, B=B, J=J)
    border = block_order.astype(jnp.int32)
    gp_int = _build_gp_interleaved(gram, border, inner_sel, B=B, J=J)
    beta2 = beta_pad.astype(f32).reshape(nb, 1, B)
    labels2 = labels_pad.astype(jnp.int32).reshape(nb, 1, B)
    gasr3 = g_assign_pad.astype(jnp.int32).reshape(nb, 1, B)
    se1 = sigmaE.astype(f32).reshape(1)

    def im_xt(r, ph, j, t, border_ref):
        return (border_ref[r * J + j], t)

    def im_blk3(r, ph, j, t, border_ref):
        return (border_ref[r * J + j], 0, 0)

    def im_round(r, ph, j, t, border_ref):
        return (r, 0, 0)

    def im_full(r, ph, j, t, border_ref):
        return (0, 0)

    def im_pos3(r, ph, j, t, border_ref):
        return (r * J + j, 0, 0)

    x_tile_w = TN // 16 if packed else TN
    in_specs = [
        pl.BlockSpec((B, x_tile_w), im_xt),                # xt
        pl.BlockSpec((1, J, B), im_round),                 # inner perms
        pl.BlockSpec((1, B * J, F), im_round),             # pkg
        pl.BlockSpec((1, B * J, B), im_round),             # Gp interleaved
        pl.BlockSpec((1, 1, B), im_blk3),                  # gas row
        pl.BlockSpec((1, 1, B), im_blk3),                  # beta
        pl.BlockSpec((1, 1, B), im_blk3),                  # labels
        pl.BlockSpec((1, Npad), im_full),                  # eps
        pl.BlockSpec(memory_space=pltpu.SMEM),             # sigmaE (1,)
    ]
    args = [xt, inner_sel, pkg, gp_int, gasr3, beta2, labels2, eps2d, se1]
    scratch = [
        pltpu.VMEM((2 * J, B), f32),                       # r ; beta0
        pltpu.VMEM((J, B), f32),                           # delta (pos)
        pltpu.VMEM((J, B), f32),                           # krec (pos)
        pltpu.VMEM((J, B), f32),                           # delta (lane)
    ]
    if fold:
        row_b = functools.partial(pl.BlockSpec, (1, 1, B), im_blk3)
        srow3 = x_scale.astype(f32).reshape(nb, 1, B)
        msrow3 = (x_mean.astype(f32) * x_scale.astype(f32)).reshape(nb, 1, B)
        xsum3 = x_xsum.astype(f32).reshape(nb, 1, B)
        in_specs += [row_b(), row_b(), row_b(),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]  # esum0 (1,)
        args += [srow3, msrow3, xsum3, jnp.sum(eps2d, axis=1)]
        scratch += [pltpu.VMEM((3 * J, B), f32),           # srow;msrow;xsum
                    pltpu.VMEM((1 + J, 1), f32)]           # esum ; dms_j
    out_specs = [
        pl.BlockSpec((1, Npad), im_full),                  # eps_out
        pl.BlockSpec((1, 1, B), im_pos3),                  # beta_out
        pl.BlockSpec((1, 1, B), im_pos3),                  # labels_out
        pl.BlockSpec((1, G * K), im_full),                 # v_out
        pl.BlockSpec((1, G), im_full),                     # bacc_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), f32),
        jax.ShapeDtypeStruct((nb, 1, B), f32),
        jax.ShapeDtypeStruct((nb, 1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, G * K), f32),
        jax.ShapeDtypeStruct((1, G), f32),
    ]
    kernel = functools.partial(_jacobi_kernel_f if fold else _jacobi_kernel,
                               B=B, TN=TN, K=K, G=G, J=J, packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr, 2, J, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    eps_o, beta_o, labels_o, v_o, bacc_o = pl.pallas_call(
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
    # beta/labels rows are position-ordered (row p = block border[p]);
    # scatter back to the marker layout
    lane = jnp.arange(B, dtype=border.dtype)
    idx = (border[:, None] * B + lane[None, :]).reshape(-1)
    beta_flat = jnp.zeros((Mpad,), f32).at[idx].set(beta_o.reshape(-1))
    labels_flat = jnp.zeros((Mpad,), jnp.int32).at[idx].set(
        labels_o.reshape(-1))
    return SweepResult(
        eps=eps_o[0, :N].astype(eps.dtype),
        beta=beta_flat.astype(beta_pad.dtype),
        labels=labels_flat,
        v=v_o.reshape(G, K).astype(eps.dtype),
        beta_acum=bacc_o[0].astype(eps.dtype),
    )
