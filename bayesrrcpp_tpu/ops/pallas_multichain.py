"""Fused multi-chain Pallas sweep: C Gibbs chains in one kernel invocation.

The reference runs one chain per R process (src/BayesRv2.cpp:171); users who
want the standard >=4-chain R-hat workflow pay the full chain cost per chain.
On TPU the single-chain sweep kernel wastes 7/8 of every vector register: all
per-step state is (1, B) rows on an 8-sublane VPU, and the r/update matmuls
feed the 128x128 MXU one row of eps at a time.

This kernel batches C chains on the SUBLANE axis:

- r, delta, krec and the residual eps are (C, B)/(C, Npad) arrays -- for
  C <= 8 they occupy exactly the same vector registers as the single-chain
  (1, B) rows, so the ~50-op sequential marker update costs the same wall
  time for 8 chains as for one;
- X (shared by all chains -- same data, independent states) is streamed from
  HBM ONCE for all C chains, and the Gram blocks are shared;
- the r-pass / update-pass matmuls become (C, N) x (N, B), putting C rows
  through the MXU instead of one.

Layout decisions (all forced by the dynamic-index-on-sublanes rule):

- per-(chain, marker) quantities that the sequential loop reads -- the K
  log-priors, reciprocal denominators and slab sds (functions of the
  per-chain hypers sigmaE/sigmaGG/pi and the per-marker xsq/group), plus the
  0.5/sigmaE scalar and the p/z variates -- are precomputed OUTSIDE the
  kernel (plain XLA, vectorised over everything) into a packed
  (nb, B*C, 3K+3) operand whose row j*C + c holds marker j / chain c.  One
  dynamic sublane slice [jl*C : jl*C + C] yields the (C, 3K+3) tile for all
  chains of the current marker; C=8 keeps those slices tile-aligned.
- beta_old is mask-gathered from the block's (C, B) input (each marker is
  visited exactly once per sweep, so its pre-block value is its current
  value), and the new betas are reconstructed at block end as beta + delta;
  labels are reconstructed from a (C, B) krec scratch (-1 = no draw taken,
  matching the reference's fall-through case, src/BayesRv2.cpp:222-242).
- component counts v and the per-group slab sum-of-squares accumulate at
  block end from krec/beta (off the sequential chain).

Randomness is MARKER-indexed here ((C, Mpad) p/z drawn outside), not
position-indexed like the single-chain kernel -- an equally valid iid
assignment; tests remap one onto the other to prove step equality.

The marker visit order (border/inner permutations) is shared across chains:
states never interact and the order is drawn independently of all states, so
each chain remains a valid random-scan Gibbs sampler and chains stay
mutually independent (their p/z streams are independent).

Reference semantics per update: src/BayesRv2.cpp:186-245 (see
ops/selection.py for the selection quirks reproduced here).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _decode_tile
from .pallas_jacobi_t import _dot2_rows


class MCSweepResult(NamedTuple):
    eps: jax.Array        # (C, Npad-or-N)
    beta: jax.Array       # (C, Mpad)
    labels: jax.Array     # (C, Mpad) int32
    v: jax.Array          # (C, G, K)
    beta_acum: jax.Array  # (C, G)


def build_pkg(xsq, gas, p, z, pi, cva, sigmaE, sigmaGG, *, B):
    """Per-iteration packed operand (nb, B*C, 3K+2), row j*C + c =
    [lp(K), 1/denom(K, spike col 0), sd(K, spike col 0), p, z] for marker j
    (within-block), chain c.  Marker-shared scalars (xsq, valid) and the
    chain constant 0.5/sigmaE stay OUT of the row: lane-offset extracts are
    ~45 cycles each on the VPU, so the serial loop keeps only the five
    unavoidable per-(marker,chain) slices.

    Same formulas as the single-chain kernel's per-block precompute
    (denominators: src/BayesRv2.cpp:199; log-marginals: :207-211)."""
    f32 = jnp.float32
    C = sigmaE.shape[0]
    Mpad = xsq.shape[0]
    K = pi.shape[-1]
    xsq = xsq.astype(f32)
    sG = jnp.take(sigmaGG.astype(f32), gas, axis=1)        # (C, Mpad)
    cva_m = jnp.take(cva.astype(f32), gas, axis=0)         # (Mpad, K-1)
    sE = sigmaE.astype(f32)[:, None, None]                 # (C, 1, 1)
    denom = (xsq[None, :, None]
             + (sE / sG[:, :, None]) / cva_m[None])        # (C, Mpad, K-1)
    zero = jnp.zeros((C, Mpad, 1), f32)
    invd = jnp.concatenate([zero, 1.0 / denom], axis=2)
    sd = jnp.concatenate([zero, jnp.sqrt(sE / denom)], axis=2)
    tiny = jnp.finfo(f32).tiny
    logpi = jnp.log(jnp.maximum(
        jnp.take(pi.astype(f32), gas, axis=1), tiny))      # (C, Mpad, K)
    lp = jnp.concatenate([
        logpi[..., 0:1],
        logpi[..., 1:] - 0.5 * jnp.log(
            (sG[:, :, None] / sE) * xsq[None, :, None] * cva_m[None] + 1.0),
    ], axis=2)
    pkg = jnp.concatenate([
        lp, invd, sd,
        p.astype(f32)[..., None], z.astype(f32)[..., None],
    ], axis=2)
    F = 3 * K + 2
    nb = Mpad // B
    # (C, Mpad, F) -> (nb, B*C, F) with row j*C + c
    return pkg.transpose(1, 0, 2).reshape(nb, B * C, F)


def _mc_kernel(border_ref, inner_ref,               # scalar prefetch (SMEM)
               xt_ref, pkg_ref, gram_ref, xsq_ref, gasr_ref, valid_ref,
               hse_ref, beta_ref, labels_ref, eps_ref,
               eps_out, beta_out, labels_out, v_out, bacc_out,
               r_sc, delta_sc, krec_sc, *, B, TN, K, G, C, packed=False,
               srow_ref=None, msrow_ref=None, xsum_ref=None,
               esum0_ref=None, esum_sc=None, dms_sc=None):
    b = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    f32 = jnp.float32
    fold = srow_ref is not None

    if packed:
        SUB, W = 16, TN // 16

        def x_sub(k):
            c = (xt_ref[...] >> (2 * k)) & 3           # (B, W) int32
            return c.astype(f32)
    else:
        SUB, W = 1, TN

        def x_sub(k):
            return xt_ref[...]

    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    # codes/int8 are bf16-exact -> 2-pass split dot; decoded/dense f32
    # falls back to the 3-pass bf16x3 expansion (see _dot2_rows)
    x_exact = fold and (packed or xt_ref.dtype != jnp.float32)
    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(ph == 0, t == 0)))
    def _init():
        eps_out[...] = eps_ref[...]
        v_out[...] = jnp.zeros_like(v_out)
        bacc_out[...] = jnp.zeros_like(bacc_out)
        if fold:
            esum_sc[...] = esum0_ref[...]

    @pl.when(ph == 0)
    def _accumulate_r():
        @pl.when(t == 0)
        def _():
            r_sc[0:C, :] = jnp.zeros((C, B), f32)

        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]   # (C, W)
            r_sc[0:C, :] += _dot2_rows(eps_t, x_sub(k), 1, x_exact)

    @pl.when(jnp.logical_and(ph == 1, t == 0))
    def _solve():
        delta_sc[...] = jnp.zeros_like(delta_sc)
        krec_sc[...] = jnp.full((C, B), -1.0, f32)
        if fold:
            r_sc[0:C, :] = (r_sc[0:C, :] * srow_ref[0]
                            - msrow_ref[0] * esum_sc[...])
        # r and the pre-block betas stacked in ONE (2C, B) scratch: the
        # per-step gathers of r_jl and beta_old fuse into a single
        # mask-multiply + lane reduction
        r_sc[C:2 * C, :] = beta_ref[...]
        hse = hse_ref[...]                                  # (C, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        Kf = jnp.float32(K)

        def body(s, _):
            jl = inner_ref[b, s]
            dsj = pl.ds(jl, 1)
            row = pkg_ref[0, pl.ds(jl * C, C), :]           # (C, 3K+2)
            lp = row[:, 0:K]
            invd = row[:, K:2 * K]
            sd = row[:, 2 * K:3 * K]
            p_s = row[:, 3 * K:3 * K + 1]
            z_s = row[:, 3 * K + 1:3 * K + 2]
            xsq_j = xsq_ref[0, dsj, :]                      # (1, 1)
            okf = valid_ref[0, dsj, :]                      # (1, 1) f32

            maskf = (lane == jl).astype(f32)                # (1, B)
            both = jnp.sum(r_sc[...] * maskf, axis=1, keepdims=True)
            r_jl = both[0:C, :]                             # (C, 1)
            beta_old = both[C:2 * C, :]

            num = r_jl + beta_old * xsq_j                   # (C, 1)
            muk = num * invd                                # (C, K), col0=0
            logL = lp + (hse * num) * muk                   # (C, K)
            logLs = logL[:, 1:]

            # reference categorical draw with overflow guard, unrolled over
            # K; every op is (C, 1)/(C, K) so all chains draw in lockstep
            k_sel = jnp.full((C, 1), Kf, f32)
            acum = jnp.zeros((C, 1), f32)
            for k in range(K):
                lk = logL[:, k:k + 1]
                guard = jnp.max(jnp.abs(logLs - lk), axis=1,
                                keepdims=True) > 700.0
                Ssum = jnp.sum(jnp.exp(logL - lk), axis=1, keepdims=True)
                w = jnp.where(guard, jnp.zeros((C, 1), f32), 1.0 / Ssum)
                acum = acum + w
                hit = jnp.logical_and(p_s <= acum, k_sel == Kf)
                k_sel = jnp.where(hit, jnp.float32(k), k_sel)
            hitm = k_sel < Kf

            selm = (kcol.astype(f32) == k_sel).astype(f32)  # (C, K)
            mu_sel = jnp.sum(muk * selm, axis=1, keepdims=True)
            sd_sel = jnp.sum(sd * selm, axis=1, keepdims=True)
            beta_drawn = mu_sel + sd_sel * z_s              # spike: exact 0
            beta_new = jnp.where(hitm, beta_drawn, beta_old)
            d = okf * (beta_new - beta_old)                 # (C, 1)

            r_sc[0:C, :] -= gram_ref[0, dsj, :] * d         # (1,B)x(C,1)
            delta_sc[...] += maskf * d
            take = okf * hitm.astype(f32)
            kv = jnp.where(take > 0, k_sel, jnp.float32(-1.0))
            krec_sc[...] += maskf * (kv + 1.0)              # lane jl := kv
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)

        # ---- block-end reconstruction (vectorised, off the serial chain)
        beta_new_b = beta_ref[...] + delta_sc[...]          # (C, B)
        beta_out[0] = beta_new_b
        krec = krec_sc[...]
        labels_out[0] = jnp.where(krec >= 0.0, krec.astype(jnp.int32),
                                  labels_ref[...])
        gas_row = gasr_ref[0]                               # (1, B) int32
        slab2 = jnp.where(krec > 0.0, beta_new_b * beta_new_b, 0.0)
        vcols = []
        bcols = []
        for g in range(G):
            gm = (gas_row == g).astype(f32)                 # (1, B)
            for k in range(K):
                km = (krec == jnp.float32(k)).astype(f32)   # (C, B)
                vcols.append(jnp.sum(km * gm, axis=1, keepdims=True))
            bcols.append(jnp.sum(slab2 * gm, axis=1, keepdims=True))
        v_out[...] += jnp.concatenate(vcols, axis=1)        # (C, G*K)
        bacc_out[...] += jnp.concatenate(bcols, axis=1)     # (C, G)
        if fold:
            esum_sc[...] -= jnp.sum(delta_sc[...] * xsum_ref[0], axis=1,
                                    keepdims=True)
            dms_sc[...] = jnp.sum(delta_sc[...] * msrow_ref[0], axis=1,
                                  keepdims=True)
            delta_sc[...] = delta_sc[...] * srow_ref[0]

    @pl.when(ph == 1)
    def _apply_update():
        for k in range(SUB):
            upd = _dot2_rows(delta_sc[...], x_sub(k), 0, x_exact)
            if fold:
                upd = upd - dms_sc[...]
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def _mc_call(border, inner, xt, pkg, gram, xsq3, gasr3, valid3, hse2,
             beta2, labels2, eps2, *, B, TN, K, G, C, interpret,
             packed=False, fold=False, srow3=None, msrow3=None, xsum3=None,
             esum0=None):
    nb_call = border.shape[0]
    Npad = eps2.shape[1]
    nt = Npad // TN
    Mpad = beta2.shape[1]

    def im_b3(b, ph, t, border_ref, inner_ref):
        return (border_ref[b], 0, 0)

    def im_cb(b, ph, t, border_ref, inner_ref):
        return (0, border_ref[b])

    def im_xt(b, ph, t, border_ref, inner_ref):
        return (border_ref[b], t)

    def im_full(b, ph, t, border_ref, inner_ref):
        return (0, 0)

    def im_pos3(b, ph, t, border_ref, inner_ref):
        return (b, 0, 0)

    x_tile_w = TN // 16 if packed else TN
    F = 3 * K + 2
    in_specs = [
        pl.BlockSpec((B, x_tile_w), im_xt),                 # xt
        pl.BlockSpec((1, B * C, F), im_b3),                 # pkg
        pl.BlockSpec((1, B, B), im_b3),                     # gram
        pl.BlockSpec((1, B, 1), im_b3),                     # xsq (col)
        pl.BlockSpec((1, 1, B), im_b3),                     # gas (row)
        pl.BlockSpec((1, B, 1), im_b3),                     # valid (col f32)
        pl.BlockSpec((C, 1), im_full),                      # 0.5/sigmaE
        pl.BlockSpec((C, B), im_cb),                        # beta
        pl.BlockSpec((C, B), im_cb),                        # labels
        pl.BlockSpec((C, Npad), im_full),                   # eps
    ]
    args = [xt, pkg, gram, xsq3, gasr3, valid3, hse2, beta2, labels2, eps2]
    if fold:
        row_b = functools.partial(pl.BlockSpec, (1, 1, B), im_b3)
        in_specs += [row_b(), row_b(), row_b(),             # srow, msrow, xsum
                     pl.BlockSpec((C, 1), im_full)]         # esum0
        args += [srow3, msrow3, xsum3, esum0]
    out_specs = [
        pl.BlockSpec((C, Npad), im_full),                   # eps_out
        pl.BlockSpec((1, C, B), im_pos3),                   # beta_out
        pl.BlockSpec((1, C, B), im_pos3),                   # labels_out
        pl.BlockSpec((C, G * K), im_full),                  # v_out
        pl.BlockSpec((C, G), im_full),                      # bacc_out
    ]
    out_shape = [
        jax.ShapeDtypeStruct((C, Npad), jnp.float32),
        jax.ShapeDtypeStruct((nb_call, C, B), jnp.float32),
        jax.ShapeDtypeStruct((nb_call, C, B), jnp.int32),
        jax.ShapeDtypeStruct((C, G * K), jnp.float32),
        jax.ShapeDtypeStruct((C, G), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((2 * C, B), jnp.float32),                # r ; beta0
        pltpu.VMEM((C, B), jnp.float32),                    # delta
        pltpu.VMEM((C, B), jnp.float32),                    # krec
    ] + ([pltpu.VMEM((C, 1), jnp.float32),                  # sum(eps)/chain
          pltpu.VMEM((C, 1), jnp.float32)]                  # delta.(m*s)
         if fold else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_call, 2, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_mc_kernel, B=B, TN=TN, K=K, G=G, C=C,
                               packed=packed)
    if fold:
        kernel = functools.partial(
            _mc_kernel, B=B, TN=TN, K=K, G=G, C=C, packed=packed)

        def kernel(border_ref, inner_ref, xt_ref, pkg_ref, gram_ref,
                   xsq_ref, gasr_ref, valid_ref, hse_ref,
                   beta_ref, labels_ref, eps_ref,
                   srow_ref, msrow_ref, xsum_ref, esum0_ref,
                   eps_out, beta_out, labels_out, v_out, bacc_out,
                   r_sc, delta_sc, krec_sc, esum_sc, dms_sc):
            return _mc_kernel(
                border_ref, inner_ref, xt_ref, pkg_ref, gram_ref,
                xsq_ref, gasr_ref, valid_ref, hse_ref,
                beta_ref, labels_ref, eps_ref,
                eps_out, beta_out, labels_out, v_out, bacc_out,
                r_sc, delta_sc, krec_sc, B=B, TN=TN, K=K, G=G, C=C,
                packed=packed, srow_ref=srow_ref, msrow_ref=msrow_ref,
                xsum_ref=xsum_ref, esum0_ref=esum0_ref,
                esum_sc=esum_sc, dms_sc=dms_sc)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(border, inner, *args)


def bayesr_sweep_pallas_mc(XT_pad, gram, xsq_pad, eps, beta_pad, labels_pad,
                           block_order, inner_perm, p_arr, z_arr,
                           pi, cva, sigmaE, sigmaGG, g_assign_pad, valid_pad,
                           *, tile_n: int = 512, interpret: bool = False,
                           x_mean=None, x_scale=None, max_call_blocks=None,
                           x_xsum=None, fold_affine: bool = False,
                           row_valid=None):
    """C-chain fused sweep.  Batched leaves carry a leading chain axis:
    eps (C, N-or-Npad), beta/labels (C, Mpad), p/z (C, Mpad) MARKER-indexed,
    pi (C, G, K), sigmaE (C,), sigmaGG (C, G).  X/gram/xsq/valid are shared.

    Quantized X is supported only via fold_affine (no-missing data); the
    in-kernel per-element decode variant of the single-chain kernel is not
    replicated here -- use x_dtype='dense' or missing-free dosages.
    """
    nb, B, _ = gram.shape
    f32 = jnp.float32
    C = eps.shape[0]
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if quantized and not fold:
        raise NotImplementedError(
            "multi-chain sweep supports quantized X only with fold_affine "
            "(no missing calls); decode-in-kernel is single-chain only")
    if packed:
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        TN = 2048
        if Npad % TN or eps.shape[1] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        N = Npad
        xt = XT_pad
        eps2 = eps.astype(f32)
    else:
        Mpad, N = XT_pad.shape
        TN = min(tile_n, max(128, 1 << (N - 1).bit_length()))
        Npad = -(-N // TN) * TN
        eps2 = jnp.zeros((C, Npad), f32).at[:, :N].set(eps.astype(f32))
        xt = (XT_pad if Npad == N
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N))))
        if quantized:   # fold-affine int8: raw codes feed the MXU directly
            xt = xt.astype(f32) if xt.dtype == jnp.int8 else xt

    G, K = (pi.shape[1], pi.shape[2])
    n_rounds = block_order.shape[0]
    inner_by_pos = inner_perm[block_order]
    if p_arr.shape != (C, Mpad):
        raise ValueError("multi-chain p/z must be (C, Mpad), marker-indexed")

    pkg = build_pkg(xsq_pad, g_assign_pad, p_arr, z_arr, pi, cva,
                    sigmaE, sigmaGG, B=B)

    xsq3 = xsq_pad.astype(f32).reshape(nb, B, 1)
    gasr3 = g_assign_pad.astype(jnp.int32).reshape(nb, 1, B)
    valid3 = valid_pad.astype(f32).reshape(nb, B, 1)
    hse2 = (0.5 / sigmaE.astype(f32)).reshape(C, 1)
    beta2 = beta_pad.astype(f32)                            # (C, Mpad)
    labels2 = labels_pad.astype(jnp.int32)
    if fold:
        srow3 = x_scale.astype(f32).reshape(nb, 1, B)
        msrow3 = (x_mean.astype(f32) * x_scale.astype(f32)).reshape(nb, 1, B)
        xsum3 = x_xsum.astype(f32).reshape(nb, 1, B)
        if packed:
            if row_valid is None:
                raise ValueError("packed fold_affine needs row_valid")
            lane_mask = row_valid.astype(f32).reshape(1, Npad)
        else:
            lane_mask = (jnp.arange(Npad) < N).astype(f32).reshape(1, Npad)
    else:
        srow3 = msrow3 = xsum3 = lane_mask = None

    border_i = block_order.astype(jnp.int32)
    inner_i = inner_by_pos.astype(jnp.int32)
    CB = max(1, min(n_rounds, max_call_blocks or (65536 // B)))

    v_tot = jnp.zeros((C, G * K), f32)
    bacc_tot = jnp.zeros((C, G), f32)
    lane = jnp.arange(B, dtype=border_i.dtype)

    call = functools.partial(_mc_call, B=B, TN=TN, K=K, G=G, C=C,
                             interpret=interpret, packed=packed, fold=fold)

    def run_chunk(carry, xs):
        eps2, beta2, labels2, v_tot, bacc_tot = carry
        border_c, inner_c = xs
        cb = border_c.shape[0]
        esum0 = (jnp.sum(eps2, axis=1, keepdims=True) if fold else None)
        out = call(border_c, inner_c, xt, pkg, gram, xsq3, gasr3, valid3,
                   hse2, beta2, labels2, eps2, srow3=srow3, msrow3=msrow3,
                   xsum3=xsum3, esum0=esum0)
        eps2, beta_c, labels_c, v_c, bacc_c = out
        if fold:
            eps2 = eps2 * lane_mask
        idx = (border_c[:, None] * B + lane[None, :]).reshape(-1)
        beta2 = beta2.at[:, idx].set(
            beta_c.transpose(1, 0, 2).reshape(C, cb * B))
        labels2 = labels2.at[:, idx].set(
            labels_c.transpose(1, 0, 2).reshape(C, cb * B))
        return (eps2, beta2, labels2, v_tot + v_c, bacc_tot + bacc_c), None

    carry = (eps2, beta2, labels2, v_tot, bacc_tot)
    rem = n_rounds % CB
    if rem:
        carry, _ = run_chunk(carry, (border_i[:rem], inner_i[:rem]))
    n_uniform = (n_rounds - rem) // CB
    if n_uniform == 1:
        carry, _ = run_chunk(carry, (border_i[rem:], inner_i[rem:]))
    elif n_uniform > 1:
        xs = (border_i[rem:].reshape(n_uniform, CB),
              inner_i[rem:].reshape(n_uniform, CB, B))
        carry, _ = lax.scan(run_chunk, carry, xs)
    eps2, beta2, labels2, v_tot, bacc_tot = carry

    return MCSweepResult(
        eps=eps2[:, :N].astype(eps.dtype) if not packed else
            eps2.astype(eps.dtype),
        beta=beta2.astype(beta_pad.dtype),
        labels=labels2,
        v=v_tot.reshape(C, G, K).astype(eps.dtype),
        beta_acum=bacc_tot.astype(eps.dtype),
    )


# --------------------------------------------------------------- horseshoe MC

def build_pkg_hs(xsq, lam, tau, c2, sigmaE, z, *, B):
    """Horseshoe packed operand (nb, B*C, 3): [1/denom, sd, z] per
    (marker, chain); denom = |X_j|^2 + sigmaE / (tau*c2*lam/(tau*lam+c2))
    with lambda fixed during the sweep (src/HorseshoeR.cpp:234, 242)."""
    f32 = jnp.float32
    C, Mpad = lam.shape
    xsq = xsq.astype(f32)
    lamf = lam.astype(f32)
    tauf = tau.astype(f32)[:, None]
    c2f = c2.astype(f32)[:, None]
    sE = sigmaE.astype(f32)[:, None]
    s_j = tauf * c2f * lamf / (tauf * lamf + c2f)          # (C, Mpad)
    denom = xsq[None, :] + sE / s_j
    pkg = jnp.stack([1.0 / denom, jnp.sqrt(sE / denom), z.astype(f32)],
                    axis=2)                                 # (C, Mpad, 3)
    nb = Mpad // B
    return pkg.transpose(1, 0, 2).reshape(nb, B * C, 3)


def _hs_mc_kernel(border_ref, inner_ref,
                  xt_ref, pkg_ref, gram_ref, xsq_ref, valid_ref,
                  beta_ref, eps_ref,
                  eps_out, beta_out, r_sc, delta_sc, *, B, TN, C,
                  packed=False, srow_ref=None, msrow_ref=None,
                  xsum_ref=None, esum0_ref=None, esum_sc=None, dms_sc=None):
    b = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    f32 = jnp.float32
    fold = srow_ref is not None

    if packed:
        SUB, W = 16, TN // 16

        def x_sub(k):
            c = (xt_ref[...] >> (2 * k)) & 3           # (B, W) int32
            return c.astype(f32)
    else:
        SUB, W = 1, TN

        def x_sub(k):
            return xt_ref[...]

    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    # codes/int8 are bf16-exact -> 2-pass split dot; decoded/dense f32
    # falls back to the 3-pass bf16x3 expansion (see _dot2_rows)
    x_exact = fold and (packed or xt_ref.dtype != jnp.float32)
    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(ph == 0, t == 0)))
    def _init():
        eps_out[...] = eps_ref[...]
        if fold:
            esum_sc[...] = esum0_ref[...]

    @pl.when(ph == 0)
    def _accumulate_r():
        @pl.when(t == 0)
        def _():
            r_sc[...] = jnp.zeros_like(r_sc)

        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]   # (C, W)
            r_sc[...] += _dot2_rows(eps_t, x_sub(k), 1, x_exact)

    @pl.when(jnp.logical_and(ph == 1, t == 0))
    def _solve():
        delta_sc[...] = jnp.zeros_like(delta_sc)
        if fold:
            # code-domain correlations -> standardized domain (see
            # _mc_kernel / pallas_sweep._sweep_kernel for the algebra)
            r_sc[...] = (r_sc[...] * srow_ref[0]
                         - msrow_ref[0] * esum_sc[...])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

        def body(s, _):
            jl = inner_ref[b, s]
            dsj = pl.ds(jl, 1)
            row = pkg_ref[0, pl.ds(jl * C, C), :]           # (C, 3)
            invd = row[:, 0:1]
            sdv = row[:, 1:2]
            z_s = row[:, 2:3]
            okf = valid_ref[0, dsj, :]                      # (1, 1) f32
            xsq_j = xsq_ref[0, dsj, :]

            maskf = (lane == jl).astype(f32)
            beta_old = jnp.sum(beta_ref[...] * maskf, axis=1, keepdims=True)
            r_jl = jnp.sum(r_sc[...] * maskf, axis=1, keepdims=True)

            num = r_jl + beta_old * xsq_j
            beta_new = num * invd + sdv * z_s               # (C, 1)
            d = okf * (beta_new - beta_old)

            r_sc[...] -= gram_ref[0, dsj, :] * d
            delta_sc[...] += maskf * d
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)
        beta_out[0] = beta_ref[...] + delta_sc[...]
        if fold:
            esum_sc[...] -= jnp.sum(delta_sc[...] * xsum_ref[0], axis=1,
                                    keepdims=True)
            dms_sc[...] = jnp.sum(delta_sc[...] * msrow_ref[0], axis=1,
                                  keepdims=True)
            delta_sc[...] = delta_sc[...] * srow_ref[0]

    @pl.when(ph == 1)
    def _apply_update():
        for k in range(SUB):
            upd = _dot2_rows(delta_sc[...], x_sub(k), 0, x_exact)
            if fold:
                upd = upd - dms_sc[...]
            eps_out[:, pl.ds(k * NW + t * W, W)] -= upd


def horseshoe_sweep_pallas_mc(XT_pad, gram, xsq_pad, eps, beta_pad,
                              block_order, inner_perm, z_arr,
                              lam, tau, c2, sigmaE, valid_pad,
                              *, tile_n: int = 512, interpret: bool = False,
                              max_call_blocks=None,
                              x_mean=None, x_scale=None, x_xsum=None,
                              fold_affine: bool = False, row_valid=None):
    """C-chain fused horseshoe sweep; eps (C, N), beta/lam/z (C, Mpad),
    tau/c2/sigmaE (C,).  Quantized X is supported only via fold_affine
    (no-missing data), like bayesr_sweep_pallas_mc."""
    nb, B, _ = gram.shape
    f32 = jnp.float32
    C = eps.shape[0]
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if quantized and not fold:
        raise NotImplementedError(
            "multi-chain sweep supports quantized X only with fold_affine "
            "(no missing calls); decode-in-kernel is single-chain only")
    if packed:
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        TN = 2048
        if Npad % TN or eps.shape[1] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        N = Npad
        xt = XT_pad
        eps2 = eps.astype(f32)
    else:
        Mpad, N = XT_pad.shape
        TN = min(tile_n, max(128, 1 << (N - 1).bit_length()))
        Npad = -(-N // TN) * TN
        eps2 = jnp.zeros((C, Npad), f32).at[:, :N].set(eps.astype(f32))
        xt = (XT_pad if Npad == N
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N))))
        if quantized:   # fold-affine int8: raw codes feed the MXU directly
            xt = xt.astype(f32) if xt.dtype == jnp.int8 else xt
    nt = Npad // TN

    if fold:
        srow3 = x_scale.astype(f32).reshape(nb, 1, B)
        msrow3 = (x_mean.astype(f32) * x_scale.astype(f32)).reshape(nb, 1, B)
        xsum3 = x_xsum.astype(f32).reshape(nb, 1, B)
        if packed:
            if row_valid is None:
                raise ValueError("packed fold_affine needs row_valid")
            lane_mask = row_valid.astype(f32).reshape(1, Npad)
        else:
            lane_mask = (jnp.arange(Npad) < N).astype(f32).reshape(1, Npad)
    else:
        srow3 = msrow3 = xsum3 = lane_mask = None
    inner_by_pos = inner_perm[block_order]
    pkg = build_pkg_hs(xsq_pad, lam, tau, c2, sigmaE, z_arr, B=B)
    xsq3 = xsq_pad.astype(f32).reshape(nb, B, 1)
    valid3 = valid_pad.astype(f32).reshape(nb, B, 1)
    beta2 = beta_pad.astype(f32)

    border_i = block_order.astype(jnp.int32)
    inner_i = inner_by_pos.astype(jnp.int32)
    n_rounds = block_order.shape[0]
    CB = max(1, min(n_rounds, max_call_blocks or (65536 // B)))
    lane = jnp.arange(B, dtype=border_i.dtype)

    def im_b3(b, ph, t, border_ref, inner_ref):
        return (border_ref[b], 0, 0)

    def im_cb(b, ph, t, border_ref, inner_ref):
        return (0, border_ref[b])

    def im_xt(b, ph, t, border_ref, inner_ref):
        return (border_ref[b], t)

    def im_full(b, ph, t, border_ref, inner_ref):
        return (0, 0)

    def im_pos3(b, ph, t, border_ref, inner_ref):
        return (b, 0, 0)

    def call(border_c, inner_c, beta2, eps2, esum0):
        cb = border_c.shape[0]
        x_tile_w = TN // 16 if packed else TN
        row_b = functools.partial(pl.BlockSpec, (1, 1, B), im_b3)
        fold_specs = [row_b(), row_b(), row_b()] if fold else []
        fold_args = [srow3, msrow3, xsum3] if fold else []
        tail_specs = ([pl.BlockSpec((C, 1), im_full)] if fold else [])
        tail_args = [esum0] if fold else []
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cb, 2, nt),
            in_specs=[
                pl.BlockSpec((B, x_tile_w), im_xt),
            ] + fold_specs + [
                pl.BlockSpec((1, B * C, 3), im_b3),
                pl.BlockSpec((1, B, B), im_b3),
                pl.BlockSpec((1, B, 1), im_b3),
                pl.BlockSpec((1, B, 1), im_b3),
                pl.BlockSpec((C, B), im_cb),
                pl.BlockSpec((C, Npad), im_full),
            ] + tail_specs,
            out_specs=[
                pl.BlockSpec((C, Npad), im_full),
                pl.BlockSpec((1, C, B), im_pos3),
            ],
            scratch_shapes=[
                pltpu.VMEM((C, B), jnp.float32),
                pltpu.VMEM((C, B), jnp.float32),
            ] + ([pltpu.VMEM((C, 1), jnp.float32),
                  pltpu.VMEM((C, 1), jnp.float32)] if fold else []),
        )
        if fold:
            def kernel(border_ref, inner_ref, xt_ref, srow_ref, msrow_ref,
                       xsum_ref, pkg_ref, gram_ref, xsq_ref, valid_ref,
                       beta_ref, eps_ref, esum0_ref,
                       eps_out, beta_out, r_sc, delta_sc, esum_sc, dms_sc):
                return _hs_mc_kernel(
                    border_ref, inner_ref, xt_ref, pkg_ref, gram_ref,
                    xsq_ref, valid_ref, beta_ref, eps_ref,
                    eps_out, beta_out, r_sc, delta_sc, B=B, TN=TN, C=C,
                    packed=packed, srow_ref=srow_ref, msrow_ref=msrow_ref,
                    xsum_ref=xsum_ref, esum0_ref=esum0_ref,
                    esum_sc=esum_sc, dms_sc=dms_sc)
        else:
            kernel = functools.partial(_hs_mc_kernel, B=B, TN=TN, C=C,
                                       packed=packed)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((C, Npad), jnp.float32),
                jax.ShapeDtypeStruct((cb, C, B), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3,
            ),
        )(border_c, inner_c, xt, *fold_args, pkg, gram, xsq3, valid3,
          beta2, eps2, *tail_args)

    def run_chunk(carry, xs):
        eps2, beta2 = carry
        border_c, inner_c = xs
        cb = border_c.shape[0]
        esum0 = (jnp.sum(eps2, axis=1, keepdims=True) if fold else None)
        eps2, beta_c = call(border_c, inner_c, beta2, eps2, esum0)
        if fold:
            eps2 = eps2 * lane_mask
        idx = (border_c[:, None] * B + lane[None, :]).reshape(-1)
        beta2 = beta2.at[:, idx].set(
            beta_c.transpose(1, 0, 2).reshape(C, cb * B))
        return (eps2, beta2), None

    carry = (eps2, beta2)
    rem = n_rounds % CB
    if rem:
        carry, _ = run_chunk(carry, (border_i[:rem], inner_i[:rem]))
    n_uniform = (n_rounds - rem) // CB
    if n_uniform == 1:
        carry, _ = run_chunk(carry, (border_i[rem:], inner_i[rem:]))
    elif n_uniform > 1:
        xs = (border_i[rem:].reshape(n_uniform, CB),
              inner_i[rem:].reshape(n_uniform, CB, B))
        carry, _ = lax.scan(run_chunk, carry, xs)
    eps2, beta2 = carry
    return eps2[:, :N].astype(eps.dtype), beta2.astype(beta_pad.dtype)
