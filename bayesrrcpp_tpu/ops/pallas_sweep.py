"""Pallas TPU kernel for the full blocked Gibbs marker sweep.

Why a kernel: the XLA lax.fori_loop inner solve pays per-op dispatch overhead
(~100us/marker measured on v5e) because every one of the M sequential marker
updates issues its own chain of small HLO ops and an HBM gather of the Gram
row.  This kernel runs the ENTIRE sweep (all blocks) in one pallas_call:

- grid = (nb, 2, nt): for each Gram block b (in the shuffled order, delivered
  via scalar prefetch), phase 0 accumulates r = X_b' eps over N tiles on the
  MXU, phase 1 runs the B sequential in-VMEM marker updates (t==0) and then
  applies the rank-1 residual update eps -= delta' X_b tile by tile.
- eps lives in VMEM for the whole sweep (one (1, Npad) f32 buffer); X is the
  only HBM traffic: two streaming passes per iteration (r-pass + update-pass),
  pipelined by the BlockSpec machinery.
- the B-step solve touches only VMEM/SMEM: the (B, B) Gram block, (1, B)
  state rows and scalar parameters, so each sequential step is ~O(B/128)
  VPU cycles instead of ~100us.

Mosaic constraints shape the data layout:
- per-marker read/write vectors (beta, labels) are (nb, 1, B) with (1, 1, B)
  blocks (block dims equal to array dims are always legal); scalar stores to
  VMEM are illegal, so updates are masked (1, B) vector stores and reads are
  mask-sum gathers;
- per-marker read-only scalars (xsq, group id, valid, p, z) are streamed as
  SMEM blocks and read with dynamic scalar indices like the prefetched
  permutations.

Exact same math as ops/block_sweep.bayesr_block_sweep (reference semantics
documented there and in ops/selection.py; reference: src/BayesRv2.cpp:186-245).
Equality is enforced by tests/test_pallas.py in interpret mode.

Randomness (per-position uniform p / normal z) is generated OUTSIDE with
jax.random and streamed in, so chains are reproducible across backends.
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
from .pallas_jacobi_t import _dot2_rows

# Dev-only ablation knobs for locating cycle sinks in the sequential solve
# (tools/solve_ablation.py).  Comma-separated names; OFF in production.
_ABLATE = frozenset(
    s for s in os.environ.get("BAYESR_SOLVE_ABLATE", "").split(",") if s)
if _ABLATE:  # pragma: no cover - debug-only path
    import warnings

    warnings.warn(
        f"BAYESR_SOLVE_ABLATE={sorted(_ABLATE)} is set: parts of the "
        "production solve are DISABLED and sampling results are invalid. "
        "This is a measurement-only mode (tools/solve_ablation.py).",
        RuntimeWarning, stacklevel=2)


def _selection_scalars(logL, p_s, K):
    """Reference categorical draw as unrolled scalar ops (K is tiny/static).

    Returns (k_sel, any_hit): k_sel == K means the reference's fall-through
    no-selection case (src/BayesRv2.cpp:222-242).
    """
    logLs = logL[:, 1:]                      # (1, K-1) slab logLs
    k_sel = jnp.int32(K)
    acum = jnp.float32(0.0)
    for k in range(K):
        lk = logL[0, k]
        guard = jnp.max(jnp.abs(logLs - lk)) > 700.0
        S = jnp.sum(jnp.exp(logL - lk))
        w = jnp.where(guard, 0.0, 1.0 / S)
        acum = acum + w
        hit = jnp.logical_and(p_s <= acum, k_sel == K)
        k_sel = jnp.where(hit, jnp.int32(k), k_sel)
    return k_sel, k_sel < K


MISSING_CODE = 3  # int8 genotype code for a missing call


def _decode_tile(raw, mean_col, scale_col):
    """int8/int32 dosage codes -> standardized f32: (g - mean) * inv_sd,
    with missing calls (code 3) decoding to exactly 0 (mean imputation).

    The missing-ness compare runs on the f32 cast (mosaic lacks int8 vector
    compares on v5e)."""
    g = raw.astype(jnp.float32)
    x = (g - mean_col) * scale_col
    return jnp.where(g == float(MISSING_CODE), jnp.zeros_like(x), x)


def _sweep_kernel(border_ref, inner_ref,           # scalar prefetch (SMEM)
                  xt_ref, gram_ref, xsq_ref, gas_ref, valid_ref,
                  p_ref, z_ref, beta_ref, labels_ref, eps_ref,
                  pi_ref, cva_ref, sgg_ref, se_ref,
                  eps_out, beta_out, labels_out, v_out, bacc_out,
                  r_sc, delta_sc, denom_sc, sd_sc, lp_sc, *, B, TN, K, G,
                  mean_ref=None, scale_ref=None, packed=False,
                  srow_ref=None, msrow_ref=None, xsum_ref=None,
                  esum0_ref=None, esum_sc=None, dms_sc=None):
    b = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    sE = se_ref[0]
    Km1 = K - 1
    # affine-folded decode (quantized X with no real missing calls): the MXU
    # sees RAW integer codes c; the per-marker standardization
    # x = s*(c - m) is applied after the fact as
    #   r_j = s_j * (X_j_codes' eps) - (m_j s_j) * sum(eps)
    # and the rank-1 residual update as
    #   eps -= (delta .* s)' C - (delta . (m .* s)),
    # cutting the in-kernel decode from ~7 VPU ops/element to 3 (the
    # dominant cost at biobank scale, see BENCH.md).  sum(eps) is tracked
    # analytically across blocks via the precomputed decoded column sums
    # xsum_j (padded lanes then drift but are never read: pad codes are 0 so
    # code-dots ignore them; the host zeroes them between kernel calls).
    fold = srow_ref is not None

    # sub-tile decomposition: dense/int8 tiles decode whole; 2-bit packed
    # tiles hold 16 genotypes per int32 word and decode per bit-plane k into
    # a (B, W) sub-tile covering the PERMUTED individual range
    # [k*NW + t*W, k*NW + (t+1)*W)  -- the GLOBAL plane-major layout the
    # sampler permutes eps into (genotypes._lane_perm)
    if packed:
        SUB = 16
        W = TN // 16

        def x_sub(k):
            c = (xt_ref[...] >> (2 * k)) & 3           # (B, W) int32
            if fold:
                return c.astype(jnp.float32)
            return _decode_tile(c, mean_ref[0], scale_ref[0])
    else:
        SUB = 1
        W = TN

        def x_sub(k):
            if fold:
                return xt_ref[...].astype(jnp.float32)
            if mean_ref is None:
                return xt_ref[...]
            return _decode_tile(xt_ref[...], mean_ref[0], scale_ref[0])

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
            esum_sc[...] = jnp.full((1, 1), esum0_ref[0], jnp.float32)

    @pl.when(ph == 0)
    def _accumulate_r():
        @pl.when(t == 0)
        def _():
            r_sc[...] = jnp.zeros_like(r_sc)

        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]   # (1, W)
            r_sc[...] += _dot2_rows(eps_t, x_sub(k), 1, x_exact)

    @pl.when(jnp.logical_and(ph == 1, t == 0))
    def _solve():
        beta_out[...] = beta_ref[...]
        labels_out[...] = labels_ref[...]
        delta_sc[...] = jnp.zeros_like(delta_sc)
        if fold:
            # code-domain correlations -> standardized domain
            r_sc[...] = (r_sc[...] * srow_ref[0]
                         - msrow_ref[0] * esum_sc[...])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        grow = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        f32 = jnp.float32
        half_invsE = 0.5 / sE

        # ---- per-block precompute (vectorised over the B markers), column
        # layout (B, k): group-gathered prior quantities so the sequential
        # loop below is (1,1)/(1,K) row algebra with no lane-dynamic access
        xsq_c = xsq_ref[0]                       # (B, 1)
        gas_c = gas_ref[0]                       # (B, 1) int32
        tiny = jnp.finfo(f32).tiny
        sigmaG_c = jnp.zeros((B, 1), f32)
        cva_m = jnp.zeros((B, K - 1), f32)
        logpi_m = jnp.zeros((B, K), f32)
        for g in range(G):
            mg = (gas_c == g).astype(f32)        # (B, 1)
            sigmaG_c += sgg_ref[g] * mg
            cva_m += cva_ref[g:g + 1, :] * mg    # (1,K-1)x(B,1) -> (B,K-1)
            logpi_m += jnp.log(jnp.maximum(pi_ref[g:g + 1, :], tiny)) * mg
        denom = xsq_c + (sE / sigmaG_c) / cva_m                    # (B, K-1)
        # spike column prepended as exact 0: muk/sd gathers then need no
        # lane concat or k-1 remap in the sequential loop, and the two
        # divides per marker step become multiplies (reciprocals hoisted)
        zcol = jnp.zeros((B, 1), f32)
        denom_sc[...] = jnp.concatenate([zcol, 1.0 / denom], axis=1)
        sd_sc[...] = jnp.concatenate([zcol, jnp.sqrt(sE / denom)], axis=1)
        # slab log-prior minus the 0.5*log(...) penalty, precombined
        lp_sc[...] = jnp.concatenate([
            logpi_m[:, 0:1],
            logpi_m[:, 1:] - 0.5 * jnp.log(
                (sigmaG_c / sE) * xsq_c * cva_m + 1.0),
        ], axis=1)                                                  # (B, K)

        def body(s, _):
            jl = inner_ref[b, s]
            dsj = pl.ds(jl, 1)
            beta_old = beta_out[0, dsj, :]                  # (1, 1)
            label_old = labels_out[0, dsj, :]               # (1, 1) int
            okf = valid_ref[0, dsj, :].astype(f32)          # (1, 1)
            xsq_j = xsq_ref[0, dsj, :]                      # (1, 1)
            p_s = p_ref[0, pl.ds(s, 1), :]                  # (1, 1)
            z_s = z_ref[0, pl.ds(s, 1), :]                  # (1, 1)
            g_c = gas_ref[0, dsj, :]                        # (1, 1) int

            mask = lane == jl                               # (1, B)
            maskf = mask.astype(f32)
            if "gather" in _ABLATE:
                r_jl = jnp.full((1, 1), 1e-6, f32)
            else:
                r_jl = jnp.sum(r_sc[...] * maskf, axis=1,
                               keepdims=True)               # (1, 1)

            num = r_jl + beta_old * xsq_j                   # (1, 1)
            muk = num * denom_sc[dsj, :]                    # (1, K), col0=0
            logL = lp_sc[dsj, :] + (half_invsE * num) * muk
            logLs = logL[:, 1:]                             # (1, K-1)

            if "sel" in _ABLATE:
                k_sel = jnp.where(p_s < 0.5, jnp.int32(1), jnp.int32(0))
                k_sel = jnp.broadcast_to(k_sel, (1, 1))
            else:
                # categorical draw with the reference overflow guard,
                # unrolled over the K components as row-vector ops
                k_sel = jnp.full((1, 1), K, jnp.int32)
                acum = jnp.zeros((1, 1), f32)
                for k in range(K):
                    lk = logL[:, k:k + 1]                   # (1, 1)
                    guard = jnp.max(jnp.abs(logLs - lk), axis=1,
                                    keepdims=True) > 700.0
                    Ssum = jnp.sum(jnp.exp(logL - lk), axis=1, keepdims=True)
                    w = jnp.where(guard, jnp.zeros((1, 1), f32), 1.0 / Ssum)
                    acum = acum + w
                    hit = jnp.logical_and(p_s <= acum, k_sel == K)
                    k_sel = jnp.where(hit, jnp.int32(k), k_sel)
            any_hit = k_sel < K

            selm = (kcol == k_sel).astype(f32)              # (1, K)
            mu_sel = jnp.sum(muk * selm, axis=1, keepdims=True)
            sd_sel = jnp.sum(sd_sc[dsj, :] * selm, axis=1, keepdims=True)
            beta_drawn = mu_sel + sd_sel * z_s              # spike: exactly 0
            beta_new = jnp.where(any_hit, beta_drawn, beta_old)
            d = okf * (beta_new - beta_old)                 # (1, 1)

            if "rank1" not in _ABLATE:
                r_sc[...] -= gram_ref[0, dsj, :] * d
            if "delta" not in _ABLATE:
                delta_sc[...] += maskf * d
            beta_out[0, dsj, :] = beta_old + d
            labels_out[0, dsj, :] = jnp.where(
                jnp.logical_and(any_hit, okf > 0), k_sel, label_old)

            if "vb" not in _ABLATE:
                take = okf * any_hit.astype(f32)            # (1, 1)
                onehot = (kcol == k_sel).astype(f32) * take  # (1, K)
                gmask = (grow == g_c).astype(f32)           # (G, 1)
                v_out[...] += gmask * onehot                # (G, K)
                slab_taken = take * (k_sel > 0).astype(f32)
                bacc_out[...] += (gcol == g_c).astype(f32) * (
                    slab_taken * beta_new * beta_new)       # (1, G)
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)
        if fold:
            # track sum(eps) across blocks analytically (pad lanes drift and
            # cannot be summed directly), and pre-scale delta for the raw
            # code-domain rank-1 update
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


def _sweep_kernel_q(border_ref, inner_ref, xt_ref, mean3_ref, scale3_ref,
                    *rest, B, TN, K, G, packed=False):
    """Quantized-genotype variant: int8 or 2-bit-packed X decoded in-kernel."""
    return _sweep_kernel(border_ref, inner_ref, xt_ref, *rest,
                         B=B, TN=TN, K=K, G=G,
                         mean_ref=mean3_ref, scale_ref=scale3_ref,
                         packed=packed)


def _sweep_kernel_qf(border_ref, inner_ref, xt_ref, srow_ref, msrow_ref,
                     xsum_ref, gram_ref, xsq_ref, gas_ref, valid_ref,
                     p_ref, z_ref, beta_ref, labels_ref, eps_ref,
                     pi_ref, cva_ref, sgg_ref, se_ref, esum0_ref,
                     eps_out, beta_out, labels_out, v_out, bacc_out,
                     r_sc, delta_sc, denom_sc, sd_sc, lp_sc, esum_sc, dms_sc,
                     *, B, TN, K, G, packed=False):
    """Quantized variant with the affine standardization FOLDED out of the
    per-element decode (no-missing data only; see _sweep_kernel)."""
    return _sweep_kernel(border_ref, inner_ref, xt_ref, gram_ref, xsq_ref,
                         gas_ref, valid_ref, p_ref, z_ref, beta_ref,
                         labels_ref, eps_ref, pi_ref, cva_ref, sgg_ref,
                         se_ref, eps_out, beta_out, labels_out, v_out,
                         bacc_out, r_sc, delta_sc, denom_sc, sd_sc, lp_sc,
                         B=B, TN=TN, K=K, G=G, packed=packed,
                         srow_ref=srow_ref, msrow_ref=msrow_ref,
                         xsum_ref=xsum_ref, esum0_ref=esum0_ref,
                         esum_sc=esum_sc, dms_sc=dms_sc)


def _sweep_call(border, inner, xt, gram, xsq, gas, valid, p, z,
                beta3, labels3, eps2d, pi, cva, sgg, se, *,
                B, TN, interpret, quantized=False, packed=False,
                x_mean3=None, x_scale3=None, xt_positional=False,
                fold=False, x_srow3=None, x_msrow3=None, x_xsum3=None,
                esum0=None):
    nb_call = border.shape[0]   # blocks processed by THIS call (may be a
                                # chunk of the full sweep: the scalar-prefetch
                                # permutations must fit in ~1MB SMEM)
    G, K = pi.shape
    Npad = eps2d.shape[1]
    nt = Npad // TN

    def im_b(b, ph, t, border_ref, inner_ref):
        return (border_ref[b], 0)

    def im_b3(b, ph, t, border_ref, inner_ref):
        return (border_ref[b], 0, 0)

    def im_pos(b, ph, t, border_ref, inner_ref):
        return (b, 0)

    def im_xt(b, ph, t, border_ref, inner_ref):
        return (b if xt_positional else border_ref[b], t)

    def im_full(b, ph, t, border_ref, inner_ref):
        return (0, 0)

    def im_pos3(b, ph, t, border_ref, inner_ref):
        return (b, 0, 0)

    vmem_b = functools.partial(pl.BlockSpec, (1, B, 1), im_b3)
    vmem_pos = functools.partial(pl.BlockSpec, (1, B, 1), im_pos3)
    # packed: xt holds int32 words of 16 2-bit codes -> tile covers TN
    # decoded lanes with TN//16 words
    x_tile_w = TN // 16 if packed else TN
    x_specs = [pl.BlockSpec((B, x_tile_w), im_xt)]              # xt
    x_args = [xt]
    if fold:
        row_b = functools.partial(pl.BlockSpec, (1, 1, B), im_b3)
        x_specs += [row_b(), row_b(), row_b()]    # scale, mean*scale, colsum
        x_args += [x_srow3, x_msrow3, x_xsum3]
    elif quantized:
        x_specs += [vmem_b(), vmem_b()]                         # mean, scale
        x_args += [x_mean3, x_scale3]
    tail_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]       # esum0 (1,)
                  if fold else [])
    tail_args = [esum0] if fold else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_call, 2, nt),
        in_specs=x_specs + [
            pl.BlockSpec((1, B, B), im_b3),                     # gram
            vmem_b(),                                           # xsq
            vmem_b(),                                           # gas
            vmem_b(),                                           # valid
            vmem_pos(),                                         # p
            vmem_pos(),                                         # z
            pl.BlockSpec((1, B, 1), im_b3),                     # beta
            pl.BlockSpec((1, B, 1), im_b3),                     # labels
            pl.BlockSpec((1, Npad), im_full),                   # eps
            pl.BlockSpec((G, K), im_full),                      # pi
            pl.BlockSpec((G, K - 1), im_full),                  # cva
            pl.BlockSpec(memory_space=pltpu.SMEM),              # sigmaGG (G,)
            pl.BlockSpec(memory_space=pltpu.SMEM),              # sigmaE (1,)
        ] + tail_specs,
        out_specs=[
            pl.BlockSpec((1, Npad), im_full),                   # eps_out
            pl.BlockSpec((1, B, 1), im_pos3),                   # beta_out
            pl.BlockSpec((1, B, 1), im_pos3),                   # labels_out
            pl.BlockSpec((G, K), im_full),                      # v_out
            pl.BlockSpec((1, G), im_full),                      # bacc_out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, B), jnp.float32),                    # r
            pltpu.VMEM((1, B), jnp.float32),                    # delta
            pltpu.VMEM((B, K), jnp.float32),                    # 1/denom
            pltpu.VMEM((B, K), jnp.float32),                    # sd
            pltpu.VMEM((B, K), jnp.float32),                    # log-prior
        ] + ([pltpu.VMEM((1, 1), jnp.float32),                  # sum(eps)
              pltpu.VMEM((1, 1), jnp.float32)]                  # delta.(m*s)
             if fold else []),
    )
    if fold:
        kernel = functools.partial(_sweep_kernel_qf, B=B, TN=TN, K=K, G=G,
                                   packed=packed)
    elif quantized:
        kernel = functools.partial(_sweep_kernel_q, B=B, TN=TN, K=K, G=G,
                                   packed=packed)
    else:
        kernel = functools.partial(_sweep_kernel, B=B, TN=TN, K=K, G=G)
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), jnp.float32),
        jax.ShapeDtypeStruct((nb_call, B, 1), jnp.float32),  # position-ordered
        jax.ShapeDtypeStruct((nb_call, B, 1), jnp.int32),    # position-ordered
        jax.ShapeDtypeStruct((G, K), jnp.float32),
        jax.ShapeDtypeStruct((1, G), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(border, inner, *x_args, gram, xsq, gas, valid, p, z,
      beta3, labels3, eps2d, pi, cva, sgg, se, *tail_args)


def bayesr_sweep_pallas(XT_pad, gram, xsq_pad, eps, beta_pad, labels_pad,
                        block_order, inner_perm, p_arr, z_arr,
                        pi, cva, sigmaE, sigmaGG, g_assign_pad, valid_pad,
                        *, tile_n: int = 512, interpret: bool = False,
                        x_mean=None, x_scale=None, max_call_blocks=None,
                        inner_positional: bool = False, slice_x=None,
                        x_xsum=None, fold_affine: bool = False,
                        row_valid=None):
    """Drop-in replacement for ops.block_sweep.bayesr_block_sweep on TPU.

    All f32 (the kernel accumulates in f32; X may be bf16).  Arrays arrive in
    the flat (Mpad,)/(N,) layout used by the JAX backends and are reshaped to
    the kernel layouts here.

    ``fold_affine=True`` (quantized X, no real missing calls) switches to the
    raw-code kernel: standardization is applied per-marker after the code
    dots, which needs the decoded column sums ``x_xsum`` (Mpad,) and, for the
    packed layout, the ``row_valid`` lane mask (padded lanes drift inside a
    call and are re-zeroed between calls).
    """
    nb, B, _ = gram.shape
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if fold and x_xsum is None:
        raise ValueError("fold_affine needs x_xsum (decoded column sums)")
    if packed:
        # XT_pad holds int32 words of 16 2-bit codes along the (permuted)
        # individual axis; eps arrives already permuted+padded to Npad
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        TN = 2048                      # 128 int32 words per tile
        if Npad % TN or eps.shape[0] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        N = Npad
        xt = XT_pad
        f32 = jnp.float32
        eps2d = eps.astype(f32).reshape(1, Npad)
    else:
        Mpad, N = XT_pad.shape
        TN = min(tile_n, max(128, 1 << (N - 1).bit_length()))
        Npad = -(-N // TN) * TN
        f32 = jnp.float32
        eps2d = jnp.zeros((1, Npad), f32).at[0, :N].set(eps.astype(f32))
        if quantized and XT_pad.dtype != jnp.int8:
            raise ValueError("quantized sweep expects int8 genotype codes")
        # fold mode: pad lanes must carry code 0 so raw-code dots ignore them
        pad_val = MISSING_CODE if (quantized and not fold) else 0
        xt = (XT_pad if Npad == N
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N)),
                           constant_values=pad_val))
    # p/z and the within-block orders are indexed by sweep POSITION (grid
    # step); block-local state arrays are indexed by the block id via the
    # prefetched border permutation -- matching block_sweep's RNG semantics
    inner_by_pos = inner_perm if inner_positional else inner_perm[block_order]

    # the sweep may cover a subset of blocks (one chunk of a sharded slice);
    # positions are indexed within this sweep
    n_rounds = block_order.shape[0]
    if p_arr.shape[0] != n_rounds * B:
        raise ValueError("p/z streams must have one entry per sweep position")
    # chunk the sweep so the scalar-prefetched permutations fit in SMEM
    # (~1MB); each call processes <=CB blocks, eps threads through, outputs
    # are position-ordered and scattered back into the marker layout
    CB = max(1, min(n_rounds, max_call_blocks or (65536 // B)))
    # XLA stages custom-call operands through a scoped-memory copy of the
    # WHOLE operand; at biobank sizes that transient copy of X is the HBM
    # bottleneck.  When X is large, gather each chunk's blocks first so only
    # the ~1/n_chunks slice is staged (costs one extra streaming pass of X
    # per sweep).
    xrow = xt.shape[1]
    # opt-in only: XLA keeps several rematerialized copies of the per-chunk
    # gather alive at biobank sizes, which costs more than the staging it
    # avoids (measured on v5e; see BENCH.md known follow-ups)
    slice_per_call = bool(slice_x) and n_rounds > CB
    if slice_per_call:
        CB = min(CB, 64)
    call = functools.partial(
        _sweep_call,
        B=B, TN=TN, interpret=interpret, quantized=quantized, packed=packed,
        fold=fold)
    mean3 = (None if not quantized or fold
             else x_mean.astype(f32).reshape(nb, B, 1))
    scale3 = (None if not quantized or fold
              else x_scale.astype(f32).reshape(nb, B, 1))
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
    xsq3 = xsq_pad.astype(f32).reshape(nb, B, 1)
    gas3 = g_assign_pad.astype(jnp.int32).reshape(nb, B, 1)
    valid3 = valid_pad.astype(jnp.int32).reshape(nb, B, 1)
    tail = (pi.astype(f32), cva.astype(f32),
            sigmaGG.astype(f32), sigmaE.astype(f32).reshape(1))

    beta_cur = beta_pad.astype(f32).reshape(nb, B, 1)
    labels_cur = labels_pad.astype(jnp.int32).reshape(nb, B, 1)
    p3 = p_arr.astype(f32).reshape(n_rounds, B, 1)
    z3 = z_arr.astype(f32).reshape(n_rounds, B, 1)
    border_i = block_order.astype(jnp.int32)
    inner_i = inner_by_pos.astype(jnp.int32)

    G = pi.shape[0]
    K = pi.shape[1]
    v_tot = jnp.zeros((G, K), f32)
    bacc_tot = jnp.zeros((1, G), f32)
    beta_flat = beta_cur.reshape(Mpad)
    labels_flat = labels_cur.reshape(Mpad)
    lane = jnp.arange(B, dtype=border_i.dtype)
    xt_blocks = xt.reshape(nb, B, xrow)

    def run_chunk(carry, xs):
        eps2d, beta_flat, labels_flat, v_tot, bacc_tot = carry
        border_c, inner_c, p_c, z_c = xs
        cb = border_c.shape[0]
        if slice_per_call:
            # gather only this chunk's X blocks (the one biobank-sized
            # operand); everything else stays whole + border-indexed
            xt_c = jnp.take(xt_blocks, border_c, axis=0).reshape(cb * B, xrow)
        else:
            xt_c = xt
        esum0 = (jnp.sum(eps2d, axis=1) if fold else None)
        out = call(border_c, inner_c, xt_c, gram, xsq3, gas3, valid3,
                   p_c, z_c,
                   beta_flat.reshape(nb, B, 1),
                   labels_flat.reshape(nb, B, 1),
                   eps2d, *tail, x_mean3=mean3, x_scale3=scale3,
                   xt_positional=slice_per_call,
                   x_srow3=srow3, x_msrow3=msrow3, x_xsum3=xsum3,
                   esum0=esum0)
        eps2d, beta_c, labels_c, v_c, bacc_c = out
        if fold:
            # re-zero drifted pad lanes (see fold_affine note above)
            eps2d = eps2d * lane_mask
        idx = (border_c[:, None] * B + lane[None, :]).reshape(-1)
        beta_flat = beta_flat.at[idx].set(beta_c.reshape(-1))
        labels_flat = labels_flat.at[idx].set(labels_c.reshape(-1))
        return (eps2d, beta_flat, labels_flat, v_tot + v_c,
                bacc_tot + bacc_c), None

    carry = (eps2d, beta_flat, labels_flat, v_tot, bacc_tot)
    rem = n_rounds % CB
    if rem:
        # remainder chunk first (one extra call shape), then uniform chunks
        carry, _ = run_chunk(carry, (border_i[:rem], inner_i[:rem],
                                     p3[:rem], z3[:rem]))
    n_uniform = (n_rounds - rem) // CB
    if n_uniform == 1:
        carry, _ = run_chunk(carry, (border_i[rem:], inner_i[rem:],
                                     p3[rem:], z3[rem:]))
    elif n_uniform > 1:
        # scan keeps chunk temps single-buffered (an unrolled loop of
        # gathers rematerializes several biobank-sized temps at once)
        xs = (border_i[rem:].reshape(n_uniform, CB),
              inner_i[rem:].reshape(n_uniform, CB, B),
              p3[rem:].reshape(n_uniform, CB, B, 1),
              z3[rem:].reshape(n_uniform, CB, B, 1))
        carry, _ = lax.scan(run_chunk, carry, xs)
    eps2d, beta_flat, labels_flat, v_tot, bacc_tot = carry

    eps_out = eps2d
    return SweepResult(
        eps=eps_out[0, :N].astype(eps.dtype),
        beta=beta_flat.astype(beta_pad.dtype),
        labels=labels_flat,
        v=v_tot.astype(eps.dtype),
        beta_acum=bacc_tot[0].astype(eps.dtype),
    )


def _hs_kernel(border_ref, inner_ref,
               xt_ref, gram_ref, xsq_ref, valid_ref, z_ref,
               denom_ref, sd_ref, beta_ref, eps_ref,
               eps_out, beta_out, r_sc, delta_sc, *, B, TN,
               mean_ref=None, scale_ref=None, packed=False,
               srow_ref=None, msrow_ref=None, xsum_ref=None,
               esum0_ref=None, esum_sc=None, dms_sc=None):
    """Regularized-horseshoe sweep (reference: src/HorseshoeR.cpp:219-240).

    Same r/Gram machinery as the mixture kernel; the per-marker conditional
    is the dense conjugate draw beta = num/denom + sqrt(sigmaE/denom)*z with
    denom precomputed outside (lambda is fixed during the sweep).  The
    optional quantized / 2-bit-packed / fold-affine decode modes are
    identical to _sweep_kernel's (see the notes there)."""
    b = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    fold = srow_ref is not None

    if packed:
        SUB = 16
        W = TN // 16

        def x_sub(k):
            c = (xt_ref[...] >> (2 * k)) & 3           # (B, W) int32
            if fold:
                return c.astype(jnp.float32)
            return _decode_tile(c, mean_ref[0], scale_ref[0])
    else:
        SUB = 1
        W = TN

        def x_sub(k):
            if fold:
                return xt_ref[...].astype(jnp.float32)
            if mean_ref is None:
                return xt_ref[...]
            return _decode_tile(xt_ref[...], mean_ref[0], scale_ref[0])

    NW = eps_out.shape[-1] // SUB     # plane-major eps (see _lane_perm)
    # codes/int8 are bf16-exact -> 2-pass split dot; decoded/dense f32
    # falls back to the 3-pass bf16x3 expansion (see _dot2_rows)
    x_exact = fold and (packed or xt_ref.dtype != jnp.float32)

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(ph == 0, t == 0)))
    def _init():
        eps_out[...] = eps_ref[...]
        if fold:
            esum_sc[...] = jnp.full((1, 1), esum0_ref[0], jnp.float32)

    @pl.when(ph == 0)
    def _accumulate_r():
        @pl.when(t == 0)
        def _():
            r_sc[...] = jnp.zeros_like(r_sc)

        for k in range(SUB):
            eps_t = eps_out[:, pl.ds(k * NW + t * W, W)]
            r_sc[...] += _dot2_rows(eps_t, x_sub(k), 1, x_exact)

    @pl.when(jnp.logical_and(ph == 1, t == 0))
    def _solve():
        beta_out[...] = beta_ref[...]
        delta_sc[...] = jnp.zeros_like(delta_sc)
        if fold:
            # code-domain correlations -> standardized domain
            r_sc[...] = (r_sc[...] * srow_ref[0]
                         - msrow_ref[0] * esum_sc[...])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

        def body(s, _):
            jl = inner_ref[b, s]
            dsj = pl.ds(jl, 1)
            beta_old = beta_out[0, dsj, :]
            okf = valid_ref[0, dsj, :].astype(jnp.float32)
            xsq_j = xsq_ref[0, dsj, :]
            z_s = z_ref[0, pl.ds(s, 1), :]

            mask = lane == jl
            maskf = mask.astype(jnp.float32)
            r_jl = jnp.sum(r_sc[...] * maskf, axis=1, keepdims=True)

            num = r_jl + beta_old * xsq_j
            beta_new = num / denom_ref[0, dsj, :] + sd_ref[0, dsj, :] * z_s
            d = okf * (beta_new - beta_old)

            r_sc[...] -= gram_ref[0, dsj, :] * d
            delta_sc[...] += maskf * d
            beta_out[0, dsj, :] = beta_old + d
            return ()

        lax.fori_loop(0, B, body, (), unroll=False)
        if fold:
            # track sum(eps) analytically across blocks and pre-scale delta
            # for the raw code-domain rank-1 update (see _sweep_kernel)
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


def _hs_kernel_q(border_ref, inner_ref, xt_ref, mean3_ref, scale3_ref,
                 *rest, B, TN, packed=False):
    """Quantized-genotype horseshoe: int8 / 2-bit X decoded in-kernel."""
    return _hs_kernel(border_ref, inner_ref, xt_ref, *rest, B=B, TN=TN,
                      mean_ref=mean3_ref, scale_ref=scale3_ref, packed=packed)


def _hs_kernel_qf(border_ref, inner_ref, xt_ref, srow_ref, msrow_ref,
                  xsum_ref, gram_ref, xsq_ref, valid_ref, z_ref,
                  denom_ref, sd_ref, beta_ref, eps_ref, esum0_ref,
                  eps_out, beta_out, r_sc, delta_sc, esum_sc, dms_sc,
                  *, B, TN, packed=False):
    """Quantized horseshoe with the standardization folded out of the
    per-element decode (no-missing data only; see _sweep_kernel)."""
    return _hs_kernel(border_ref, inner_ref, xt_ref, gram_ref, xsq_ref,
                      valid_ref, z_ref, denom_ref, sd_ref, beta_ref, eps_ref,
                      eps_out, beta_out, r_sc, delta_sc, B=B, TN=TN,
                      packed=packed, srow_ref=srow_ref, msrow_ref=msrow_ref,
                      xsum_ref=xsum_ref, esum0_ref=esum0_ref,
                      esum_sc=esum_sc, dms_sc=dms_sc)


def _hs_call(border, inner, xt, gram, xsq3, valid3, z3, denom3, sd3, beta3,
             eps2d, *, B, TN, interpret, quantized=False, packed=False,
             x_mean3=None, x_scale3=None, xt_positional=False,
             fold=False, x_srow3=None, x_msrow3=None, x_xsum3=None,
             esum0=None):
    nb_call = border.shape[0]
    nb = gram.shape[0]
    Npad = eps2d.shape[1]
    nt = Npad // TN

    def im_b3(b, ph, t, border_ref, inner_ref):
        return (border_ref[b], 0, 0)

    def im_pos3(b, ph, t, border_ref, inner_ref):
        return (b, 0, 0)

    def im_xt(b, ph, t, border_ref, inner_ref):
        return (b if xt_positional else border_ref[b], t)

    def im_full(b, ph, t, border_ref, inner_ref):
        return (0, 0)

    vb = functools.partial(pl.BlockSpec, (1, B, 1), im_b3)
    x_tile_w = TN // 16 if packed else TN
    x_specs = [pl.BlockSpec((B, x_tile_w), im_xt)]              # xt
    x_args = [xt]
    if fold:
        row_b = functools.partial(pl.BlockSpec, (1, 1, B), im_b3)
        x_specs += [row_b(), row_b(), row_b()]    # scale, mean*scale, colsum
        x_args += [x_srow3, x_msrow3, x_xsum3]
    elif quantized:
        x_specs += [vb(), vb()]                                 # mean, scale
        x_args += [x_mean3, x_scale3]
    tail_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]       # esum0 (1,)
                  if fold else [])
    tail_args = [esum0] if fold else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_call, 2, nt),
        in_specs=x_specs + [
            pl.BlockSpec((1, B, B), im_b3),                     # gram
            vb(),                                               # xsq
            vb(),                                               # valid
            pl.BlockSpec((1, B, 1), im_pos3),                   # z
            vb(),                                               # denom
            vb(),                                               # sd
            vb(),                                               # beta
            pl.BlockSpec((1, Npad), im_full),                   # eps
        ] + tail_specs,
        out_specs=[
            pl.BlockSpec((1, Npad), im_full),                   # eps_out
            pl.BlockSpec((1, B, 1), im_pos3),                   # beta_out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
        ] + ([pltpu.VMEM((1, 1), jnp.float32),                  # sum(eps)
              pltpu.VMEM((1, 1), jnp.float32)]                  # delta.(m*s)
             if fold else []),
    )
    if fold:
        kernel = functools.partial(_hs_kernel_qf, B=B, TN=TN, packed=packed)
    elif quantized:
        kernel = functools.partial(_hs_kernel_q, B=B, TN=TN, packed=packed)
    else:
        kernel = functools.partial(_hs_kernel, B=B, TN=TN)
    out_shape = [
        jax.ShapeDtypeStruct((1, Npad), jnp.float32),
        jax.ShapeDtypeStruct((nb_call, B, 1), jnp.float32),  # position-ordered
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(border, inner, *x_args, gram, xsq3, valid3, z3, denom3, sd3, beta3,
      eps2d, *tail_args)


def horseshoe_sweep_pallas(XT_pad, gram, xsq_pad, eps, beta_pad,
                           block_order, inner_perm, z_arr,
                           lam_pad, tau, c2, sigmaE, valid_pad,
                           *, tile_n: int = 512, interpret: bool = False,
                           inner_positional: bool = False,
                           x_mean=None, x_scale=None, max_call_blocks=None,
                           slice_x=None, x_xsum=None,
                           fold_affine: bool = False, row_valid=None):
    """Drop-in replacement for ops.block_sweep.horseshoe_block_sweep on TPU.

    Storage modes (dense f32 / int8 codes / 2-bit packed words, plus the
    fold-affine no-missing variant) and the SMEM-bounded chunking over
    blocks follow bayesr_sweep_pallas exactly -- see the notes there.
    """
    nb, B, _ = gram.shape
    quantized = x_mean is not None
    packed = quantized and XT_pad.dtype == jnp.int32
    fold = bool(fold_affine) and quantized
    if fold and x_xsum is None:
        raise ValueError("fold_affine needs x_xsum (decoded column sums)")
    f32 = jnp.float32
    if packed:
        Mpad, Nw = XT_pad.shape
        Npad = Nw * 16
        TN = 2048
        if Npad % TN or eps.shape[0] != Npad:
            raise ValueError("packed sweep needs Npad % 2048 == 0 and a "
                             "matching pre-permuted eps")
        N = Npad
        xt = XT_pad
        eps2d = eps.astype(f32).reshape(1, Npad)
    else:
        Mpad, N = XT_pad.shape
        TN = min(tile_n, max(128, 1 << (N - 1).bit_length()))
        Npad = -(-N // TN) * TN
        eps2d = jnp.zeros((1, Npad), f32).at[0, :N].set(eps.astype(f32))
        if quantized and XT_pad.dtype != jnp.int8:
            raise ValueError("quantized sweep expects int8 genotype codes")
        pad_val = MISSING_CODE if (quantized and not fold) else 0
        xt = (XT_pad if Npad == N
              else jnp.pad(XT_pad, ((0, 0), (0, Npad - N)),
                           constant_values=pad_val))
    inner_by_pos = inner_perm if inner_positional else inner_perm[block_order]

    n_rounds = block_order.shape[0]
    if z_arr.shape[0] != n_rounds * B:
        raise ValueError("z stream must have one entry per sweep position")
    CB = max(1, min(n_rounds, max_call_blocks or (65536 // B)))
    xrow = xt.shape[1]
    slice_per_call = bool(slice_x) and n_rounds > CB
    if slice_per_call:
        CB = min(CB, 64)

    # per-marker effective prior variance s_j = tau*c2*lam/(tau*lam + c2);
    # lambda is held fixed during the sweep so denom/sd precompute exactly
    # (src/HorseshoeR.cpp:234, 242)
    lam = lam_pad.astype(f32)
    s_j = (tau.astype(f32) * c2 * lam / (tau.astype(f32) * lam + c2))
    denom = xsq_pad.astype(f32) + sigmaE.astype(f32) / s_j
    sd = jnp.sqrt(sigmaE.astype(f32) / denom)

    call = functools.partial(_hs_call, B=B, TN=TN, interpret=interpret,
                             quantized=quantized, packed=packed, fold=fold)
    mean3 = (None if not quantized or fold
             else x_mean.astype(f32).reshape(nb, B, 1))
    scale3 = (None if not quantized or fold
              else x_scale.astype(f32).reshape(nb, B, 1))
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
    xsq3 = xsq_pad.astype(f32).reshape(nb, B, 1)
    valid3 = valid_pad.astype(jnp.int32).reshape(nb, B, 1)
    denom3 = denom.reshape(nb, B, 1)
    sd3 = sd.reshape(nb, B, 1)
    z3 = z_arr.astype(f32).reshape(n_rounds, B, 1)
    border_i = block_order.astype(jnp.int32)
    inner_i = inner_by_pos.astype(jnp.int32)
    beta_flat = beta_pad.astype(f32).reshape(Mpad)
    lane = jnp.arange(B, dtype=border_i.dtype)
    xt_blocks = xt.reshape(nb, B, xrow)

    def run_chunk(carry, xs):
        eps2d, beta_flat = carry
        border_c, inner_c, z_c = xs
        cb = border_c.shape[0]
        if slice_per_call:
            xt_c = jnp.take(xt_blocks, border_c, axis=0).reshape(cb * B, xrow)
        else:
            xt_c = xt
        esum0 = (jnp.sum(eps2d, axis=1) if fold else None)
        eps2d, beta_c = call(border_c, inner_c, xt_c, gram, xsq3, valid3,
                             z_c, denom3, sd3, beta_flat.reshape(nb, B, 1),
                             eps2d, x_mean3=mean3, x_scale3=scale3,
                             xt_positional=slice_per_call,
                             x_srow3=srow3, x_msrow3=msrow3, x_xsum3=xsum3,
                             esum0=esum0)
        if fold:
            # re-zero drifted pad lanes (see bayesr_sweep_pallas)
            eps2d = eps2d * lane_mask
        idx = (border_c[:, None] * B + lane[None, :]).reshape(-1)
        beta_flat = beta_flat.at[idx].set(beta_c.reshape(-1))
        return (eps2d, beta_flat), None

    carry = (eps2d, beta_flat)
    rem = n_rounds % CB
    if rem:
        carry, _ = run_chunk(carry, (border_i[:rem], inner_i[:rem],
                                     z3[:rem]))
    n_uniform = (n_rounds - rem) // CB
    if n_uniform == 1:
        carry, _ = run_chunk(carry, (border_i[rem:], inner_i[rem:],
                                     z3[rem:]))
    elif n_uniform > 1:
        xs = (border_i[rem:].reshape(n_uniform, CB),
              inner_i[rem:].reshape(n_uniform, CB, B),
              z3[rem:].reshape(n_uniform, CB, B, 1))
        carry, _ = lax.scan(run_chunk, carry, xs)
    eps2d, beta_flat = carry

    return (eps2d[0, :N].astype(eps.dtype),
            beta_flat.astype(beta_pad.dtype))
