"""Fused TransformerBlock backward: training-side companion to
``kernels/fused_block.py``.

The forward kernel wins 2.02x at C=32 because the block's intermediates
(qkv, depthwise taps, the 2C FFN hidden state) never touch HBM. Training
could not use it — ``pallas_call`` has no autodiff — so the train step kept
the plain XLA block (BENCHMARKS.md "Training step"). This module closes
that gap with a custom VJP whose backward is TWO Pallas passes mirroring
the forward's gram/apply split:

  * **Pass B1** recomputes the attention output and the whole FFN from x in
    VMEM (LN1 -> v -> x2 -> LN2 -> hidden -> GELU), consumes the upstream
    dy, and emits (a) the per-pixel ``dx2`` (grad at the first-residual
    output), (b) all FFN/LN2/projection-bias weight-grad accumulators, and
    (c) the global ``d_apply`` accumulator (the attention-apply matrix is
    global over pixels, exactly like the forward gram).
  * A tiny XLA-side ``jax.vjp`` through ``finalize_attention`` turns
    ``d_apply`` into d_gram / d_qss / d_kss / d_temperature / d_Wproj using
    the [C,C]-sized residuals saved by the forward.
  * **Pass B2** recomputes q/k, forms dq/dk from d_gram and dv from dx2,
    backprops the three depthwise convs (transposed dw3x3 == dw3x3 with a
    flipped kernel), the three 1x1s and LayerNorm1, and emits dx plus the
    attention-branch weight grads.

Saved residuals: x itself plus the [C,C]-sized gram/qss/kss/apply — i.e.
remat-grade memory, with everything pixel-sized recomputed inside VMEM.

Scope (the training operating point): lane-packed batches (g = 256//C
images in lanes) with no spatial W-segment packing, single W tile
(w <= 1536), chunks == 1. Anything else falls back to the XLA block.

Reference semantics differentiated here: TransformerBlock
``/root/reference/RawFomer_WFB_FFAB/model.py:372-391`` (attention :338-370,
ConvFFN :319-336, LayerNorm :89-135).

Geometry: windows carry 3 halo rows / 4 halo cols (one more than the
forward's 2: the FFN backward chain dx2 <- df_pre <- f_pre <- t <- x2 <- x
reaches 3 rows/cols out). Window row o maps to global row i*th + o - 3 and
col c to global col c - 4; every derived tensor's offset is tracked through
the same slice/roll bookkeeping as the forward kernel.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayer_low_light_image_enhancement_tpu.kernels.fused_block import (
    _block_diag,
    _dw3x3,
    _gelu_exact,
    _matmul,
    _real_mask,
    finalize_attention,
    fused_transformer_block,
)

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _win6(prev_ref, cur_ref, nxt_ref, th):
    """(th+6)-row halo window from three consecutive th-row blocks."""
    return jnp.concatenate(
        [prev_ref[0, 0, th - 3 :], cur_ref[0, 0], nxt_ref[0, 0, :3]], axis=0
    )


def _dma_win6(refs_and_bufs, bb, i, *, nt, th):
    """Double-buffered explicit DMA of the overlapping (th+6)-row windows
    for N streams at grid step (bb, i) — the v4 forward restructure
    (fused_block._dma_window) ported to the backward kernels, whose blocked
    prev/cur/nxt specs serialised the window assembly ahead of compute
    exactly like the forward's did (1.45x on the forward twin,
    BENCHMARKS.md round 3). Inputs are H-padded by 3 top / >=3 bottom so
    window i = rows [i*th, i*th+th+6) is static-size, in-bounds, and exact
    zeros outside the real image.

    ``refs_and_bufs``: sequence of (hbm_ref [B2, hp+6, Wp, Cg], buf
    [2, th+6, Wp, Cg], sems [2]) per stream. Returns the per-stream window
    values. Grid dims must iterate sequentially (dimension_semantics
    'arbitrary') for the slot chaining."""
    step = bb * nt + i
    total = pl.num_programs(0) * nt

    def _start(s):
        sb, si = s // nt, s % nt
        for hbm, buf, sems in refs_and_bufs:
            pltpu.make_async_copy(
                hbm.at[sb, pl.ds(si * th, th + 6)],
                buf.at[s % 2],
                sems.at[s % 2],
            ).start()

    @pl.when(step == 0)
    def _():
        _start(0)

    @pl.when(step + 1 < total)
    def _():
        _start(step + 1)

    out = []
    for hbm, buf, sems in refs_and_bufs:
        pltpu.make_async_copy(
            hbm.at[bb, pl.ds(i * th, th + 6)],
            buf.at[step % 2],
            sems.at[step % 2],
        ).wait()
        out.append(buf[step % 2])
    return out


def _ln_fwd(x_f32, w_ref, b_ref, mavg_ref, eps=1e-5):
    """LayerNorm forward returning (y, xhat, rsig) for reuse in backward."""
    mu = _matmul(x_f32, mavg_ref, _F32)
    var = _matmul(x_f32 * x_f32, mavg_ref, _F32) - mu * mu
    rsig = jax.lax.rsqrt(var + eps)
    xhat = (x_f32 - mu) * rsig
    return xhat * w_ref[0].astype(_F32) + b_ref[0].astype(_F32), xhat, rsig


def _ln_bwd(dz, xhat, rsig, w_ref, mavg_ref):
    """Backward of biased-var channel LayerNorm. dz: grad wrt LN output
    (post-affine), fp32. Returns dx (fp32); caller accumulates
    dW = sum dz*xhat and db = sum dz."""
    dzh = dz * w_ref[0].astype(_F32)
    m1 = _matmul(dzh, mavg_ref, _F32)
    m2 = _matmul(dzh * xhat, mavg_ref, _F32)
    return rsig * (dzh - m1 - xhat * m2)


def _gelu_grad(x):
    """d/dx of exact GELU via the same A&S erf approximation as the forward:
    0.5*(1+erf(x/sqrt(2))) + x * pdf(x)."""
    z = x * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * x * x)
    return 0.5 * (1.0 + erf) + x * pdf


def _rows_dot(a, b):
    """sum_o a[o]^T @ b[o] for [R, W, Ca] x [R, W, Cb] -> [Ca, Cb] fp32."""
    dn = (((0,), (0,)), ((), ()))
    acc = None
    for o in range(a.shape[0]):
        t = jax.lax.dot_general(a[o], b[o], dimension_numbers=dn,
                                preferred_element_type=_F32)
        acc = t if acc is None else acc + t
    return acc


def _dw_kernel_grad(z, d, own):
    """d_kernel[di*3+dj, ch] = sum_own z[o+di, c+dj] * d[o, c].

    z: [R, W, F] (pre-activation input of the dw conv), d: [R-2, W, F]
    (grad at the dw output, which carries the +1 col offset), own: mask on
    d's geometry restricting to this tile's owned real pixels."""
    r = z.shape[0]
    dm = (d * own).astype(_F32)
    rows = []
    for di in range(3):
        zs = z[di : r - 2 + di].astype(_F32)
        for dj in range(3):
            zz = jnp.roll(zs, -dj, axis=1) if dj else zs
            rows.append(jnp.sum(zz * dm, axis=(0, 1), keepdims=True)[0])
    return jnp.concatenate(rows, axis=0)  # [9, F]


def _own_mask(i, th, hw_ref, rows, wp, row_off, col_off, dtype=_BF16):
    """Real-image mask AND tile-ownership (rows [i*th, i*th+th))."""
    h_real, w_real = hw_ref[0], hw_ref[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 1)
    g = i * th + ri + row_off
    c = ci + col_off
    ok = (g >= i * th) & (g < jnp.minimum((i + 1) * th, h_real))
    ok &= (c >= 0) & (c < w_real)
    return ok.astype(dtype)


def _bwd1_kernel(
    hw_ref,
    *refs,
    # use_dma=False: refs = (xprev, xcur, xnxt, dyprev, dycur, dynxt,
    #                        <weights>, <outputs>) — blocked row specs
    # use_dma=True:  refs = (x_hbm, dy_hbm [B2, hp+6, Wp, Cg] in ANY,
    #                        <weights>, <outputs>, bufx, semx, bufy, semy)
    # weights: mavg, apply (1,Cg,Cg), ln1w, ln1b, wv, bv, dwv, bdwv, bproj,
    #          ln2w, ln2b, wp1, bp1, wp1T, dwf, dwfF, bdwf, wp2T
    # outputs: dx2 [1,th,W,Cg], dapply [1,Cg,Cg], dW1, db1, ddwf, dbdwf,
    #          dW2, db2, dln2w, dln2b, dbproj
    th: int,
    w_out: int,
    nt: int,
    use_dma: bool,
):
    i = pl.program_id(1)
    bb = pl.program_id(0)
    if use_dma:
        (x_hbm, dy_hbm, mavg_ref, apply_ref, ln1w_ref, ln1b_ref,
         wv_ref, bv_ref, dwv_ref, bdwv_ref, bproj_ref, ln2w_ref, ln2b_ref,
         wp1_ref, bp1_ref, wp1T_ref, dwf_ref, dwfF_ref, bdwf_ref, wp2T_ref,
         dx2_ref, dapply_ref, dw1_ref, db1_ref, ddwf_ref, dbdwf_ref,
         dw2_ref, db2_ref, dln2w_ref, dln2b_ref, dbproj_ref,
         bufx, semx, bufy, semy) = refs
    else:
        (xprev, xcur, xnxt, dyprev, dycur, dynxt, mavg_ref, apply_ref,
         ln1w_ref, ln1b_ref, wv_ref, bv_ref, dwv_ref, bdwv_ref, bproj_ref,
         ln2w_ref, ln2b_ref, wp1_ref, bp1_ref, wp1T_ref, dwf_ref, dwfF_ref,
         bdwf_ref, wp2T_ref, dx2_ref, dapply_ref, dw1_ref, db1_ref,
         ddwf_ref, dbdwf_ref, dw2_ref, db2_ref, dln2w_ref, dln2b_ref,
         dbproj_ref) = refs

    @pl.when((bb == 0) & (i == 0))
    def _init_shared():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        ddwf_ref[...] = jnp.zeros_like(ddwf_ref)
        dbdwf_ref[...] = jnp.zeros_like(dbdwf_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dln2w_ref[...] = jnp.zeros_like(dln2w_ref)
        dln2b_ref[...] = jnp.zeros_like(dln2b_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)

    @pl.when(i == 0)
    def _init_batch():
        dapply_ref[...] = jnp.zeros_like(dapply_ref)

    if use_dma:
        # H-padded exact-zero windows: no input masking needed (pad pixels
        # are zeros, and every derived tensor is masked where it matters).
        x, dyw = _dma_win6(
            [(x_hbm, bufx, semx), (dy_hbm, bufy, semy)], bb, i, nt=nt, th=th
        )
        r6, wp, cg = x.shape
        m0 = _real_mask(i, th, hw_ref, r6, wp, row_off=-3, col_off=-4)
    else:
        x = _win6(xprev, xcur, xnxt, th)          # [R6, Wp, Cg] bf16
        dyw = _win6(dyprev, dycur, dynxt, th)
        r6, wp, cg = x.shape
        m0 = _real_mask(i, th, hw_ref, r6, wp, row_off=-3, col_off=-4)
        x = x * m0
        dyw = dyw * _real_mask(i, th, hw_ref, r6, wp, row_off=-3, col_off=-4)

    # ---- forward recompute (all in VMEM) --------------------------------
    xn_f, _, _ = _ln_fwd(x.astype(_F32), ln1w_ref, ln1b_ref, mavg_ref)
    xn = (xn_f * m0.astype(_F32)).astype(_BF16)

    mv4 = _real_mask(i, th, hw_ref, r6 - 2, wp, row_off=-2, col_off=-3)
    v = _dw3x3((_matmul(xn, wv_ref) + bv_ref[0]) * m0, dwv_ref)
    v = (v + bdwv_ref[0]) * mv4                       # (-2,-3), th+4 rows
    att = (_matmul(v, apply_ref[0]) + bproj_ref[0]) * mv4
    x2 = jnp.roll(x[1 : r6 - 1], -1, axis=1) + att    # (-2,-3), th+4 rows

    yn_f, xhat2, rsig2 = _ln_fwd(x2.astype(_F32), ln2w_ref, ln2b_ref, mavg_ref)
    yn = (yn_f * mv4.astype(_F32)).astype(_BF16)
    t = (_matmul(yn, wp1_ref) + bp1_ref[0]) * mv4     # (-2,-3), th+4 rows
    mv2 = _real_mask(i, th, hw_ref, r6 - 4, wp, row_off=-1, col_off=-2)
    f_pre = (_dw3x3(t, dwf_ref) + bdwf_ref[0]).astype(_F32)  # (-1,-2), th+2
    f_pre = f_pre * mv2.astype(_F32)
    gact = _gelu_exact(f_pre).astype(_BF16) * mv2

    # ---- FFN backward ----------------------------------------------------
    # dy at f geometry (-1,-2): window rows [2, th+4), cols rolled -2.
    dy_f = jnp.roll(dyw[2 : r6 - 2], -2, axis=1) * mv2
    dg = _matmul(dy_f, wp2T_ref) * mv2                       # [th+2, Wp, Chg]
    df_pre = (dg.astype(_F32) * _gelu_grad(f_pre)).astype(_BF16) * mv2
    dt = _dw3x3(df_pre, dwfF_ref)                            # (0,-1), th rows
    m_own = _own_mask(i, th, hw_ref, r6 - 6, wp, row_off=0, col_off=-1)
    dt = dt * m_own
    dyn = (_matmul(dt, wp1T_ref) * m_own).astype(_F32)       # (0,-1), th rows

    # LN2 backward at (0,-1): slice the (-2,-3)-geometry stats.
    xhat2_c = jnp.roll(xhat2[2 : 2 + th], -2, axis=1)
    rsig2_c = jnp.roll(rsig2[2 : 2 + th], -2, axis=1)
    dx2_ffn = _ln_bwd(dyn, xhat2_c, rsig2_c, ln2w_ref, mavg_ref)

    dy_own = jnp.roll(dyw[3 : 3 + th], -3, axis=1)           # (0,-1)
    dx2 = ((dy_own.astype(_F32) + dx2_ffn) * m_own.astype(_F32)).astype(_BF16)
    dx2_ref[0] = dx2[:, 1 : 1 + w_out].astype(dx2_ref.dtype)

    # ---- accumulators ----------------------------------------------------
    # d_apply: v at (0,-1) = rows [2, th+2) of the (-2,-3) tensor, roll -2.
    v_own = jnp.roll(v[2 : 2 + th], -2, axis=1) * m_own
    dapply_ref[0] += _rows_dot(v_own, dx2)
    dbproj_ref[...] += jnp.sum(dx2.astype(_F32), axis=(0, 1), keepdims=True)[0]

    own2 = _own_mask(i, th, hw_ref, r6 - 4, wp, row_off=-1, col_off=-2)
    dw2_ref[...] += _rows_dot(gact * own2, dy_f)
    db2_ref[...] += jnp.sum((dy_f * own2).astype(_F32), axis=(0, 1),
                            keepdims=True)[0]
    ddwf_ref[...] += _dw_kernel_grad(t, df_pre, own2)
    dbdwf_ref[...] += jnp.sum((df_pre * own2).astype(_F32), axis=(0, 1),
                              keepdims=True)[0]
    yn_own = jnp.roll(yn[2 : 2 + th], -2, axis=1) * m_own
    dw1_ref[...] += _rows_dot(yn_own, dt)
    db1_ref[...] += jnp.sum(dt.astype(_F32), axis=(0, 1), keepdims=True)[0]
    dln2w_ref[...] += jnp.sum(dyn * jnp.roll(xhat2[2 : 2 + th], -2, axis=1)
                              * m_own.astype(_F32), axis=(0, 1), keepdims=True)[0]
    dln2b_ref[...] += jnp.sum(dyn * m_own.astype(_F32), axis=(0, 1),
                              keepdims=True)[0]


def _bwd2_kernel(
    hw_ref,
    *refs,
    # use_dma=False: refs = (xprev, xcur, xnxt, d2prev, d2cur, d2nxt,
    #                        <weights>, <outputs>)
    # use_dma=True:  refs = (x_hbm, d2_hbm, <weights>, <outputs>,
    #                        bufx, semx, bufd, semd)
    # weights: mavg, applyT, dgramT, dgram, dqss, dkss, ln1w, ln1b,
    #          (wq,bq,dwq,dwqF,bdwq), (wk,...), (wv,...), wqT, wkT, wvT
    # outputs: dx, dWq, dWk, dWv, dbq, dbk, dbv, ddwq, ddwk, ddwv,
    #          dbdwq, dbdwk, dbdwv, dln1w, dln1b
    th: int,
    w_out: int,
    nt: int,
    use_dma: bool,
):
    i = pl.program_id(1)
    bb = pl.program_id(0)
    if use_dma:
        (x_hbm, d2_hbm, mavg_ref, applyT_ref, dgramT_ref, dgram_ref,
         dqss_ref, dkss_ref, ln1w_ref, ln1b_ref,
         wq_ref, bq_ref, dwq_ref, dwqF_ref, bdwq_ref,
         wk_ref, bk_ref, dwk_ref, dwkF_ref, bdwk_ref,
         wv_ref, bv_ref, dwv_ref, dwvF_ref, bdwv_ref,
         wqT_ref, wkT_ref, wvT_ref,
         dx_ref, dwq_out, dwk_out, dwv_out, dbq_out, dbk_out, dbv_out,
         ddwq_out, ddwk_out, ddwv_out, dbdwq_out, dbdwk_out, dbdwv_out,
         dln1w_out, dln1b_out, bufx, semx, bufd, semd) = refs
    else:
        (xprev, xcur, xnxt, d2prev, d2cur, d2nxt, mavg_ref, applyT_ref,
         dgramT_ref, dgram_ref, dqss_ref, dkss_ref, ln1w_ref, ln1b_ref,
         wq_ref, bq_ref, dwq_ref, dwqF_ref, bdwq_ref,
         wk_ref, bk_ref, dwk_ref, dwkF_ref, bdwk_ref,
         wv_ref, bv_ref, dwv_ref, dwvF_ref, bdwv_ref,
         wqT_ref, wkT_ref, wvT_ref,
         dx_ref, dwq_out, dwk_out, dwv_out, dbq_out, dbk_out, dbv_out,
         ddwq_out, ddwk_out, ddwv_out, dbdwq_out, dbdwk_out, dbdwv_out,
         dln1w_out, dln1b_out) = refs

    @pl.when((bb == 0) & (i == 0))
    def _init():
        for ref in (dwq_out, dwk_out, dwv_out, dbq_out, dbk_out, dbv_out,
                    ddwq_out, ddwk_out, ddwv_out, dbdwq_out, dbdwk_out,
                    dbdwv_out, dln1w_out, dln1b_out):
            ref[...] = jnp.zeros_like(ref)

    if use_dma:
        x, d2w = _dma_win6(
            [(x_hbm, bufx, semx), (d2_hbm, bufd, semd)], bb, i, nt=nt, th=th
        )
        r6, wp, cg = x.shape
        m0 = _real_mask(i, th, hw_ref, r6, wp, row_off=-3, col_off=-4)
    else:
        x = _win6(xprev, xcur, xnxt, th)
        d2w = _win6(d2prev, d2cur, d2nxt, th)
        r6, wp, cg = x.shape
        m0 = _real_mask(i, th, hw_ref, r6, wp, row_off=-3, col_off=-4)
        x = x * m0
        d2w = d2w * _real_mask(i, th, hw_ref, r6, wp, row_off=-3, col_off=-4)

    xn_f, xhat1, rsig1 = _ln_fwd(x.astype(_F32), ln1w_ref, ln1b_ref, mavg_ref)
    xn = (xn_f * m0.astype(_F32)).astype(_BF16)

    mv4 = _real_mask(i, th, hw_ref, r6 - 2, wp, row_off=-2, col_off=-3)
    preq = (_matmul(xn, wq_ref) + bq_ref[0]) * m0
    prek = (_matmul(xn, wk_ref) + bk_ref[0]) * m0
    prev_ = (_matmul(xn, wv_ref) + bv_ref[0]) * m0
    q = (_dw3x3(preq, dwq_ref) + bdwq_ref[0]) * mv4
    k = (_dw3x3(prek, dwk_ref) + bdwk_ref[0]) * mv4

    # dq/dk from the global gram grad; dv from dx2 (att positions).
    # gram[c,d] = sum_p q[p,c] k[p,d]; qss[c] = sum q^2.
    dq = (_matmul(k, dgramT_ref[0]) +
          2.0 * q.astype(_F32) * dqss_ref[0, 0]).astype(_BF16) * mv4
    dk = (_matmul(q, dgram_ref[0]) +
          2.0 * k.astype(_F32) * dkss_ref[0, 0]).astype(_BF16) * mv4
    # dx2 at att geometry (-2,-3): window rows [1, th+5), cols rolled +1
    # (window col c maps to c-4; att needs c-3 -> shift content left by 1
    #  ... i.e. att[c] = window[c+1] -> roll -1).
    datt = jnp.roll(d2w[1 : r6 - 1], -1, axis=1) * mv4
    dv = _matmul(datt, applyT_ref[0]) * mv4

    dpq = _dw3x3(dq, dwqF_ref)            # (-1,-2), th+2 rows
    dpk = _dw3x3(dk, dwkF_ref)
    dpv = _dw3x3(dv, dwvF_ref)
    mv2 = _real_mask(i, th, hw_ref, r6 - 4, wp, row_off=-1, col_off=-2)
    dpq = dpq * mv2
    dpk = dpk * mv2
    dpv = dpv * mv2

    dxn = (_matmul(dpq, wqT_ref, _F32) + _matmul(dpk, wkT_ref, _F32)
           + _matmul(dpv, wvT_ref, _F32))

    # LN1 backward at owned rows (0,-1).
    m_own = _own_mask(i, th, hw_ref, th, wp, row_off=0, col_off=-1)
    dxn_own = jnp.roll(dxn[1 : 1 + th], -1, axis=1) * m_own.astype(_F32)
    xhat1_c = jnp.roll(xhat1[3 : 3 + th], -3, axis=1)
    rsig1_c = jnp.roll(rsig1[3 : 3 + th], -3, axis=1)
    dx_ln = _ln_bwd(dxn_own, xhat1_c, rsig1_c, ln1w_ref, mavg_ref)

    d2_own = jnp.roll(d2w[3 : 3 + th], -3, axis=1).astype(_F32)
    dx = (d2_own + dx_ln) * m_own.astype(_F32)
    dx_ref[0] = dx[:, 1 : 1 + w_out].astype(dx_ref.dtype)

    # ---- weight-grad accumulators ---------------------------------------
    own2 = _own_mask(i, th, hw_ref, r6 - 4, wp, row_off=-1, col_off=-2)
    xn2 = jnp.roll(xn[2 : r6 - 2], -2, axis=1)     # xn at (-1,-2)
    dwq_out[...] += _rows_dot(xn2 * own2, dpq)
    dwk_out[...] += _rows_dot(xn2 * own2, dpk)
    dwv_out[...] += _rows_dot(xn2 * own2, dpv)
    for ref, dp in ((dbq_out, dpq), (dbk_out, dpk), (dbv_out, dpv)):
        ref[...] += jnp.sum((dp * own2).astype(_F32), axis=(0, 1),
                            keepdims=True)[0]
    own4 = _own_mask(i, th, hw_ref, r6 - 2, wp, row_off=-2, col_off=-3)
    ddwq_out[...] += _dw_kernel_grad(preq, dq, own4)
    ddwk_out[...] += _dw_kernel_grad(prek, dk, own4)
    ddwv_out[...] += _dw_kernel_grad(prev_, dv, own4)
    for ref, dd in ((dbdwq_out, dq), (dbdwk_out, dk), (dbdwv_out, dv)):
        ref[...] += jnp.sum((dd * own4).astype(_F32), axis=(0, 1),
                            keepdims=True)[0]
    dln1w_out[...] += jnp.sum(dxn_own * xhat1_c, axis=(0, 1), keepdims=True)[0]
    dln1b_out[...] += jnp.sum(dxn_own, axis=(0, 1), keepdims=True)[0]


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

def _geometry(b, c, w):
    """Mirror fused_block's lane-packing choice; None = not trainable-fusable."""
    if c > 64 or w > 1536:
        return None
    g_target = max(1, 256 // c)
    g = next(gg for gg in range(min(g_target, b), 0, -1) if b % gg == 0)
    if g_target // g >= 2:
        return None  # forward would engage spatial W-packing
    return g


def trainable_fusable(x, c=None):
    b, _, w, cc = x.shape if c is None else (*x.shape[:3], c)
    return _geometry(b, cc, w) is not None


def _pack(x, g, b2, cg):
    b, h, w, c = x.shape
    return jnp.transpose(
        x.astype(_BF16).reshape(b2, g, h, w, c), (0, 2, 3, 1, 4)
    ).reshape(b2, h, w, cg)


def _unpack(y, g, b, h, w, c):
    b2 = b // g
    return jnp.transpose(y.reshape(b2, h, w, g, c), (0, 3, 1, 2, 4)).reshape(
        b, h, w, c
    )


def _diag_sum(m, g, ci, co):
    """Sum the g diagonal [ci, co] blocks of a packed [g*ci, g*co] matrix."""
    return jnp.einsum("icih->ch", m.reshape(g, ci, g, co))


def _vec_sum(v, g, c):
    return v.reshape(g, c).sum(0)


def _bd_batch(mats, g):
    """[B, C, C] per-image -> [B2, gC, gC] block-diagonal packed."""
    b, c, _ = mats.shape
    b2 = b // g
    blocks = mats.reshape(b2, g, c, c)
    out = jnp.zeros((b2, g * c, g * c), mats.dtype)
    for j in range(g):
        out = out.at[:, j * c : (j + 1) * c, j * c : (j + 1) * c].set(blocks[:, j])
    return out


def _weights(params, c, g):
    """Packed/flipped/transposed weight arrays shared by both passes."""
    tile_v = lambda v: jnp.tile(jnp.reshape(v, (1, -1)), (1, g))
    tile_dw = lambda kk: jnp.tile(kk, (1, 1, g))
    bd = lambda m: _block_diag(m, g)
    p_attn = params["attn"]
    wqkv = jnp.reshape(p_attn["qkv"]["kernel"], (c, 3 * c))
    bqkv = p_attn["qkv"]["bias"]
    wdw = jnp.reshape(p_attn["qkv_dwconv"]["kernel"], (3, 3, 3 * c))
    bdw = p_attn["qkv_dwconv"]["bias"]
    p_ffn = params["ffn"]
    ch = p_ffn["pointwise1"]["kernel"].shape[-1]
    wp1 = jnp.reshape(p_ffn["pointwise1"]["kernel"], (c, ch))
    wdwf = jnp.reshape(p_ffn["depthwise"]["kernel"], (3, 3, ch))
    wp2 = jnp.reshape(p_ffn["pointwise2"]["kernel"], (ch, c))
    flip = lambda kk: kk[::-1, ::-1]
    W = {
        "mavg": _block_diag(jnp.full((c, c), 1.0 / c, _F32), g),
        "ln1w": tile_v(params["norm1"]["weight"]),
        "ln1b": tile_v(params["norm1"]["bias"]),
        "ln2w": tile_v(params["norm2"]["weight"]),
        "ln2b": tile_v(params["norm2"]["bias"]),
        "bproj": tile_v(p_attn["project_out"]["bias"]),
        "ch": ch,
    }
    for name, sl in (("q", slice(0, c)), ("k", slice(c, 2 * c)),
                     ("v", slice(2 * c, 3 * c))):
        W["w" + name] = bd(wqkv[:, sl])
        W["w" + name + "T"] = bd(wqkv[:, sl].T)
        W["b" + name] = tile_v(bqkv[sl])
        W["dw" + name] = tile_dw(wdw[:, :, sl])
        W["dw" + name + "F"] = tile_dw(flip(wdw[:, :, sl]))
        W["bdw" + name] = tile_v(bdw[sl])
    W["wp1"] = bd(wp1)
    W["wp1T"] = bd(wp1.T)
    W["bp1"] = tile_v(p_ffn["pointwise1"]["bias"])
    W["dwf"] = tile_dw(wdwf)
    W["dwfF"] = tile_dw(flip(wdwf))
    W["bdwf"] = tile_v(p_ffn["depthwise"]["bias"])
    W["wp2T"] = bd(wp2.T)
    return W


def _row_blocks(a, th, nt):
    """[B2, hp, Wp, Cg] -> block specs consume it as [B2, nt, th, Wp, Cg]."""
    b2, hp, wp, cg = a.shape
    return a.reshape(b2, nt, th, wp, cg)


def _win_specs(th, wp, cg, nt):
    blk = lambda f: pl.BlockSpec(
        (1, 1, th, wp, cg), lambda bb, i, *_: (bb, f(i), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return [
        blk(lambda i: jnp.maximum(i - 1, 0)),
        blk(lambda i: i),
        blk(lambda i: jnp.minimum(i + 1, nt - 1)),
    ]


def _rep(shape):
    return pl.BlockSpec(shape, lambda *_: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def fused_block_backward(
    x: jnp.ndarray,
    dy: jnp.ndarray,
    params: Dict[str, Any],
    residuals: Tuple[jnp.ndarray, ...],
    num_heads: int,
    tile_rows: int = 8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Backward pass: (dy, saved residuals) -> (dx, dparams)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gram_img, qss_img, kss_img, apply_img = residuals
    b, h, w, c = x.shape
    g = _geometry(b, c, w)
    assert g is not None, "fused_block_backward outside trainable geometry"
    b2, cg = b // g, g * c
    th = tile_rows
    hp = -(-h // th) * th
    nt = hp // th
    W = _weights(params, c, g)
    ch = W["ch"]
    chg = g * ch

    # Explicit-DMA overlapping windows (the v4 forward restructure — see
    # _dma_win6) when the packed lane count is 128-aligned, which every
    # c = 256//g training geometry satisfies; unaligned (odd-batch) cases
    # keep the blocked prev/cur/nxt specs (Mosaic can't DMA-slice them).
    use_dma = cg % 128 == 0
    extra = (-(w + 8)) % 8 if use_dma else 0
    wp8 = w + 8 + extra
    if use_dma:
        # H-padded by 3 so windows [i*th, i*th+th+6) are static, in-bounds,
        # and exact zeros outside the image.
        pad = lambda a: jnp.pad(
            a.astype(_BF16), ((0, 0), (3, 3 + hp - h), (4, 4 + extra), (0, 0))
        )
        xg = pad(_pack(x, g, b2, cg))
        dyg = pad(_pack(dy, g, b2, cg))
    else:
        pad = lambda a: jnp.pad(
            a.astype(_BF16), ((0, 0), (0, hp - h), (4, 4), (0, 0))
        )
        xg = _row_blocks(pad(_pack(x, g, b2, cg)), th, nt)
        dyg = _row_blocks(pad(_pack(dy, g, b2, cg)), th, nt)
    hw = jnp.asarray([h, w], jnp.int32)
    apply_bd = _bd_batch(apply_img.astype(_F32), g)

    if use_dma:
        win_in = lambda: [pl.BlockSpec(memory_space=pltpu.ANY)]
        win_scratch = lambda: [
            pltpu.VMEM((2, th + 6, wp8, cg), _BF16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        bwd_sem = ("arbitrary", "arbitrary")
    else:
        win_in = lambda: _win_specs(th, wp8, cg, nt)
        win_scratch = lambda: []
        bwd_sem = None
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        **({"dimension_semantics": bwd_sem} if bwd_sem else {}),
    )

    # ---------------- pass B1 ----------------
    out_shapes = [
        jax.ShapeDtypeStruct((b2, hp, w, cg), _BF16),       # dx2
        jax.ShapeDtypeStruct((b2, cg, cg), _F32),           # d_apply
        jax.ShapeDtypeStruct((cg, chg), _F32),              # dW1
        jax.ShapeDtypeStruct((1, chg), _F32),               # db1
        jax.ShapeDtypeStruct((9, chg), _F32),               # ddwf
        jax.ShapeDtypeStruct((1, chg), _F32),               # dbdwf
        jax.ShapeDtypeStruct((chg, cg), _F32),              # dW2
        jax.ShapeDtypeStruct((1, cg), _F32),                # db2
        jax.ShapeDtypeStruct((1, cg), _F32),                # dln2w
        jax.ShapeDtypeStruct((1, cg), _F32),                # dln2b
        jax.ShapeDtypeStruct((1, cg), _F32),                # dbproj
    ]
    out_specs = [
        pl.BlockSpec((1, th, w, cg), lambda bb, i, *_: (bb, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cg, cg), lambda bb, i, *_: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        _rep((cg, chg)), _rep((1, chg)), _rep((9, chg)), _rep((1, chg)),
        _rep((chg, cg)), _rep((1, cg)), _rep((1, cg)), _rep((1, cg)),
        _rep((1, cg)),
    ]
    (dx2, dapply, dW1, db1, ddwf, dbdwf, dW2, db2, dln2w, dln2b,
     dbproj) = pl.pallas_call(
        functools.partial(_bwd1_kernel, th=th, w_out=w, nt=nt,
                          use_dma=use_dma),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b2, nt),
            in_specs=[
                *win_in(), *win_in(),
                _rep((cg, cg)),
                pl.BlockSpec((1, cg, cg), lambda bb, i, *_: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                _rep((1, cg)), _rep((1, cg)),
                _rep((cg, cg)), _rep((1, cg)), _rep((3, 3, cg)), _rep((1, cg)),
                _rep((1, cg)),
                _rep((1, cg)), _rep((1, cg)),
                _rep((cg, chg)), _rep((1, chg)),
                _rep((chg, cg)),
                _rep((3, 3, chg)), _rep((3, 3, chg)), _rep((1, chg)),
                _rep((cg, chg)),
            ],
            out_specs=out_specs,
            scratch_shapes=win_scratch() + win_scratch(),
        ),
        out_shape=out_shapes,
        compiler_params=cparams,
        interpret=interpret,
    )(
        hw, *((xg, dyg) if use_dma else (xg, xg, xg, dyg, dyg, dyg)),
        W["mavg"], apply_bd,
        W["ln1w"], W["ln1b"],
        W["wv"], W["bv"], W["dwv"], W["bdwv"],
        W["bproj"],
        W["ln2w"], W["ln2b"],
        W["wp1"], W["bp1"], W["wp1T"],
        W["dwf"], W["dwfF"], W["bdwf"],
        W["wp2T"],
    )

    # ---------------- XLA middle: finalize vjp ----------------
    dapply_img = jnp.stack(
        [dapply.reshape(b2, g, c, g, c)[:, j, :, j, :] for j in range(g)],
        axis=1,
    ).reshape(b, c, c)
    wproj = jnp.reshape(params["attn"]["project_out"]["kernel"], (c, c))
    temperature = params["attn"]["temperature"]

    def fin(gr, qs, ks, tt, wp_):
        return finalize_attention(gr, qs, ks, tt, wp_, num_heads)

    _, fin_vjp = jax.vjp(fin, gram_img, qss_img, kss_img, temperature, wproj)
    d_gram, d_qss, d_kss, d_temp, d_wproj = fin_vjp(dapply_img)

    dgram_bd = _bd_batch(d_gram.astype(_F32), g)
    dgramT_bd = _bd_batch(jnp.swapaxes(d_gram, -1, -2).astype(_F32), g)
    dqss_bd = d_qss.reshape(b2, 1, cg).astype(_F32)
    dkss_bd = d_kss.reshape(b2, 1, cg).astype(_F32)
    applyT_bd = _bd_batch(jnp.swapaxes(apply_img, -1, -2).astype(_F32), g)

    # ---------------- pass B2 ----------------
    # dx2 is already lane-packed and row-padded (tile-masked to zeros past
    # h); add the halo columns (+ H halo on the DMA path).
    if use_dma:
        d2g = jnp.pad(dx2, ((0, 0), (3, 3), (4, 4 + extra), (0, 0)))
    else:
        d2g = _row_blocks(jnp.pad(dx2, ((0, 0), (0, 0), (4, 4), (0, 0))), th, nt)
    out_shapes2 = [
        jax.ShapeDtypeStruct((b2, hp, w, cg), _BF16),
        jax.ShapeDtypeStruct((cg, cg), _F32),
        jax.ShapeDtypeStruct((cg, cg), _F32),
        jax.ShapeDtypeStruct((cg, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
        jax.ShapeDtypeStruct((9, cg), _F32),
        jax.ShapeDtypeStruct((9, cg), _F32),
        jax.ShapeDtypeStruct((9, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
        jax.ShapeDtypeStruct((1, cg), _F32),
    ]
    out_specs2 = [
        pl.BlockSpec((1, th, w, cg), lambda bb, i, *_: (bb, i, 0, 0),
                     memory_space=pltpu.VMEM),
        _rep((cg, cg)), _rep((cg, cg)), _rep((cg, cg)),
        _rep((1, cg)), _rep((1, cg)), _rep((1, cg)),
        _rep((9, cg)), _rep((9, cg)), _rep((9, cg)),
        _rep((1, cg)), _rep((1, cg)), _rep((1, cg)),
        _rep((1, cg)), _rep((1, cg)),
    ]
    batch_mat = lambda: pl.BlockSpec(
        (1, cg, cg), lambda bb, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    batch_vec = lambda: pl.BlockSpec(
        (1, 1, cg), lambda bb, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    (dxp, dWq, dWk, dWv, dbq, dbk, dbv, ddwq, ddwk, ddwv, dbdwq, dbdwk,
     dbdwv, dln1w, dln1b) = pl.pallas_call(
        functools.partial(_bwd2_kernel, th=th, w_out=w, nt=nt,
                          use_dma=use_dma),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b2, nt),
            in_specs=[
                *win_in(), *win_in(),
                _rep((cg, cg)),
                batch_mat(), batch_mat(), batch_mat(),
                batch_vec(), batch_vec(),
                _rep((1, cg)), _rep((1, cg)),
                _rep((cg, cg)), _rep((1, cg)), _rep((3, 3, cg)),
                _rep((3, 3, cg)), _rep((1, cg)),
                _rep((cg, cg)), _rep((1, cg)), _rep((3, 3, cg)),
                _rep((3, 3, cg)), _rep((1, cg)),
                _rep((cg, cg)), _rep((1, cg)), _rep((3, 3, cg)),
                _rep((3, 3, cg)), _rep((1, cg)),
                _rep((cg, cg)), _rep((cg, cg)), _rep((cg, cg)),
            ],
            out_specs=out_specs2,
            scratch_shapes=win_scratch() + win_scratch(),
        ),
        out_shape=out_shapes2,
        compiler_params=cparams,
        interpret=interpret,
    )(
        hw, *((xg, d2g) if use_dma else (xg, xg, xg, d2g, d2g, d2g)),
        W["mavg"],
        applyT_bd, dgramT_bd, dgram_bd, dqss_bd, dkss_bd,
        W["ln1w"], W["ln1b"],
        W["wq"], W["bq"], W["dwq"], W["dwqF"], W["bdwq"],
        W["wk"], W["bk"], W["dwk"], W["dwkF"], W["bdwk"],
        W["wv"], W["bv"], W["dwv"], W["dwvF"], W["bdwv"],
        W["wqT"], W["wkT"], W["wvT"],
    )

    dx = _unpack(dxp[:, :h], g, b, h, w, c).astype(x.dtype)

    # ---------------- assemble dparams ----------------
    dqkv_k = jnp.concatenate(
        [_diag_sum(m, g, c, c) for m in (dWq, dWk, dWv)], axis=-1
    ).reshape(1, 1, c, 3 * c)
    dqkv_b = jnp.concatenate([_vec_sum(v[0], g, c) for v in (dbq, dbk, dbv)])
    ddw_k = jnp.concatenate(
        [m.reshape(3, 3, g, c).sum(2) for m in (ddwq, ddwk, ddwv)], axis=-1
    )[:, :, None, :]
    ddw_b = jnp.concatenate(
        [_vec_sum(v[0], g, c) for v in (dbdwq, dbdwk, dbdwv)]
    )
    dparams = {
        "norm1": {"weight": _vec_sum(dln1w[0], g, c),
                  "bias": _vec_sum(dln1b[0], g, c)},
        "norm2": {"weight": _vec_sum(dln2w[0], g, c),
                  "bias": _vec_sum(dln2b[0], g, c)},
        "attn": {
            "qkv": {"kernel": dqkv_k, "bias": dqkv_b},
            "qkv_dwconv": {"kernel": ddw_k, "bias": ddw_b},
            "project_out": {"kernel": d_wproj.reshape(1, 1, c, c),
                            "bias": _vec_sum(dbproj[0], g, c)},
            "temperature": d_temp,
        },
        "ffn": {
            "pointwise1": {"kernel": _diag_sum(dW1, g, c, ch).reshape(1, 1, c, ch),
                           "bias": _vec_sum(db1[0], g, ch)},
            "depthwise": {"kernel": ddwf.reshape(3, 3, g, ch).sum(2)[:, :, None, :],
                          "bias": _vec_sum(dbdwf[0], g, ch)},
            "pointwise2": {"kernel": _diag_sum(dW2, g, ch, c).reshape(1, 1, ch, c),
                           "bias": _vec_sum(db2[0], g, c)},
        },
    }
    dparams = jax.tree.map(
        lambda d, p: d.astype(p.dtype), dparams,
        {k: params[k] for k in ("norm1", "norm2", "attn", "ffn")},
    )
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_transformer_block_train(x, params, num_heads, tile_rows=8):
    """TransformerBlock with fused Pallas forward AND backward.

    Drop-in for the XLA block in training at the lane-packed operating
    point (see module docstring scope). Saves only x + [C,C]-sized
    attention state between forward and backward — remat-grade memory.
    """
    return fused_transformer_block(
        x, params, num_heads, tile_rows=16, return_residuals=False
    )


def _train_fwd(x, params, num_heads, tile_rows):
    y, res = fused_transformer_block(
        x, params, num_heads, tile_rows=16, return_residuals=True
    )
    return y, (x, params, res)


def _train_bwd(num_heads, tile_rows, saved, dy):
    x, params, res = saved
    dx, dparams = fused_block_backward(
        x, dy, params, res, num_heads, tile_rows=tile_rows
    )
    return dx, dparams


fused_transformer_block_train.defvjp(_train_fwd, _train_bwd)
