"""Fully-fused TransformerBlock (LN + channel attention + ConvFFN) Pallas kernel.

The RawFormer hot path (BENCHMARKS.md): at the dominant level-1 scale
([8,256,256,32] bf16) the XLA lowering of one TransformerBlock moves ~900 MB
through HBM (qkv/depthwise/FFN intermediates) and runs at ~17% of bandwidth
roofline — 7.22 ms of the 8.59 ms stage. The math is nearly free; the traffic
is the cost. This kernel keeps every intermediate (the 3C qkv tensor, the
depthwise taps, the 2C FFN hidden state) in VMEM and touches HBM only to read
x twice and write the block output once (~96 MB).

Reference semantics fused here (cited for parity):
  * ``/root/reference/RawFomer_WFB_FFAB/model.py:372-391`` TransformerBlock:
    ``x = x + attn(norm1(x)); x = x + ffn(norm2(x))``.
  * ``:338-370`` channel attention — qkv 1x1 + 3x3 depthwise, per-head
    L2-normalised [c,c] gram over ALL pixels, softmax * temperature, apply, 1x1
    projection.
  * ``:319-336`` ConvFFN — 1x1 expand, 3x3 depthwise, exact GELU, 1x1 project.
  * ``:89-135`` WithBias LayerNorm over channels.

Design (v3; v2 notes below still hold. Round-3 additions, motivated by the
measured ~16x gap to the traffic roofline being per-tile DEPENDENCY CHAINS
rather than MXU or HBM: LN affines folded host-side into the consuming 1x1
convs, q/k produced by ONE merged [Cg, 2Cg] matmul + one depthwise pass when
the halves tile-align (cg % 128 == 0), bf16 GELU via a sign-free erf form,
depthwise column alignment rolls moved onto the bf16 input, grid dimension
semantics declared to Mosaic, and the round-2 `chunked` sub-matmul
experiment retired (0.87x, see BENCHMARKS.md). v2 design — supersedes the
retired v1 (attic/fused_attention.py), whose measured failure modes are
documented in its docstring):

  * TWO simple pipelined kernels over overlapping H-tile windows, with the
    tiny [C,C] attention finalise (normalise, temperature, per-head softmax,
    fold into the projection: apply = attn^T @ Wproj) done in plain XLA
    between them. No cross-grid-step scratch carries, no phase branching —
    the fragile parts of v1.
      - Kernel A: LN1 -> q,k (1x1 + dw3x3) -> accumulate gram + sumsq per
        image via output revisiting.
      - Kernel B: LN1 -> v only (v1 recomputed the full qkv), y = x + v@apply
        + bias, then the whole FFN (LN2 -> 1x1 -> dw3x3 -> GELU -> 1x1) and
        both residuals.
  * Depthwise 3x3 without relayouts (v1's 9 lane-shifted slices were the
    main loss): rows combine via LEADING-dim slices (free), columns align via
    two sublane ``jnp.roll``s per conv. No reshapes, no offset column slices
    anywhere in either kernel; tensors stay [rows, W+4, F] with compile-time
    column-offset bookkeeping and iota masks against the real H/W passed as
    scalar prefetch.
  * q, k, v are produced by separate matmuls (not lane-sliced from a packed
    3C tensor).

Numerics: LN/statistics and depthwise accumulation in fp32; matmuls bf16 in
-> fp32 accumulate -> bf16 out, matching the module path's bf16 compute
config at bf16 tolerances. Folding the projection into the attention apply
(one matmul instead of two) is an associativity change absorbed by the same
tolerance.

Inference-only: ``pallas_call`` has no autodiff here; training keeps the XLA
path (see models/fused_apply.py for the interception wiring).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _auto_band_default() -> bool:
    """Kernel-internal auto H-banding at batch 1 (``BAYER_TPU_BAND=1``).

    Default OFF: the banded kernel wins ISOLATED (full-res L1 block 14.9 ms
    banded vs 16.9 g_sp) but the full-res graph REGRESSED (165.1 vs 160.8
    ms) — the pad/reshape/halo-gather at every kernel entry breaks XLA's
    scheduling around it. Model-level banding (fused_apply
    make_banded_forward), which keeps tensors band-shaped between stages,
    is the shipped full-res path (152.7 ms)."""
    import os

    return os.environ.get("BAYER_TPU_BAND", "0") == "1"


def _ln_core(x_f32, msum_ref, inv_c, eps=1e-5, bf16_stats=True):
    """Channel LayerNorm WITHOUT the affine (torch semantics: biased var,
    fp32 stats), returning bf16. The affine (w, b) is folded into the next
    1x1 conv's weights host-side (w into the rows of W, b into the bias via
    b @ W) — exact up to fp32 rounding, and it removes two full-tensor fp32
    VPU ops per LN from the kernel's serial chain. A zero input pixel
    normalises to exactly zero, so pre-masked windows need no post-LN mask.

    The mean over each image's channel segment is one [.., Cg] @ [Cg, Cg]
    MXU dot with a BINARY block-diagonal segment-sum matrix (``msum_ref``;
    the exact 1/c scale is applied afterwards in fp32) — with g images packed
    in the lane dim this is a segmented reduction the VPU can't express; with
    g=1 it degenerates to the plain channel sum.

    ``bf16_stats``: run the two stats matmuls with bf16 operands (fp32 MXU
    accumulation). The input x is already bf16-valued (it came from HBM as
    bf16) and the sum matrix is 0/1, so the mean is EXACT w.r.t. the data;
    the variance uses the cancellation-free centered form E[(x-mu)^2] where
    the bf16 rounding of (x-mu) costs ~2^-9 relative on var — far inside the
    model's bf16 tolerance. fp32 matmuls pass the MXU at a fraction of bf16
    rate, and the three LNs per block are the kernels' largest MXU slice.
    """
    if bf16_stats:
        mu = _matmul(x_f32.astype(_BF16), msum_ref, _F32) * inv_c
        d = x_f32 - mu
        db = d.astype(_BF16)
        var = _matmul(db * db, msum_ref, _F32) * inv_c
    else:
        mu = _matmul(x_f32, msum_ref, _F32) * inv_c
        d = x_f32 - mu
        var = _matmul(d * d, msum_ref, _F32) * inv_c
    return (d * jax.lax.rsqrt(var + eps)).astype(_BF16)


def _dw3x3(z, w_ref):
    """Width-preserving depthwise 3x3 'VALID-rows' conv.

    z: [R, Wp, F] bf16; w_ref: (3, 3, F). Returns [R-2, Wp, F] bf16 whose
    (o, c) entry is the conv centred at z[o+1, c+1] — i.e. the result carries
    a +1 column offset; the two trailing columns are wrap garbage to be
    masked by the caller. Row taps are leading-dim slices (free); column
    alignment is two sublane rolls on the bf16 INPUT (half the bytes of the
    fp32 partial-sum rolls this replaces) — no lane relayouts anywhere.
    """
    r = z.shape[0]
    zs = (z, jnp.roll(z, -1, axis=1), jnp.roll(z, -2, axis=1))
    acc = None
    for dj in range(3):
        zj = zs[dj]
        s = (
            zj[0 : r - 2] * w_ref[0, dj]
            + zj[1 : r - 1] * w_ref[1, dj]
            + zj[2:r] * w_ref[2, dj]
        ).astype(_F32)
        acc = s if acc is None else acc + s
    return acc.astype(_BF16)


def _seg_off(cg, c_img, g_sp, w_seg):
    """Per-lane global-column offset under spatial (W-segment) lane packing.

    Lane l belongs to packed image l//c_img whose W-segment index is
    (l//c_img) % g_sp; its columns start at seg*w_seg globally, and the
    segment carries its own 2 host halo columns (hence the extra -2).
    Returns [1, 1, cg] int32; 0 when packing is off."""
    if g_sp == 1:
        return 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cg), 2)
    return ((lane // c_img) % g_sp) * w_seg - 2


def _real_mask(i, th, hw_ref, rows, wp, row_off, col_off, col_base=0,
               seg=0, dtype=_BF16, row_seg=0, h_tot=None):
    """Mask of pixels inside the real image.

    Tensor row o maps to global row i*th + o + row_off; column c maps to
    global column col_base + c + col_off + seg (col_base = W-tile origin
    j*tw; seg = per-lane segment offset under spatial packing, see
    ``_seg_off``). (Windows start 2 rows/cols before the tile so raw window
    coords have row_off=-2, col_off=-2; each dw3x3 adds +1 to the column
    offset.)

    Band mode (``row_seg``/``h_tot``): under H-band lane packing each lane
    belongs to a band whose rows sit at a per-lane FRAME-row offset
    (``row_seg``, see ``_band_row_seg``); validity is then against the
    whole frame height ``h_tot`` — band-interior halo rows carry real
    neighbour-band data and must NOT be masked (they feed the depthwise
    halo taps of the band's edge rows exactly like the monolithic pad
    rows would).
    """
    h_real = h_tot if h_tot is not None else hw_ref[0]
    w_real = hw_ref[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 1)
    g = i * th + ri + row_off + row_seg  # lane-broadcasts under band mode
    c = col_base + ci + col_off + seg
    ok = (g >= 0) & (g < h_real) & (c >= 0) & (c < w_real)
    return ok.astype(dtype)


def _band_row_seg(bb, g, lanes, c_img, h, bands):
    """Per-lane frame-row offset under H-band lane packing: lane l of grid
    group bb belongs to image ``bb*g + (l//c_img) % g``, i.e. band
    ``(...) % bands`` of its frame, whose rows sit ``band*h`` rows into
    the frame. The ``% g`` makes the mapping correct for lane-concatenated
    tensors like the merged [q|k] (lanes 2*Cg). Returns [1, 1, lanes]
    int32 (0 when band mode is off)."""
    if bands <= 1:
        return 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    return ((bb * g + (lane // c_img) % g) % bands) * h


def _ln_fast(x, msum_ref, eps=1e-5):
    """v5 LayerNorm core for the DMA path (pow2 per-image channel count).

    ``msum_ref`` is the block-diagonal segment matrix PRE-SCALED by 1/c —
    exact in bf16 because 1/c is a power of two, so the fp32-accumulated
    MXU mean is still exact for bf16-valued inputs and the separate
    full-tensor ``* inv_c`` fp32 passes of ``_ln_core`` disappear. The
    subtract and the final scale run in bf16 (~half the VPU cost); the
    rounding of mu/s to bf16 costs ~2^-9 relative — inside the model's
    bf16 tolerance (parity-tested). Variance keeps the cancellation-free
    centered form with fp32 MXU accumulation.
    """
    mu = _matmul(x, msum_ref, _F32)
    d = x.astype(_F32) - mu
    db = d.astype(_BF16)
    var = _matmul(db * db, msum_ref, _F32)
    return (d * jax.lax.rsqrt(var + eps)).astype(_BF16)


def _gelu_exact(x):
    """Exact (erf) GELU via the Abramowitz-Stegun 7.1.26 rational erf
    approximation (max |err| 1.5e-7 — far below bf16 resolution). Mosaic has
    no erf/erfc lowering, and the tanh-approximate GELU would deviate from
    the reference's torch-default exact GELU by ~1e-3.

    Sign-free form: since sign(x) == sign(z), x*erf(z) == |x|*(1 - poly*e)
    == sqrt(2)*|z|*(1 - poly*e), so gelu = x/2 + |z|/sqrt(2)... *(1-poly*e).
    This avoids jnp.sign's comparison, which Mosaic cannot lower for bf16
    vectors — letting the whole GELU run in bf16 (half the VPU cost of the
    fp32 version; the exp dominates)."""
    z = x * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    xerf = 1.4142135623730951 * az * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * (x + xerf)


def _matmul(x, w_ref, out_dtype=_BF16):
    """[R, Wp, Cin] @ [Cin, Cout] on the MXU, fp32 accumulation."""
    return jax.lax.dot_general(
        x,
        w_ref[...].astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=_F32,
    ).astype(out_dtype)


def _win(prev_ref, cur_ref, nxt_ref, th):
    """Assemble the (th+4)-row halo window from three consecutive th-row
    blocks (leading-dim slices + concat — free on TPU). Boundary tiles read
    row-clamped neighbour blocks whose halo rows are garbage; every consumer
    masks them via ``_real_mask`` (they map outside [0, H_real)).

    Round-3 note: on cg % 128 == 0 geometries the forward kernels use
    explicit-DMA overlapping windows instead (``_dma_window``); this stays
    the path for unaligned lane counts (Mosaic can't DMA-slice them from
    HBM), for the backward twins (fused_block_bwd.py), and the floor
    probes."""
    return jnp.concatenate(
        [prev_ref[0, 0, th - 2 :], cur_ref[0, 0], nxt_ref[0, 0, :2]], axis=0
    )


def _dma_window(x_ref, buf, sems, bb, j, i, *, nw, nt, th):
    """Double-buffered explicit DMA of the OVERLAPPING (th+4)-row halo
    window for grid step (bb, j, i) from the H-padded input (rows shifted
    +2, so window i = rows [i*th, i*th+th+4) is static-size and in-bounds
    and halo rows outside the real image are zeros, not clamped garbage).

    Replaces the prev/cur/nxt blocked specs + concat of v1-v3: measured on
    v5e at [8,256,256,32] th=16, the blocked pipeline's window assembly
    serialised ahead of compute (copy floor 0.59 ms; VPU-mix ladder level
    1.60 ms) while the explicit overlap runs the same mix at 1.06 ms
    (benchmarks/exp_dma_floor.py). Each row is fetched once (+4/th halo
    amplification) instead of three times, and the window lands contiguous
    in scratch — no VPU concat. Requires the grid dims to iterate
    sequentially (dimension_semantics 'arbitrary') so the slot chaining
    holds: at step s the kernel starts the DMA for step s+1 into slot
    (s+1)%2 and waits on slot s%2 (started at step s-1; step 0 bootstraps).
    """
    step = (bb * nw + j) * nt + i
    total = pl.num_programs(0) * nw * nt

    def _start(s):
        sb = s // (nw * nt)
        rem = s % (nw * nt)
        pltpu.make_async_copy(
            x_ref.at[sb, rem // nt, pl.ds((rem % nt) * th, th + 4)],
            buf.at[s % 2],
            sems.at[s % 2],
        ).start()

    @pl.when(step == 0)
    def _():
        _start(0)

    @pl.when(step + 1 < total)
    def _():
        _start(step + 1)

    pltpu.make_async_copy(
        x_ref.at[bb, j, pl.ds(i * th, th + 4)],
        buf.at[step % 2],
        sems.at[step % 2],
    ).wait()
    return buf[step % 2]


def _own_mask(hw_ref, i, th, tw, r, wp, cb, seg, g_sp, w_seg, lanes,
              row_seg=0, h_tot=None):
    """Mask selecting this tile's OWN real pixels at the dw output's +1
    column offset (halo rows/cols belong to the neighbouring tiles). Band
    mode adds the FRAME-height bound: the last band of a padded frame owns
    only the rows below the real frame height."""
    h_real = hw_ref[0]
    w_real = hw_ref[1]
    shape = (r - 2, wp, 1) if isinstance(seg, int) and seg == 0 else (r - 2, wp, lanes)
    ri = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    own = (ri >= 1) & (ri < th + 1) & (i * th + ri - 1 < h_real)
    if h_tot is not None:
        own &= (row_seg + i * th + ri - 1) < h_tot
    # Owned (non-halo) columns; under spatial packing each lane segment
    # owns w_seg data columns starting 2 cols into its packed strip.
    lo, ln = (3, w_seg) if g_sp > 1 else (1, tw)
    own &= (ci >= lo) & (ci < lo + ln) & (cb + ci - 1 + seg < w_real)
    return own.astype(_BF16)


def _gram_accum(q, k, gram_ref):
    """Accumulate sum_pixels q^T k into gram_ref[0]. Mosaic's tpu.matmul
    rejects multi-dim contractions; one [Wp, C]^T @ [Wp, C] MXU dot per row
    (leading-dim indexing is free)."""
    dn_g = (((0,), (0,)), ((), ()))
    g = None
    for o in range(q.shape[0]):
        t = jax.lax.dot_general(q[o], k[o], dimension_numbers=dn_g,
                                preferred_element_type=_F32)
        g = t if g is None else g + t
    gram_ref[0] += g


def _gram_kernel(
    hw_ref,  # scalar prefetch: [2] int32 (H_real, W_real)
    prev_ref, cur_ref, nxt_ref,  # [1, 1, th, Wp, Cg] consecutive row blocks
    msum_ref,            # (C, C) f32 binary block-diagonal segment-sum matrix
    wq_ref, bq_ref,      # (C, C), (1, C) — LN1 affine folded in host-side
    wk_ref, bk_ref,
    dwq_ref, bdwq_ref,   # (3, 3, C), (1, C)
    dwk_ref, bdwk_ref,
    gram_ref,  # out (1, C, C) f32 — accumulated across tiles
    qss_ref,   # out (1, 1, C) f32
    kss_ref,   # out (1, 1, C) f32
    *,
    th: int,
    tw: int,
    c_img: int,
    g_sp: int,
    w_seg: int,
    ln_bf16: bool,
):
    """Split-q/k gram kernel — blocked prev/cur/nxt halo specs. Only runs on
    cg % 128 != 0 geometries (cold, small-batch eval shapes): those can't
    use the explicit-DMA windows (Mosaic requires 128-aligned lane slices
    for HBM copies), and they can't merge q/k either, so the two gates
    coincide and this kernel stays on the v3 structure."""
    j = pl.program_id(1)
    i = pl.program_id(2)
    cb = j * tw

    @pl.when((j == 0) & (i == 0))
    def _init():
        gram_ref[...] = jnp.zeros_like(gram_ref)
        qss_ref[...] = jnp.zeros_like(qss_ref)
        kss_ref[...] = jnp.zeros_like(kss_ref)

    x = _win(prev_ref, cur_ref, nxt_ref, th)
    r, wp, cg = x.shape
    seg = _seg_off(cg, c_img, g_sp, w_seg)
    m0 = _real_mask(i, th, hw_ref, r, wp, row_off=-2, col_off=-2, col_base=cb,
                    seg=seg)
    # Mask x itself: clamped boundary halo rows carry garbage (see _win); a
    # zero pixel LN-normalises to exactly zero (affine folded into q/k).
    xn = _ln_core((x * m0).astype(_F32), msum_ref, 1.0 / c_img,
                  bf16_stats=ln_bf16)

    mg = _own_mask(hw_ref, i, th, tw, r, wp, cb, seg, g_sp, w_seg, cg)

    q = _dw3x3((_matmul(xn, wq_ref) + bq_ref[0]) * m0, dwq_ref)
    q = (q + bdwq_ref[0]) * mg
    k = _dw3x3((_matmul(xn, wk_ref) + bk_ref[0]) * m0, dwk_ref)
    k = (k + bdwk_ref[0]) * mg

    _gram_accum(q, k, gram_ref)
    qf = q.astype(_F32)
    kf = k.astype(_F32)
    qss_ref[...] += jnp.sum(qf * qf, axis=(0, 1), keepdims=True)
    kss_ref[...] += jnp.sum(kf * kf, axis=(0, 1), keepdims=True)


def _gram_kernel_merged(
    hw_ref,
    x_ref,
    msum_ref,
    wqk_ref, bqk_ref,      # (C, 2C), (1, 2C) — [q | k] halves, affine folded
    dwqk_ref, bdwqk_ref,   # (3, 3, 2C), (1, 2C)
    gram_ref,   # out (1, C, C) f32
    qkss_ref,   # out (1, 1, 2C) f32 — [qss | kss]
    buf, sems,
    *,
    th: int,
    tw: int,
    nw: int,
    nt: int,
    c_img: int,
    g_sp: int,
    w_seg: int,
    ln_bf16: bool,
    g: int = 1,
    h_img: int = 0,
    bands: int = 1,
    frame_h: int = 0,
):
    """Merged-qk variant of ``_gram_kernel``, used when cg % 128 == 0 so the
    q/k lane halves split at a tile boundary (free slices): ONE [Cg, 2Cg]
    matmul, ONE depthwise pass, ONE bias/mask application — half the
    instruction chain of the split path for the same FLOPs, which matters
    because the kernel is dependency-chain-bound, not MXU-bound
    (BENCHMARKS.md round-3).

    Band mode: the bias mask extends to FRAME bounds (halo rows carry real
    neighbour-band data whose pre-dw q/k values feed the band edge rows'
    depthwise taps — masking them would corrupt the edge rows' q/k, which
    ARE inside the own-masked gram); the own mask stays band-local, so no
    pixel is double-counted across bands."""
    bb = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    cb = j * tw

    @pl.when((j == 0) & (i == 0))
    def _init():
        gram_ref[...] = jnp.zeros_like(gram_ref)
        qkss_ref[...] = jnp.zeros_like(qkss_ref)

    x = _dma_window(x_ref, buf, sems, bb, j, i, nw=nw, nt=nt, th=th)
    r, wp, cg = x.shape
    seg = _seg_off(cg, c_img, g_sp, w_seg)
    h_tot = frame_h if bands > 1 else None
    row_seg2 = _band_row_seg(bb, g, 2 * cg, c_img, h_img, bands)
    # x needs no masking: out-of-image pixels are zero-padded host-side.
    xn = _ln_core(x.astype(_F32), msum_ref, 1.0 / c_img,
                  bf16_stats=ln_bf16)

    seg2 = _seg_off(2 * cg, c_img, g_sp, w_seg)
    if g_sp == 1 and bands <= 1:
        m0_2 = _real_mask(i, th, hw_ref, r, wp, row_off=-2, col_off=-2,
                          col_base=cb, seg=seg)
    else:
        m0_2 = _real_mask(
            i, th, hw_ref, r, wp, -2, -2, cb, seg2,
            row_seg=row_seg2, h_tot=h_tot,
        )
    mg2 = _own_mask(hw_ref, i, th, tw, r, wp, cb, seg2, g_sp, w_seg, 2 * cg,
                    row_seg=row_seg2, h_tot=h_tot)

    qk = _dw3x3((_matmul(xn, wqk_ref) + bqk_ref[0]) * m0_2, dwqk_ref)
    qk = (qk + bdwqk_ref[0]) * mg2
    q = qk[..., :cg]
    k = qk[..., cg:]

    _gram_accum(q, k, gram_ref)
    qkf = qk.astype(_F32)
    qkss_ref[...] += jnp.sum(qkf * qkf, axis=(0, 1), keepdims=True)


def _rowmask(i, th, rows, wp, h, off=-2):
    """[rows, wp, 1] bf16 validity of row o = global row i*th + o + off
    against the REAL image height h (a trace-time constant). Lane-broadcast
    from 1 is the Mosaic-supported splat shape ([rows,1,1] sublane+lane
    broadcasts fail to lower, and STRIDED SLICES of a one-lane rank-3
    vector crash the Mosaic strided-slice rule — so each shifted row range
    builds its own mask instead of slicing a shared one); the build is a
    handful of ops on a one-lane tensor."""
    g = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 0) + (i * th + off)
    return ((g >= 0) & (g < h)).astype(_BF16)


def _apply_ffn_kernel_v6(
    x_ref,               # [B2, nw, hp+4, Wp, Cg] bf16 in HBM/ANY
    msum_ref,            # (Cg, Cg) bf16 segment matrix * 1/c
    apply_ref,           # (1, Cg, Cg) bf16 — attn^T @ Wproj, block-diag
    wv_ref,              # (Cg, Cg) bf16 — LN1 affine folded
    bvm_ref,             # (nw, Wp, Cg) bf16 — v bias column-masked (off -2)
    dwv_ref, bdwv_ref,   # (3, 3, Cg) f32, (1, Cg) bf16
    bproj_ref,           # (1, Cg) bf16
    wp1_ref,             # (Cg, Ch) bf16 — LN2 affine folded
    bp1m_ref,            # (nw, Wp, Ch) bf16 — FFN bias column-masked (off -1)
    dwf_ref, bdwf_ref,   # (3, 3, Ch) f32, (1, Ch) bf16
    wp2_ref, bp2_ref,    # (Ch, Cg), (1, Cg) bf16
    cm1_ref,             # (nw, Wp, Cg) bf16 — column validity at offset -1
    out_ref,             # [1, th, tw, Cg]
    buf, sems, ybuf,
    *,
    th: int,
    tw: int,
    nw: int,
    nt: int,
    h: int,
):
    """v6 attention-apply + FFN kernel — SOFTWARE-PIPELINED phases.

    Round-4 finding (BENCHMARKS.md): the monolithic apply+FFN kernel is
    bound by its serial per-tile dependency chain — per grid step ~40us of
    MXU matmuls and ~65us of VPU work (depthwise taps, GELU, LN pointwise)
    execute back-to-back because every op consumes its predecessor.
    Instruction-count cuts (v5: all-bf16 chains, cheaper LN, precomputed
    masks) measured NEUTRAL-to-negative: bf16 elementwise is NOT faster
    than fp32 on this VPU (Mosaic unpacks), and removing passes didn't
    shorten the critical path.

    v6 splits the block into two phases and runs, in ONE grid step's basic
    block, tile i-1's FFN phase followed by tile i's attention phase — two
    INDEPENDENT dataflow DAGs the Mosaic scheduler can interleave, so one
    phase's VPU work can hide the other's MXU time. The y tensor (first
    residual, [th+2, Wp, Cg]) carries between steps in a 2-slot VMEM
    scratch. The grid gains one epilogue step per (bb, j) block; boundary
    steps run on clamped/garbage inputs and their writes are overwritten.
    On the epilogue step both phases touch the SAME y slot ((nt-1) % 2);
    phase 2 precedes phase 1 in program order, so the read completes before
    the clamped phase-1 recompute clobbers it.

    Masked-bias inputs (column validity folded into the bias, zero-bias at
    pad columns — the H-padded DMA input is already zero there) and
    ``_ln_fast`` are kept from v5: neutral on time but fewer instructions
    and exact-or-better numerics.
    """
    bb = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    r = th + 4
    wp = buf.shape[2]

    # ---- DMA bookkeeping (predicated off on the epilogue step i == nt).
    total = pl.num_programs(0) * nw * nt

    def _start(s):
        sb = s // (nw * nt)
        rem = s % (nw * nt)
        pltpu.make_async_copy(
            x_ref.at[sb, rem // nt, pl.ds((rem % nt) * th, th + 4)],
            buf.at[s % 2],
            sems.at[s % 2],
        ).start()

    wl = (bb * nw + j) * nt + i

    @pl.when(i < nt)
    def _dma():
        @pl.when(wl == 0)
        def _():
            _start(0)

        @pl.when(wl + 1 < total)
        def _():
            _start(wl + 1)

        pltpu.make_async_copy(
            x_ref.at[bb, j, pl.ds(i * th, th + 4)],
            buf.at[wl % 2],
            sems.at[wl % 2],
        ).wait()

    # ---- Phase 2 (tile i-1): LN2 + FFN + second residual -> out block i-1.
    # Step 0 consumes uninitialised scratch and writes a block that step 1
    # overwrites (the out index map clamps i-1 to 0).
    ip = i - 1
    y = ybuf[ip % 2]
    yn = _ln_fast(y, msum_ref)
    rmy2 = _rowmask(ip, th, th + 2, wp, h, -1)
    t = (_matmul(yn, wp1_ref) + bp1m_ref[0]) * rmy2
    f = _gelu_exact(_dw3x3(t, dwf_ref) + bdwf_ref[0])  # [th, Wp, Ch], off +2
    f = _matmul(f, wp2_ref) + bp2_ref[0]
    out = jnp.roll(y[1 : th + 1], -1, axis=1) + f
    out_ref[0] = out[:, :tw].astype(out_ref.dtype)

    # ---- Phase 1 (tile i, clamped to nt-1 on the epilogue step): LN1 +
    # v branch + attention apply + first residual -> y slot ii%2 (on the
    # epilogue: the slot phase 2 above has already finished reading).
    ii = jnp.minimum(i, nt - 1)
    x = buf[((bb * nw + j) * nt + ii) % 2]
    xn = _ln_fast(x, msum_ref)
    z = (_matmul(xn, wv_ref) + bvm_ref[0]) * _rowmask(ii, th, r, wp, h)
    v = _dw3x3(z, dwv_ref) + bdwv_ref[0]          # [r-2, Wp, Cg], col off +1
    att = _matmul(v, apply_ref[0]) + bproj_ref[0]
    # First residual: x rows [1, r-1) align with v's rows; one sublane roll
    # aligns columns to the +1 offset. y must be exactly zero outside the
    # real image before LN2/FFN-depthwise (the reference zero-pads); the
    # column mask also kills the roll wrap garbage.
    rmy = _rowmask(ii, th, th + 2, wp, h, -1)
    ybuf[ii % 2] = (jnp.roll(x[1 : r - 1], -1, axis=1) + att) * cm1_ref[0] * rmy


def _apply_ffn_chain(
    x, hw_ref, msum_ref, apply_ref, wv_ref, bv_ref, dwv_ref, bdwv_ref,
    bproj_ref, wp1_ref, bp1_ref, dwf_ref, bdwf_ref, wp2_ref, bp2_ref,
    *, i, th, col_base, c_img, ch_img, g_sp, w_seg, ln_bf16, gelu_bf16,
    mask_x, row_seg=0, row_seg_h=0, h_tot=None,
):
    """One attention-apply + FFN dependency chain over a column slice.

    ``x``: [r, wcols, Cg] window slice whose column 0 is GLOBAL column
    ``col_base - 2`` (the window's 2 halo columns). Returns the [th, wcols,
    Cg] result at the usual +2 column offset: out[:, q] is global column
    ``col_base + q`` — valid for q < wcols - 4 (the trailing columns are
    dw/roll wrap garbage the caller discards).

    Factoring the body out of ``_apply_ffn_kernel`` lets the split path run
    TWO independent chains over column halves in one grid step (see
    ``n_split`` in the kernel): the chains share no values, so Mosaic's
    scheduler can overlap one chain's VPU passes (depthwise taps, GELU, LN
    pointwise) with the other's MXU matmuls — the round-4 finding was that
    the per-step time is ~40us MXU + ~65us VPU executed BACK-TO-BACK
    because every op consumes its predecessor, and instruction cuts moved
    nothing (BENCHMARKS.md round-4).
    """
    r, wp, cg = x.shape
    seg = _seg_off(cg, c_img, g_sp, w_seg)
    m0 = _real_mask(i, th, hw_ref, r, wp, row_off=-2, col_off=-2,
                    col_base=col_base, seg=seg, row_seg=row_seg, h_tot=h_tot)
    if mask_x:
        # Clamped boundary halo rows carry garbage (see _win); zero them in
        # x itself so the first-residual add (raw x rows) stays exact. On
        # the DMA path the H-padded input's out-of-image pixels are already
        # exact zeros, so no mask is needed there.
        x = x * m0
    xn = _ln_core(x.astype(_F32), msum_ref, 1.0 / c_img, bf16_stats=ln_bf16)

    # v branch; mv masks real pixels at the dw output's +1 column offset.
    mv = _real_mask(i, th, hw_ref, r - 2, wp, row_off=-1, col_off=-1,
                    col_base=col_base, seg=seg, row_seg=row_seg, h_tot=h_tot)
    v = _dw3x3((_matmul(xn, wv_ref) + bv_ref[0]) * m0, dwv_ref)
    v = (v + bdwv_ref[0]) * mv

    att = _matmul(v, apply_ref[0], _BF16)
    att = (att + bproj_ref[0]) * mv

    # First residual. x rows [1, th+3) align with v's rows; one sublane roll
    # aligns columns to the +1 offset. x is zero outside the real image, so
    # y is too (== the SAME zero padding the FFN depthwise expects), and the
    # LN2 of those zero pixels is exactly zero (affine folded into wp1).
    y = jnp.roll(x[1 : r - 1], -1, axis=1) + att  # [th+2, Wp, C], col off +1

    yn = _ln_core(y.astype(_F32), msum_ref, 1.0 / c_img, bf16_stats=ln_bf16)
    # Hidden-width copy of mv: under spatial or band packing masks are
    # per-lane and the FFN hidden tensor has ch_img (not c_img) lanes per
    # packed image.
    if g_sp > 1 or not (isinstance(row_seg, int) and row_seg == 0):
        nh = wp1_ref.shape[1]
        mv_h = _real_mask(i, th, hw_ref, r - 2, wp, row_off=-1, col_off=-1,
                          col_base=col_base,
                          seg=_seg_off(nh, ch_img, g_sp, w_seg),
                          row_seg=row_seg_h, h_tot=h_tot)
    else:
        mv_h = mv
    t = (_matmul(yn, wp1_ref) + bp1_ref[0]) * mv_h
    f = _dw3x3(t, dwf_ref) + bdwf_ref[0]  # [th, Wp, Ch], col offset +2
    if gelu_bf16:
        f = _gelu_exact(f.astype(_BF16))
    else:
        f = _gelu_exact(f.astype(_F32)).astype(_BF16)
    f = _matmul(f, wp2_ref) + bp2_ref[0]

    # Second residual: y rows [1, th+1) with one more column roll (+2 offset).
    return jnp.roll(y[1 : th + 1], -1, axis=1) + f


def _apply_ffn_kernel(
    hw_ref,
    *refs,
    # use_dma=True:  refs = (x_ref [B2,nw,hp+4,Wp,Cg] bf16 in HBM/ANY,
    #                        msum, apply, wv, bv, dwv, bdwv, bproj,
    #                        wp1, bp1, dwf, bdwf, wp2, bp2, out,
    #                        buf, sems)           — explicit-DMA windows
    # use_dma=False: refs = (prev, cur, nxt [1,1,th,Wp,Cg] blocked specs,
    #                        msum, ..., out)      — v3 halo assembly
    # msum: (C, C) f32 binary segment-sum matrix
    # apply: (1, C, C) f32 — attn^T @ Wproj, per image (block-diag per group)
    # wv/bv, dwv/bdwv, bproj: v branch (LN1 affine folded in host-side)
    # wp1/bp1, dwf/bdwf, wp2/bp2: FFN (LN2 affine folded in)
    # out: [1, th, tw, C]
    th: int,
    tw: int,
    nw: int,
    nt: int,
    c_img: int,
    ch_img: int,
    g_sp: int,
    w_seg: int,
    ln_bf16: bool,
    gelu_bf16: bool,
    use_dma: bool,
    n_split: int = 1,
    g: int = 1,
    h_img: int = 0,
    bands: int = 1,
    frame_h: int = 0,
):
    bb = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    cb = j * tw
    if use_dma:
        (x_ref, msum_ref, apply_ref, wv_ref, bv_ref, dwv_ref, bdwv_ref,
         bproj_ref, wp1_ref, bp1_ref, dwf_ref, bdwf_ref, wp2_ref, bp2_ref,
         out_ref, buf, sems) = refs
        x = _dma_window(x_ref, buf, sems, bb, j, i, nw=nw, nt=nt, th=th)
    else:
        (prev_ref, cur_ref, nxt_ref, msum_ref, apply_ref, wv_ref, bv_ref,
         dwv_ref, bdwv_ref, bproj_ref, wp1_ref, bp1_ref, dwf_ref, bdwf_ref,
         wp2_ref, bp2_ref, out_ref) = refs
        x = _win(prev_ref, cur_ref, nxt_ref, th)

    cg_l = x.shape[-1]
    row_seg = _band_row_seg(bb, g, cg_l, c_img, h_img, bands)
    row_seg_h = _band_row_seg(bb, g, wp1_ref.shape[1], ch_img, h_img, bands)
    h_tot = frame_h if bands > 1 else None
    weight_refs = (msum_ref, apply_ref, wv_ref, bv_ref, dwv_ref, bdwv_ref,
                   bproj_ref, wp1_ref, bp1_ref, dwf_ref, bdwf_ref, wp2_ref,
                   bp2_ref)
    chain = functools.partial(
        _apply_ffn_chain, th=th, i=i, c_img=c_img, ch_img=ch_img, g_sp=g_sp,
        w_seg=w_seg, ln_bf16=ln_bf16, gelu_bf16=gelu_bf16, mask_x=not use_dma,
        row_seg=row_seg, row_seg_h=row_seg_h, h_tot=h_tot,
    )
    splits = _split_cols(tw, x.shape[1], n_split)
    if splits is None:
        out = chain(x, hw_ref, *weight_refs, col_base=cb)
        # Columns [0, tw) of the (+2-offset) result are exactly this
        # W-tile's owned global columns [cb, cb+tw).
        out_ref[0] = out[:, :tw].astype(out_ref.dtype)
    else:
        # Split path: independent column-half chains (see _apply_ffn_chain
        # docstring). Each chain's slice carries 4 extra columns of context
        # (+ sublane-alignment pad); only ~4/tw of the work is duplicated.
        for c0, c1, cs in splits:
            o = chain(x[:, c0:cs], hw_ref, *weight_refs, col_base=cb + c0)
            out_ref[0, :, c0:c1] = o[:, : c1 - c0].astype(out_ref.dtype)


def _split_cols(tw, wp, n_split):
    """Column ranges [(out_lo, out_hi, slice_hi), ...] for the split-chain
    path, or None when splitting is off/not worthwhile. Boundaries are
    sublane (8) multiples; each slice extends 8 columns past its owned
    range (4 needed for dw/roll context, rounded to the sublane tile)."""
    if n_split <= 1:
        return None
    step = -(-tw // (8 * n_split)) * 8
    if step < 32 or step >= tw:
        return None
    out = []
    lo = 0
    while lo < tw:
        hi = min(lo + step, tw)
        out.append((lo, hi, min(hi + 8, wp)))
        lo = hi
    return out


def finalize_attention(gram, qss, kss, temperature, wproj, num_heads):
    """XLA-side [C,C] finalise: per-head normalised softmax folded into the
    output projection. gram/qss/kss: [B, C, C]/[B, C]; returns apply [B, C, C]
    with out_tokens = v_tokens @ apply (+ proj bias)."""
    c = gram.shape[-1]
    ch = c // num_heads
    head_id = np.repeat(np.arange(num_heads), ch)
    mask = jnp.asarray(
        np.where(head_id[:, None] == head_id[None, :], 0.0, -np.inf), _F32
    )
    trow = jnp.repeat(temperature.astype(_F32), ch)  # [C]

    # torch F.normalize: x / max(|x|, eps), eps=1e-12.
    qinv = 1.0 / jnp.maximum(jnp.sqrt(qss.astype(_F32)), 1e-12)
    kinv = 1.0 / jnp.maximum(jnp.sqrt(kss.astype(_F32)), 1e-12)
    attn = gram.astype(_F32) * qinv[:, :, None] * kinv[:, None, :]
    attn = attn * trow[None, :, None] + mask[None]
    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    e = jnp.exp(attn)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    # apply[c', d] = sum_c attn[c, c'] wproj[c, d]
    return jnp.einsum("bcx,cd->bxd", attn, wproj.astype(_F32))


def _replicated(shape):
    return pl.BlockSpec(shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM)


def _block_diag(w, g):
    """Tile a [I, O] matrix into a [g*I, g*O] block-diagonal matrix."""
    if g == 1:
        return w
    i, o = w.shape
    out = jnp.zeros((g * i, g * o), w.dtype)
    for j in range(g):
        out = out.at[j * i : (j + 1) * i, j * o : (j + 1) * o].set(w)
    return out


def fused_transformer_block(
    x: jnp.ndarray,
    params: Dict[str, Any],
    num_heads: int,
    tile_rows: int = 16,
    tile_cols: Optional[int] = None,
    group: Optional[int] = None,
    interpret: Optional[bool] = None,
    chunked: Optional[bool] = None,  # retired, accepted and ignored
    ln_bf16: Optional[bool] = None,
    gelu_bf16: Optional[bool] = None,
    n_split: Optional[int] = None,
    bands: int = 1,
    frame_h: Optional[int] = None,
    return_residuals: bool = False,
    stage: str = "full",
    apply_override: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run one full TransformerBlock on x [B, H, W, C] -> [B, H, W, C].

    ``params`` is the flax param subtree of models.common.TransformerBlock
    (norm1 / attn{qkv, qkv_dwconv, project_out, temperature} / norm2 /
    ffn{pointwise1, depthwise, pointwise2}).

    ``group``: number of images packed into the lane dimension (default
    256 // C, when the batch divides — measured optimum on v5e: at
    [8,256,256,32] g=8/256 lanes runs 1.87x XLA vs 1.39x for g=4/128 lanes;
    two full lane tiles per vector op amortise the per-grid-step overhead).
    At RawFormer's small channel widths a single image fills only C of the
    128 VPU lanes and a C-wide MXU tile; packing g images makes every 1x1
    conv a block-diagonal [gC, gC] matmul at full tile utilisation and cuts
    the grid-step count by g. Per-image
    semantics are exact: LayerNorm means come from a block-diagonal
    averaging matmul, the [gC, gC] gram's off-diagonal (cross-image) blocks
    are discarded by the XLA finalise, and the attention-apply matrix is
    re-assembled block-diagonally.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    g_target = group if group is not None else max(1, 256 // c)
    # Largest divisor of b within the lane target (halving alone left the
    # B model at g=2/96 lanes when g=4/192 was available at C=48).
    g = next(gg for gg in range(min(g_target, b), 0, -1) if b % gg == 0)
    # Band mode (round 5): the caller has split each frame into ``bands``
    # contiguous H-bands riding the batch axis (batch-major per frame), so
    # the bands themselves fill the lanes through the ordinary g-packing —
    # no W-segment spatial packing — and the finalise sums each frame's
    # grams across its bands (see the band-sum below). Halo rows between
    # bands are filled with real neighbour-band rows (not zeros) and the
    # kernels' bias masks extend to frame bounds (_band_row_seg).
    if bands > 1:
        if b % bands:
            raise ValueError(f"batch {b} not divisible by bands {bands}")
        if frame_h is None:
            frame_h = bands * h
        g_sp = 1
        if (g * c) % 128:
            # Alignment overrides the lane target under band mode: the
            # explicit-DMA windows need cg % 128 == 0, so grow g to the
            # smallest batch divisor that aligns (e.g. C=48 at g=8 -> 384
            # lanes = 3 tiles).
            cand = [gg for gg in range(g + 1, b + 1)
                    if b % gg == 0 and (gg * c) % 128 == 0]
            if cand:
                g = cand[0]
    else:
        g_sp = max(1, g_target // g)
        if (
            g_sp > 1
            and h >= 16 * g_sp
            and stage == "full"
            and apply_override is None
            and _auto_band_default()
        ):
            # AUTO H-BAND lane packing (round 5): when the batch alone
            # can't fill the lanes (single full-res frames), split each
            # frame's H into g_sp bands riding the batch axis — a FREE
            # row-major reshape — and recurse in band mode. vs the
            # W-segment (g_sp) packing this replaces: no per-segment halo
            # columns, no pad/stack/unstack relayouts, and the band halos
            # are filled from neighbour rows inside the kernel's own xpad
            # build. In-graph full-res attention marginal measured 59.8 ms
            # banded vs 96.1 ms W-segment at [1,2944,4240,32]-equivalent.
            # The frame height need not divide: the frame is zero-padded
            # to bands*hb and every mask carries the true frame bound
            # (frame_h), so gram/outputs are exactly the monolithic ones.
            kb = g_sp
            hb = -(-h // kb)
            xb = jnp.pad(x, ((0, 0), (0, kb * hb - h), (0, 0), (0, 0)))
            xb = xb.reshape(b * kb, hb, w, c)
            out = fused_transformer_block(
                x=xb, params=params, num_heads=num_heads,
                tile_rows=tile_rows, tile_cols=tile_cols, group=group,
                interpret=interpret, ln_bf16=ln_bf16, gelu_bf16=gelu_bf16,
                n_split=n_split, bands=kb, frame_h=h,
                return_residuals=return_residuals, stage=stage,
            )
            if return_residuals:
                out, res = out
            out = out.reshape(b, kb * hb, w, c)[:, :h]
            return (out, res) if return_residuals else out
        # Spatial lane packing fallback (BAYER_TPU_BAND=0, or short
        # frames): split W into g_sp segments (each with 2 host halo
        # columns) and pack those as extra lane images. The gram is
        # re-summed across a frame's segments in the XLA finalise, so the
        # attention stays global over the whole image.
    # w_seg rounds to a sublane multiple (8): unaligned strip widths ripple
    # into every kernel tensor and Mosaic compile time explodes.
    w_seg = -(-w // (8 * g_sp)) * 8
    while g_sp > 1 and w_seg < 64:
        g_sp //= 2
        w_seg = -(-w // (8 * g_sp)) * 8
    if g_sp > 1:
        wq = g_sp * w_seg
        xs = jnp.pad(x, ((0, 0), (0, 0), (2, 2 + wq - w), (0, 0)))
        x = jnp.stack(
            [xs[:, :, jj * w_seg : jj * w_seg + w_seg + 4] for jj in range(g_sp)],
            axis=1,
        ).reshape(b * g_sp, h, w_seg + 4, c)
        b_img, w_img = b, w  # original geometry for the finalise/unpack
        b, w = b * g_sp, w_seg + 4
        g *= g_sp
    b2 = b // g
    cg = g * c
    # `chunked` is retired (round 3): the 128-lane diagonal sub-matmul split
    # measured 0.87x dense at [8,256,256,32] (BENCHMARKS.md round-2 negative
    # A/B) and was removed with the v3 merged-qk restructure. The kwarg is
    # accepted and ignored for caller compatibility.
    del chunked
    import os
    if ln_bf16 is None:
        ln_bf16 = os.environ.get("BAYER_TPU_LN_BF16", "1") == "1"
    if gelu_bf16 is None:
        gelu_bf16 = os.environ.get("BAYER_TPU_GELU_BF16", "1") == "1"
    if n_split is None:
        n_split = int(os.environ.get("BAYER_TPU_FUSED_SPLIT", "1"))
    # Merged q/k: one [Cg, 2Cg] matmul + one depthwise pass when the halves
    # split at a 128-lane tile boundary (free slices in-kernel).
    merged = cg % 128 == 0
    # Explicit-DMA halo windows need 128-aligned lane slices for the HBM
    # copy (Mosaic tiling constraint) — the same condition as merged q/k.
    # Unaligned (cold, small-batch) geometries keep the v3 blocked specs.
    use_dma = merged
    if bands > 1 and not use_dma:
        raise ValueError(
            "band mode needs 128-aligned packed lanes (explicit-DMA path); "
            f"got g*c = {cg}"
        )
    # v5 (round 4): all-bf16 chains + precomputed masked-bias/row-mask
    # inputs + _ln_fast + single-dot gram. Requires the DMA path, a pow2
    # per-image channel count (so 1/c folds exactly into the segment
    # matrix), and the bf16 LN mode. Every hot geometry qualifies.
    v5 = (
        use_dma
        and bands == 1
        and (c & (c - 1)) == 0
        and ln_bf16
        and os.environ.get("BAYER_TPU_FUSED_V5", "0") == "1"
    )

    th = tile_rows
    hp = -(-h // th) * th
    nt = hp // th
    # W-tiling bounds per-step VMEM for wide frames (a 4240-col row block
    # made the Mosaic compile explode); whole-W tiles below the threshold.
    # The threshold scales INVERSELY with the packed lane count: per-step
    # tensors are [th, wp, cg]-sized, so the budget is wp*cg, not wp alone
    # (round 5: [8,92,1060,64] banded geometry packs to cg=256 at
    # tw=1060 and died in register-allocator spills — 154 MB scoped).
    # Lanes pad to 128: at cg<128 every VMEM tensor wastes 128/cg x, so
    # the floor stays 256 columns.
    if tile_cols is not None:
        tw = tile_cols
    else:
        limit = max(256, (1 << 17) // max(cg, 128))
        if w <= limit:
            tw = w
        else:
            # Near-even W tiles (rounded to the sublane multiple) instead
            # of limit-sized tiles + ragged tail: at w=1060/limit=512 this
            # gives 3x360 (20 pad cols) rather than 3x512 (476 pad cols).
            nsp = -(-w // limit)
            tw = -(-w // (8 * nsp)) * 8
    wpad = -(-w // tw) * tw
    nw = wpad // tw
    # Explicit-DMA windows (see _dma_window) must be tile-aligned in the
    # sublane (W) dim: round the window width up to a multiple of 8. The
    # trailing extra columns are real next-tile data or zero pad; consumers
    # never read past column tw+2 (the +2-offset extraction), so they are
    # inert. Blocked specs need no such alignment (Pallas pads VMEM blocks).
    extra = (-(tw + 4)) % 8 if use_dma else 0
    r, wp = th + 4, tw + 4 + extra

    dtype_in = x.dtype
    xg = x.astype(_BF16)
    if bands > 1:
        # Fill each band's 2-row H-halos with its neighbour bands' edge
        # rows (zeros at the frame's own top/bottom) BEFORE lane packing,
        # so the kernels' windows see exactly what the monolithic frame's
        # rows would provide. Overlapping slices of the padded FRAME view:
        # a halo may span several bands (1-row bottleneck bands).
        nf = b // bands
        frame = xg.reshape(nf, bands * h, w, c)
        fp = jnp.pad(frame, ((0, 0), (2, 2), (0, 0), (0, 0)))
        xg = jnp.stack(
            [fp[:, k * h : k * h + h + 4] for k in range(bands)], axis=1
        ).reshape(b, h + 4, w, c)
    if g > 1:
        # [B, H, W, C] -> [B/g, H, W, g*C]: group j holds images j*g .. j*g+g-1.
        hh = xg.shape[1]
        xg = jnp.transpose(xg.reshape(b2, g, hh, w, c), (0, 2, 3, 1, 4)).reshape(
            b2, hh, w, cg
        )
    if use_dma:
        # H is padded by 2 top + 2+ bottom so the kernels' overlapping
        # (th+4)-row DMA windows (window i = rows [i*th, i*th+th+4)) are
        # static-size, always in-bounds, and carry exact ZEROS outside the
        # real image (no clamped-garbage halos to mask; band mode's halos
        # are pre-filled above). Materialising nt
        # overlapping windows in HBM instead cost an extra ~3x round trip of
        # x and made full-resolution graphs explode at compile time; the
        # in-kernel double-buffered DMA fetches each row once. W-tiles (nw
        # is small) are stacked host-side with their halo columns.
        hpad = (0, hp - h) if bands > 1 else (2, 2 + hp - h)
        xpad = jnp.pad(
            xg, ((0, 0), hpad, (2, 2 + wpad - w + extra), (0, 0))
        )
    else:
        # v3 blocked layout: row blocks of th rows; halo windows are
        # assembled in-kernel from the prev/cur/next blocks (clamped at the
        # edges, garbage rows masked).
        xpad = jnp.pad(xg, ((0, 0), (0, hp - h), (2, 2 + wpad - w), (0, 0)))
    if nw == 1:
        xw = xpad[:, None]  # [B2, 1, hp(+4), Wp, Cg]
    else:
        xw = jnp.stack(
            [xpad[:, :, jj * tw : jj * tw + wp] for jj in range(nw)], axis=1
        )
    hw = jnp.asarray([h, w if g_sp == 1 else w_img], jnp.int32)

    p_attn = params["attn"]
    wqkv = jnp.reshape(p_attn["qkv"]["kernel"], (c, 3 * c)).astype(_F32)
    bqkv = p_attn["qkv"]["bias"].astype(_F32)
    wdw = jnp.reshape(p_attn["qkv_dwconv"]["kernel"], (3, 3, 3 * c))
    bdw = p_attn["qkv_dwconv"]["bias"]
    wproj = jnp.reshape(p_attn["project_out"]["kernel"], (c, c))
    bproj = p_attn["project_out"]["bias"]
    if "log_temperature" in p_attn:
        temperature = jnp.exp(p_attn["log_temperature"].astype(_F32))
    else:
        temperature = p_attn["temperature"]
    ln1w = params["norm1"]["weight"].astype(_F32)
    ln1b = params["norm1"]["bias"].astype(_F32)
    ln2w = params["norm2"]["weight"].astype(_F32)
    ln2b = params["norm2"]["bias"].astype(_F32)
    p_ffn = params["ffn"]
    ch_hidden = p_ffn["pointwise1"]["kernel"].shape[-1]
    wp1 = jnp.reshape(p_ffn["pointwise1"]["kernel"], (c, ch_hidden)).astype(_F32)
    bp1 = p_ffn["pointwise1"]["bias"].astype(_F32)
    wdwf = jnp.reshape(p_ffn["depthwise"]["kernel"], (3, 3, ch_hidden))
    bdwf = p_ffn["depthwise"]["bias"]
    wp2 = jnp.reshape(p_ffn["pointwise2"]["kernel"], (ch_hidden, c))
    bp2 = p_ffn["pointwise2"]["bias"]

    # Fold the LN affines into the consuming 1x1 convs (exact in fp32):
    # (xhat * w + b) @ W + bias == xhat @ (diag(w) W) + (b @ W + bias).
    wq_f = ln1w[:, None] * wqkv[:, :c]
    bq_f = ln1b @ wqkv[:, :c] + bqkv[:c]
    wk_f = ln1w[:, None] * wqkv[:, c : 2 * c]
    bk_f = ln1b @ wqkv[:, c : 2 * c] + bqkv[c : 2 * c]
    wv_f = ln1w[:, None] * wqkv[:, 2 * c :]
    bv_f = ln1b @ wqkv[:, 2 * c :] + bqkv[2 * c :]
    wp1_f = ln2w[:, None] * wp1
    bp1_f = ln2b @ wp1 + bp1

    bd = lambda m: _block_diag(m, g)
    tile_v = lambda v: jnp.tile(jnp.reshape(v, (1, -1)), (1, g))
    tile_dw = lambda k: jnp.tile(k, (1, 1, g))
    msum = _block_diag(jnp.full((c, c), 1.0, _F32), g)

    if v5:
        # ---- v6 precomputed constants (numpy; see the
        # _apply_ffn_kernel_v6 docstring). Column validity is folded into
        # the bias inputs; row validity is a tiny per-tile broadcast input.
        w_real = w if g_sp == 1 else w_img
        as_bf = lambda a: jnp.asarray(a, _BF16)

        def _seg_np(n_lanes, ci_img):
            if g_sp == 1:
                return np.zeros(n_lanes, np.int64)
            return ((np.arange(n_lanes) // ci_img) % g_sp) * w_seg - 2

        def _colmask_np(off, n_lanes, ci_img):
            segl = _seg_np(n_lanes, ci_img)
            gc = (
                np.arange(nw)[:, None, None] * tw
                + np.arange(wp)[None, :, None]
                + off
                + segl[None, None, :]
            )
            return ((gc >= 0) & (gc < w_real)).astype(np.float32)

        cm1_in = as_bf(_colmask_np(-1, cg, c))
        bvm_in = as_bf(_colmask_np(-2, cg, c) * tile_v(bv_f))
        bp1m_in = as_bf(_colmask_np(-1, g * ch_hidden, ch_hidden) * tile_v(bp1_f))
        # 1/c is a power of two: folding it into the segment matrix keeps
        # the bf16 MXU mean exact and deletes the fp32 post-scale passes.
        msum_s = (msum / c).astype(_BF16)
        _jspec = lambda shape: pl.BlockSpec(
            shape, lambda bb, j, i: (j, 0, 0), memory_space=pltpu.VMEM
        )

    if use_dma:
        # The padded input stays in HBM; each kernel DMAs its own
        # overlapping windows (_dma_window). Slot chaining requires strictly
        # sequential grid iteration on every dim.
        win_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        win_scratch = [
            pltpu.VMEM((2, r, wp, cg), _BF16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        gram_sem = ("arbitrary", "arbitrary", "arbitrary")
        apply_sem = ("arbitrary", "arbitrary", "arbitrary")
    else:
        blk = lambda f: pl.BlockSpec(
            (1, 1, th, wp, cg),
            lambda bb, j, i, *_: (bb, j, f(i), 0, 0),
            memory_space=pltpu.VMEM,
        )
        win_specs = [
            blk(lambda i: jnp.maximum(i - 1, 0)),
            blk(lambda i: i),
            blk(lambda i: jnp.minimum(i + 1, nt - 1)),
        ]
        win_scratch = []
        gram_sem = ("parallel", "arbitrary", "arbitrary")
        apply_sem = ("parallel", "parallel", "parallel")

    cpar = lambda sem: pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024, dimension_semantics=sem
    )

    def run_gram():
        if merged:
            # [q | k] halves in the lane dim: one matmul, one depthwise
            # pass, one bias/mask chain (_gram_kernel_merged docstring).
            return pl.pallas_call(
                functools.partial(_gram_kernel_merged, th=th, tw=tw, nw=nw,
                                  nt=nt, c_img=c, g_sp=g_sp, w_seg=w_seg,
                                  ln_bf16=ln_bf16, g=g, h_img=h, bands=bands,
                                  frame_h=frame_h or 0),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(b2, nw, nt),
                    in_specs=[
                        *win_specs,
                        _replicated((cg, cg)),
                        _replicated((cg, 2 * cg)), _replicated((1, 2 * cg)),
                        _replicated((3, 3, 2 * cg)), _replicated((1, 2 * cg)),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, cg, cg), lambda bb, j, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, 2 * cg), lambda bb, j, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=win_scratch,
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((b2, cg, cg), _F32),
                    jax.ShapeDtypeStruct((b2, 1, 2 * cg), _F32),
                ],
                compiler_params=cpar(gram_sem),
                interpret=interpret,
            )(
                hw, xw, msum,
                jnp.concatenate([bd(wq_f), bd(wk_f)], axis=1),
                jnp.concatenate([tile_v(bq_f), tile_v(bk_f)], axis=1),
                jnp.concatenate(
                    [tile_dw(wdw[:, :, :c]), tile_dw(wdw[:, :, c : 2 * c])], axis=-1
                ),
                jnp.concatenate(
                    [tile_v(bdw[:c]), tile_v(bdw[c : 2 * c])], axis=1
                ),
            )
        # Split q/k path: only reached when cg % 128 != 0, i.e. use_dma is
        # False (see _gram_kernel docstring) — blocked specs, no scratch.
        gram, qss, kss = pl.pallas_call(
            functools.partial(_gram_kernel, th=th, tw=tw,
                              c_img=c, g_sp=g_sp, w_seg=w_seg, ln_bf16=ln_bf16),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b2, nw, nt),
                in_specs=[
                    *win_specs,
                    _replicated((cg, cg)),
                    _replicated((cg, cg)), _replicated((1, cg)),
                    _replicated((cg, cg)), _replicated((1, cg)),
                    _replicated((3, 3, cg)), _replicated((1, cg)),
                    _replicated((3, 3, cg)), _replicated((1, cg)),
                ],
                out_specs=[
                    pl.BlockSpec((1, cg, cg), lambda bb, j, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, cg), lambda bb, j, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, cg), lambda bb, j, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b2, cg, cg), _F32),
                jax.ShapeDtypeStruct((b2, 1, cg), _F32),
                jax.ShapeDtypeStruct((b2, 1, cg), _F32),
            ],
            compiler_params=cpar(gram_sem),
            interpret=interpret,
        )(
            hw, xw, xw, xw, msum,
            bd(wq_f), tile_v(bq_f),
            bd(wk_f), tile_v(bk_f),
            tile_dw(wdw[:, :, :c]), tile_v(bdw[:c]),
            tile_dw(wdw[:, :, c : 2 * c]), tile_v(bdw[c : 2 * c]),
        )
        return gram, jnp.concatenate([qss, kss], axis=-1)

    if stage == "apply":
        # Measurement path (benchmarks/bench_fused_block.py): skip kernel A
        # and the finalise; the caller supplies the per-image apply matrix.
        gram_img = qss_img = kss_img = None
        apply_img = apply_override.astype(_F32)
    else:
        gram, qkss = run_gram()
        qss, kss = qkss[..., :cg], qkss[..., cg:]
        # Per-image finalise: pull the g diagonal [C, C] blocks out of the
        # packed gram (cross-image blocks are meaningless), fold softmax into
        # Wproj, then re-pack block-diagonally for the apply kernel.
        if g > 1:
            gram_b = gram.reshape(b2, g, c, g, c)
            gram_img = jnp.stack(
                [gram_b[:, j, :, j, :] for j in range(g)], axis=1
            ).reshape(b, c, c)
            qss_img = qss[:, 0].reshape(b, c)
            kss_img = kss[:, 0].reshape(b, c)
        else:
            gram_img, qss_img, kss_img = gram, qss[:, 0], kss[:, 0]

        if g_sp > 1:
            # One gram per frame: sum the per-segment partial grams/sumsqs,
            # then share the resulting apply matrix across the segments.
            gram_img = gram_img.reshape(b_img, g_sp, c, c).sum(axis=1)
            qss_img = qss_img.reshape(b_img, g_sp, c).sum(axis=1)
            kss_img = kss_img.reshape(b_img, g_sp, c).sum(axis=1)
        if bands > 1:
            # One gram per frame: sum each frame's per-band partials (the
            # own-masked accumulation means every frame pixel is counted
            # exactly once), then share the apply matrix across the bands.
            nf = b // bands
            gram_img = gram_img.reshape(nf, bands, c, c).sum(axis=1)
            qss_img = qss_img.reshape(nf, bands, c).sum(axis=1)
            kss_img = kss_img.reshape(nf, bands, c).sum(axis=1)

        if stage == "gram":
            return gram_img, qss_img, kss_img

        apply_img = finalize_attention(
            gram_img, qss_img, kss_img, temperature, wproj, num_heads
        )  # [B, C, C]
    if g_sp > 1:
        apply_img = jnp.repeat(apply_img, g_sp, axis=0)
    if bands > 1 and apply_img.shape[0] * bands == b:
        apply_img = jnp.repeat(apply_img, bands, axis=0)
    if g > 1:
        blocks = apply_img.reshape(b2, g, c, c)
        apply = jnp.zeros((b2, cg, cg), _F32)
        for j in range(g):
            apply = apply.at[:, j * c : (j + 1) * c, j * c : (j + 1) * c].set(
                blocks[:, j]
            )
    else:
        apply = apply_img

    if v5:
        ch_g = g * ch_hidden
        out = pl.pallas_call(
            functools.partial(_apply_ffn_kernel_v6, th=th, tw=tw, nw=nw, nt=nt, h=h),
            grid=(b2, nw, nt + 1),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                _replicated((cg, cg)),
                pl.BlockSpec(
                    (1, cg, cg), lambda bb, j, i: (bb, 0, 0), memory_space=pltpu.VMEM
                ),
                _replicated((cg, cg)),
                _jspec((1, wp, cg)),
                _replicated((3, 3, cg)),
                _replicated((1, cg)),
                _replicated((1, cg)),
                _replicated((cg, ch_g)),
                _jspec((1, wp, ch_g)),
                _replicated((3, 3, ch_g)),
                _replicated((1, ch_g)),
                _replicated((ch_g, cg)),
                _replicated((1, cg)),
                _jspec((1, wp, cg)),
            ],
            # Phase 2 at step i emits tile i-1; rather than a clamped
            # revisiting index map, the output carries one extra leading
            # tile (block i holds tile i-1, block 0 is prologue garbage)
            # and the host slices rows [th, th+h).
            out_specs=pl.BlockSpec(
                (1, th, tw, cg),
                lambda bb, j, i: (bb, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b2, hp + th, wpad, cg), dtype_in),
            scratch_shapes=win_scratch
            + [pltpu.VMEM((2, th + 2, wp, cg), _BF16)],
            compiler_params=cpar(("arbitrary",) * 3),
            interpret=interpret,
        )(
            xw,
            msum_s,
            apply.astype(_BF16),
            bd(wv_f).astype(_BF16),
            bvm_in,
            tile_dw(wdw[:, :, 2 * c :]).astype(_F32),
            tile_v(bdw[2 * c :]).astype(_BF16),
            tile_v(bproj).astype(_BF16),
            bd(wp1_f).astype(_BF16),
            bp1m_in,
            tile_dw(wdwf).astype(_F32),
            tile_v(bdwf).astype(_BF16),
            bd(wp2).astype(_BF16),
            tile_v(bp2).astype(_BF16),
            cm1_in,
        )
        out = out[:, th : th + h, :w]
        if g > 1:
            out = jnp.transpose(
                out.reshape(b2, h, w, g, c), (0, 3, 1, 2, 4)
            ).reshape(b, h, w, c)
        if g_sp > 1:
            out = out.reshape(b_img, g_sp, h, w_seg + 4, c)[:, :, :, 2 : 2 + w_seg]
            out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(
                b_img, h, g_sp * w_seg, c
            )
            out = out[:, :, :w_img]
        if return_residuals:
            return out, (gram_img, qss_img, kss_img, apply_img)
        return out

    out = pl.pallas_call(
        functools.partial(_apply_ffn_kernel, th=th, tw=tw, nw=nw, nt=nt,
                          c_img=c, ch_img=ch_hidden, g_sp=g_sp, w_seg=w_seg,
                          ln_bf16=ln_bf16, gelu_bf16=gelu_bf16,
                          use_dma=use_dma, n_split=n_split,
                          g=g, h_img=h, bands=bands, frame_h=frame_h or 0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b2, nw, nt),
            in_specs=[
                *win_specs,
                _replicated((cg, cg)),
                pl.BlockSpec((1, cg, cg), lambda bb, j, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
                _replicated((cg, cg)), _replicated((1, cg)),
                _replicated((3, 3, cg)), _replicated((1, cg)),
                _replicated((1, cg)),
                _replicated((cg, g * ch_hidden)), _replicated((1, g * ch_hidden)),
                _replicated((3, 3, g * ch_hidden)), _replicated((1, g * ch_hidden)),
                _replicated((g * ch_hidden, cg)), _replicated((1, cg)),
            ],
            out_specs=pl.BlockSpec(
                (1, th, tw, cg), lambda bb, j, i, *_: (bb, i, j, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=win_scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b2, hp, wpad, cg), dtype_in),
        compiler_params=cpar(apply_sem),
        interpret=interpret,
    )(
        hw, *((xw,) if use_dma else (xw, xw, xw)), msum, apply,
        bd(wv_f), tile_v(bv_f),
        tile_dw(wdw[:, :, 2 * c :]), tile_v(bdw[2 * c :]),
        tile_v(bproj),
        bd(wp1_f), tile_v(bp1_f),
        tile_dw(wdwf), tile_v(bdwf),
        bd(wp2), tile_v(bp2),
    )
    out = out[:, :h, :w]
    if g > 1:
        # [B2, H, W, g*C] -> [B, H, W, C]
        out = jnp.transpose(out.reshape(b2, h, w, g, c), (0, 3, 1, 2, 4)).reshape(
            b, h, w, c
        )
    if g_sp > 1:
        # Strip each segment's 2+2 halo columns and reassemble the frame.
        out = out.reshape(b_img, g_sp, h, w_seg + 4, c)[:, :, :, 2 : 2 + w_seg]
        out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(b_img, h, g_sp * w_seg, c)
        out = out[:, :, :w_img]
    if return_residuals:
        # Tiny per-image attention state for the fused backward
        # (kernels/fused_block_bwd.py): [B,C,C] gram + [B,C] sumsqs + the
        # folded apply matrix. Everything else is recomputed in VMEM.
        return out, (gram_img, qss_img, kss_img, apply_img)
    return out


def gram_pass(x, params, num_heads, **kw):
    """Kernel A only (gram/sumsq accumulation) — measurement entry point."""
    return fused_transformer_block(x, params, num_heads, stage="gram", **kw)


def apply_pass(x, apply_img, params, num_heads, **kw):
    """Kernel B only (attention-apply + FFN), with a caller-supplied
    per-image apply matrix — measurement entry point."""
    return fused_transformer_block(
        x, params, num_heads, stage="apply", apply_override=apply_img, **kw
    )
