"""Fused ConvTransformer stage tail (conv branch + reduce + conv_out).

The canonical stage (``/root/reference/RawFomer_WFB_FFAB/model.py:394-412``)
wraps its TransformerBlock with three more convs:

    conv = lrelu(conv3x3(x));  y = conv1x1(concat([conv, tb(x)]))
    out  = lrelu(conv3x3(y))

At RawFormer's C=32 level-1 scale XLA lowers each 3x3 conv at ~8% of the
bandwidth roofline (BENCHMARKS.md: 2.04 ms for a 0.17 ms-roofline conv) —
the MXU tile is 32/128 occupied and each conv round-trips HBM. This kernel
runs the whole tail in one pass over the same lane-packed halo windows as
``kernels/fused_block``: a full 3x3 conv is 9 per-tap block-diagonal
[gC, gC] matmuls (leading-dim row slices + sublane rolls, no relayouts),
the channel concat disappears into a split reduce weight
(y = conv @ Wr[:C] + tb @ Wr[C:]), and conv/y intermediates stay in VMEM.

Same packing semantics as fused_block (image groups + spatial W-segments);
masks give SAME-conv zero padding at true image edges. Inference-only.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayer_low_light_image_enhancement_tpu.kernels.fused_block import (
    _block_diag,
    _real_mask,
    _replicated,
    _seg_off,
    _win,
)

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _lrelu(x, alpha=0.2):
    return jnp.where(x >= 0, x, alpha * x)


def _conv3x3_bd(z, w_refs):
    """Full 3x3 conv as 9 per-tap MXU matmuls.

    z: [R, Wp, Cg] bf16; w_refs: 9 refs of (Cg, Cg) (block-diagonal, tap
    order (di, dj) row-major — separate 2D refs: slicing a single 4D VMEM
    ref per tap OOM-killed the Mosaic compile).
    Returns [R-2, Wp, Cg] f32 centred at z[o+1, c+1] (+1 column offset, two
    trailing wrap-garbage columns — mask at the call site), matching the
    ``_dw3x3`` coordinate convention.
    """
    r = z.shape[0]
    dn = (((2,), (0,)), ((), ()))
    acc = None
    for dj in range(3):
        s = None
        for di in range(3):
            d = jax.lax.dot_general(
                z[di : r - 2 + di], w_refs[di * 3 + dj][...].astype(z.dtype),
                dimension_numbers=dn, preferred_element_type=_F32,
            )
            s = d if s is None else s + d
        if dj:
            s = jnp.roll(s, -dj, axis=1)
        acc = s if acc is None else acc + s
    return acc


def _stage_tail_kernel(
    hw_ref,                      # scalar prefetch [2]: (H_real, W_real)
    xp_ref, xc_ref, xn_ref,      # x row blocks [1, 1, th, Wp, Cg]
    tp_ref, tc_ref, tn_ref,      # transformer-branch output row blocks
    *refs,                       # 9x conv taps, bc, wr1, wr2, br,
                                 # 9x conv_out taps, bo, out_ref
    th: int,
    tw: int,
    c_img: int,
    g_sp: int,
    w_seg: int,
):
    wc_refs, bc_ref = refs[0:9], refs[9]
    wr1_ref, wr2_ref, br_ref = refs[10], refs[11], refs[12]
    wo_refs, bo_ref = refs[13:22], refs[22]
    out_ref = refs[23]
    i = pl.program_id(2)
    j = pl.program_id(1)
    cb = j * tw
    x = _win(xp_ref, xc_ref, xn_ref, th)
    t = _win(tp_ref, tc_ref, tn_ref, th)
    r, wp, cg = x.shape
    seg = _seg_off(cg, c_img, g_sp, w_seg)
    m0 = _real_mask(i, th, hw_ref, r, wp, row_off=-2, col_off=-2, col_base=cb,
                    seg=seg)
    x = x * m0  # SAME-conv zero padding at true image edges + clamp garbage
    t = t * m0

    conv = _conv3x3_bd(x, wc_refs) + bc_ref[0].astype(_F32)
    m1 = _real_mask(i, th, hw_ref, r - 2, wp, row_off=-1, col_off=-1,
                    col_base=cb, seg=seg, dtype=_F32)
    conv = _lrelu(conv) * m1

    # Reduce: y = conv @ Wr[:C] + t @ Wr[C:] — the channel concat folded
    # into the split weight. t aligns to conv's +1 column offset with one
    # sublane roll and the matching row slice.
    dn = (((2,), (0,)), ((), ()))
    t1 = jnp.roll(t[1 : r - 1], -1, axis=1)
    y = (
        jax.lax.dot_general(conv.astype(_BF16), wr1_ref[...].astype(_BF16),
                            dimension_numbers=dn, preferred_element_type=_F32)
        + jax.lax.dot_general(t1, wr2_ref[...].astype(_BF16),
                              dimension_numbers=dn, preferred_element_type=_F32)
        + br_ref[0].astype(_F32)
    ) * m1

    out = _conv3x3_bd(y.astype(_BF16), wo_refs) + bo_ref[0].astype(_F32)
    out = _lrelu(out)
    out_ref[0] = out[:th, :tw].astype(out_ref.dtype)


def fused_stage_tail(
    x: jnp.ndarray,
    t: jnp.ndarray,
    params: Dict[str, Any],
    tile_rows: int = 16,
    tile_cols: Optional[int] = None,
    group: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """conv/reduce/conv_out tail of a ConvTransformer stage on [B, H, W, C].

    ``x``: stage input; ``t``: the transformer branch's output (same shape).
    ``params``: the ConvTransformer param subtree (conv / channel_reduce /
    conv_out). Packing/tiling semantics identical to
    ``fused_block.fused_transformer_block``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    g_target = group if group is not None else max(1, 256 // c)
    # Largest divisor of b within the lane target (halving alone left the
    # B model at g=2/96 lanes when g=4/192 was available at C=48).
    g = next(gg for gg in range(min(g_target, b), 0, -1) if b % gg == 0)
    g_sp = max(1, g_target // g)
    w_seg = -(-w // (8 * g_sp)) * 8
    while g_sp > 1 and w_seg < 64:
        g_sp //= 2
        w_seg = -(-w // (8 * g_sp)) * 8
    w_img = w
    if g_sp > 1:
        wq = g_sp * w_seg
        pads = ((0, 0), (0, 0), (2, 2 + wq - w), (0, 0))
        def pack(a):
            ap = jnp.pad(a, pads)
            return jnp.stack(
                [ap[:, :, jj * w_seg : jj * w_seg + w_seg + 4] for jj in range(g_sp)],
                axis=1,
            ).reshape(b * g_sp, h, w_seg + 4, c)
        x, t = pack(x), pack(t)
        b_img = b
        b, w = b * g_sp, w_seg + 4
        g *= g_sp
    b2 = b // g
    cg = g * c

    th = tile_rows
    hp = -(-h // th) * th
    nt = hp // th
    if tile_cols is not None:
        tw = tile_cols
    elif w <= 1536:
        tw = w
    else:
        tw = 512 if cg >= 128 else 256
    wpad = -(-w // tw) * tw
    nw = wpad // tw
    wp = tw + 4

    dtype_in = x.dtype

    def to_blocks(a):
        ag = a.astype(_BF16)
        if g > 1:
            ag = jnp.transpose(ag.reshape(b2, g, h, w, c), (0, 2, 3, 1, 4)).reshape(
                b2, h, w, cg
            )
        ap = jnp.pad(ag, ((0, 0), (0, hp - h), (2, 2 + wpad - w), (0, 0)))
        if nw == 1:
            return ap[:, None]
        return jnp.stack(
            [ap[:, :, jj * tw : jj * tw + tw + 4] for jj in range(nw)], axis=1
        )

    xw, tb = to_blocks(x), to_blocks(t)
    hw = jnp.asarray([h, w if g_sp == 1 else w_img], jnp.int32)

    wc = jnp.reshape(params["conv"]["kernel"], (3, 3, c, c))
    bc = params["conv"]["bias"]
    wr = jnp.reshape(params["channel_reduce"]["kernel"], (2 * c, c))
    br = params["channel_reduce"]["bias"]
    wo = jnp.reshape(params["conv_out"]["kernel"], (3, 3, c, c))
    bo = params["conv_out"]["bias"]

    bd_taps = lambda k: [
        _block_diag(k[di, dj], g) for di in range(3) for dj in range(3)
    ]
    tile_v = lambda v: jnp.tile(jnp.reshape(v, (1, -1)), (1, g))

    blk = lambda a_idx, f: pl.BlockSpec(
        (1, 1, th, wp, cg),
        lambda bb, j, i, *_: (bb, j, f(i), 0, 0),
        memory_space=pltpu.VMEM,
    )
    specs = lambda: [
        blk(0, lambda i: jnp.maximum(i - 1, 0)),
        blk(0, lambda i: i),
        blk(0, lambda i: jnp.minimum(i + 1, nt - 1)),
    ]

    out = pl.pallas_call(
        functools.partial(_stage_tail_kernel, th=th, tw=tw, c_img=c, g_sp=g_sp,
                          w_seg=w_seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b2, nw, nt),
            in_specs=[
                *specs(), *specs(),
                *[_replicated((cg, cg)) for _ in range(9)], _replicated((1, cg)),
                _replicated((cg, cg)), _replicated((cg, cg)), _replicated((1, cg)),
                *[_replicated((cg, cg)) for _ in range(9)], _replicated((1, cg)),
            ],
            out_specs=pl.BlockSpec(
                (1, th, tw, cg), lambda bb, j, i, *_: (bb, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b2, hp, wpad, cg), dtype_in),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        hw, xw, xw, xw, tb, tb, tb,
        *bd_taps(wc), tile_v(bc),
        _block_diag(wr[:c], g), _block_diag(wr[c:], g), tile_v(br),
        *bd_taps(wo), tile_v(bo),
    )

    out = out[:, :h, :w]
    if g > 1:
        out = jnp.transpose(out.reshape(b2, h, w, g, c), (0, 3, 1, 2, 4)).reshape(
            b, h, w, c
        )
    if g_sp > 1:
        out = out.reshape(b_img, g_sp, h, w_seg + 4, c)[:, :, :, 2 : 2 + w_seg]
        out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(b_img, h, g_sp * w_seg, c)
        out = out[:, :, :w_img]
    return out
