"""Width-phase-packed convolutions for lane-starved stages.

The RawFormer stages at dim 32 run their 3x3 convs at ~6% MFU on TPU:
C=32 fills only a quarter of the 128-wide vector lanes and MXU tiles
(BENCHMARKS.md component table). This module re-expresses those convs in a
*W-phase-packed* layout:

    [B, H, W, C]  ->  [B, H, W/f, f*C]

which in NHWC row-major memory is a **free reshape** (adjacent W positions
are adjacent in the lane dimension) — unlike full 2x2 space-to-depth, no
relayout copy is paid in either direction. A stride-1 SAME 3x3 conv in the
original domain is exactly a 3x3 SAME conv in the packed domain with a
block-structured kernel

    Wp[kh, bj, pj*C:(pj+1)*C, po*Co:(po+1)*Co] = W[kh, f*bj + pj - po + 1]
                                 (zero unless |f*bj + pj - po| <= 1)

i.e. 1/f of the packed kernel is non-zero: f x the FLOPs of the dense conv,
but at f x the lane occupancy and 1/f the spatial positions — a measured
net win where XLA's dense conv is occupancy-bound (C=32 stage tails;
BENCHMARKS.md "W-phase-packed stage tails").

The reference runs these convs through cuDNN, which has no such problem at
any channel count (``/root/reference/RawFomer_WFB_FFAB/model.py:394-412``);
this is a TPU-lane-geometry rewrite, not a model change — outputs are
identical up to bf16 accumulation-order rounding.

SAME-padding equivalence at the W edges: the packed conv zero-pads one
packed column = f original columns, but every tap reaching outside the
original image carries a zero weight block unless its original offset is
+-1, which lands in the original SAME zero column. Interior taps never read
padding. Hence packed and dense agree exactly (fp32 bitwise up to reduction
order) for any W divisible by f.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def wpack(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H,W/f,f*C]; free in row-major NHWC."""
    b, h, w, c = x.shape
    assert w % f == 0, (w, f)
    return x.reshape(b, h, w // f, f * c)


def wunpack(y: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of :func:`wpack`."""
    b, h, w, cf = y.shape
    assert cf % f == 0, (cf, f)
    return y.reshape(b, h, w * f, cf // f)


def pack_conv3_kernel(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """HWIO [3,3,C,Co] -> packed HWIO [3,3,f*C,f*Co] (see module docstring)."""
    kh, kw, c, co = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    wp = jnp.zeros((3, 3, f * c, f * co), w.dtype)
    for bj in (-1, 0, 1):
        for pj in range(f):
            for po in range(f):
                off = f * bj + pj - po
                if abs(off) <= 1:
                    wp = wp.at[
                        :, bj + 1, pj * c:(pj + 1) * c, po * co:(po + 1) * co
                    ].set(w[:, off + 1])
    return wp


def pack_pointwise_kernel(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """[1,1,Ci,Co] -> block-diagonal [1,1,f*Ci,f*Co] (phases independent)."""
    _, _, ci, co = w.shape
    wp = jnp.zeros((1, 1, f * ci, f * co), w.dtype)
    for p in range(f):
        wp = wp.at[:, :, p * ci:(p + 1) * ci, p * co:(p + 1) * co].set(w)
    return wp


def pack_bias(b: Optional[jnp.ndarray], f: int) -> Optional[jnp.ndarray]:
    """Per-channel bias -> per packed-lane bias (tile across phases)."""
    return None if b is None else jnp.tile(b, f)


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    # Mirrors ops.conv.conv2d's single-chip path (homogeneous dtype, SAME).
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _leaky(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def tail_fusable(x: jnp.ndarray, f: int) -> bool:
    """Geometry gate for :func:`packed_stage_tail`.

    Measured on v5e (BENCHMARKS.md): the packed tail wins whenever the
    packed channel count fills exactly the 128 lanes — C=32/f=4 (round 2)
    and C=64/f=2 (round 3, callers gate the latter via BAYER_TPU_PACK64).
    Beyond 128 packed channels the f x FLOP waste turns the conv MXU-bound
    and loses (the same failure mode as the retired lane-packed whole-stage
    kernel, attic/fused_stage.py). The caller picks ``f`` per channel
    count; W must split evenly into phases.
    """
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    return c * f == 128 and w % f == 0 and w >= 4 * f


def conv_fusable(x: jnp.ndarray, f: int) -> bool:
    """Geometry gate for :func:`packed_conv`: W must split into phases and
    stay wide enough that the f x spatial shrink leaves real tiles."""
    if getattr(x, "ndim", 0) != 4:
        return False
    return x.shape[2] % f == 0 and x.shape[2] >= 4 * f


def packed_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    f: int = 4,
) -> jnp.ndarray:
    """A stride-1 SAME 1x1/3x3 conv evaluated in the W-packed domain.

    Drop-in numerical equivalent of ops.conv.conv2d's single-chip path for
    the lane-starved convs outside the stage tails (the dim-32 model's
    embedding / decoder skip-reduce / output head)."""
    k = kernel.shape[0]
    if k == 1:
        kp = pack_pointwise_kernel(kernel, f)
    else:
        kp = pack_conv3_kernel(kernel, f)
    return wunpack(_conv(wpack(x, f), kp, pack_bias(bias, f)), f)


def packed_downsample(x: jnp.ndarray, kernel: jnp.ndarray, f: int = 4) -> jnp.ndarray:
    """models/common.Downsample (3x3 conv C->C/2 + space_to_depth(2)) with
    the conv in the W-packed domain.

    The trailing space_to_depth is itself a relayout, so fusing the packed
    conv's phase-regrouping INTO it costs nothing extra: the packed conv
    output lane index is (pj, c) with pj the W phase; splitting pj into
    (w2, dj) (f=4) — or using it directly as dj (f=2) — and merging rows
    pairwise produces torch PixelUnshuffle order (c*4 + di*2 + dj) in one
    transpose — the same single copy the dense path's space_to_depth
    already paid."""
    assert f in (2, 4), f
    yp = _conv(wpack(x, f), pack_conv3_kernel(kernel, f), None)
    b, h, wq, lanes = yp.shape
    c2 = lanes // f
    if f == 4:
        y = yp.reshape(b, h // 2, 2, wq, 2, 2, c2)   # b, i, di, wq, w2, dj, c
        y = jnp.transpose(y, (0, 1, 3, 4, 6, 2, 5))  # b, i, wq, w2, c, di, dj
        return y.reshape(b, h // 2, wq * 2, c2 * 4)
    y = yp.reshape(b, h // 2, 2, wq, 2, c2)          # b, i, di, wq, dj, c
    y = jnp.transpose(y, (0, 1, 3, 5, 2, 4))         # b, i, wq, c, di, dj
    return y.reshape(b, h // 2, wq, c2 * 4)


def packed_stage_tail(
    x: jnp.ndarray,
    t: jnp.ndarray,
    params,
    f: int = 4,
) -> jnp.ndarray:
    """The ConvTransformer tail (models/common.py:199-211) in packed layout.

    ``x`` is the stage input, ``t`` the transformer-branch output, ``params``
    the ConvTransformer param subtree (conv / channel_reduce / conv_out).
    Computes leaky(conv3(x)) ++ t -> 1x1 reduce -> leaky(conv3) entirely in
    the W-packed domain; entry/exit reshapes are free.
    """
    c = x.shape[-1]
    wb = pack_conv3_kernel(params["conv"]["kernel"], f)
    bb = pack_bias(params["conv"].get("bias"), f)
    wo = pack_conv3_kernel(params["conv_out"]["kernel"], f)
    bo = pack_bias(params["conv_out"].get("bias"), f)
    # channel_reduce consumes concat([branch, t]): packed concat interleaves
    # phases per source, so split the reduce kernel by source and
    # block-diagonalise each half.
    wr = params["channel_reduce"]["kernel"]
    wr_p = jnp.concatenate(
        [pack_pointwise_kernel(wr[:, :, :c], f),
         pack_pointwise_kernel(wr[:, :, c:], f)],
        axis=2,
    )
    br_p = pack_bias(params["channel_reduce"].get("bias"), f)

    xp, tp = wpack(x, f), wpack(t.astype(x.dtype), f)
    branch = _leaky(_conv(xp, wb, bb))
    y = _conv(jnp.concatenate([branch, tp], axis=-1), wr_p, br_p)
    y = _leaky(_conv(y, wo, bo))
    return wunpack(y, f)
