"""Inference-time routing of TransformerBlocks onto the fused Pallas kernel.

The reference runs eval with the same module graph as training
(``/root/reference/test.py:107-116``); on TPU the XLA lowering of the
TransformerBlock is HBM-bound (BENCHMARKS.md), so inference swaps in
``kernels/fused_block.fused_transformer_block``. Rather than forking the
model definitions or the checkpoint tree, we intercept TransformerBlock
calls with ``flax.linen.intercept_methods`` — the bound module hands us its
param subtree, and every model in the zoo that composes TransformerBlock
(canonical RawFormer, the FLCA variants' transformer branches, ...) gets the
kernel for free.

Training routes through the custom-VJP twins instead: the fused
TransformerBlock backward (kernels/fused_block_bwd.py) and the plain-XLA
W-packed rewrites (ops/wpack.py), whose backwards autodiff derives.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional

import flax.linen as nn
import jax

from bayer_low_light_image_enhancement_tpu.kernels.fused_block import (
    fused_transformer_block,
)
from bayer_low_light_image_enhancement_tpu.ops import wpack as wpack_ops
from bayer_low_light_image_enhancement_tpu.models.common import (
    Conv2d,
    ConvTransformer,
    Downsample,
    TransformerBlock,
)

# Named lane-starved convs of the canonical dim-32 model rewritten in the
# W-packed domain at inference (ops/wpack.py): the 4->32 embedding, the
# level-1 decoder skip-reduce (64->32 at the largest spatial extent), and
# the 32->12 output head. Deeper convs already fill the lanes; measured
# gates in BENCHMARKS.md.
_PACKED_CONV_NAMES = frozenset({"embedding", "channel_reduce3", "conv_out"})


def _fuse_cmax() -> int:
    """Channel-width ceiling for fused-block interception (round-4 A/Bs in
    BENCHMARKS.md): the kernel wins at C=32 (2.02x) and C=64 (1.29x)
    everywhere, and — since the v4 explicit-DMA restructure — at the deep
    crop levels too (1.28x at [8,64,64,128] th=16, 1.18x at
    [8,32,32,256]); the v2-era measurements that gated these off (1.01x /
    0.94x) are stale. ``BAYER_TPU_FUSE_CMAX`` overrides for A/Bs."""
    return int(os.environ.get("BAYER_TPU_FUSE_CMAX", "256"))


def _deep_fuse_max_pixels() -> int:
    """Deep-level (C>64) fusion pixel-extent gate (``BAYER_TPU_FUSE_PXMAX``
    overrides). Round-2 measured a regression at full-res level-3 geometry
    (354x530 @ C=128) and gated deep fusion to crop-like extents (16384 px);
    re-measured round 5 under the v4 explicit-DMA kernel, the SAME geometry
    now wins 1.33x (4.71 vs 6.28 ms) — the stale gate was costing ~3 ms per
    12MP frame — so the default gate is wide open (2^31)."""
    return int(os.environ.get("BAYER_TPU_FUSE_PXMAX", str(2**31)))


def _fusable(module: nn.Module, args) -> bool:
    if module.spatial_axis is not None:
        # Spatially-sharded attention psums across chips inside shard_map;
        # the single-chip kernel's gram would silently be shard-local.
        return False
    if not args or getattr(args[0], "ndim", 0) != 4:
        return False
    c = args[0].shape[-1]
    if c > _fuse_cmax():
        return False
    if c > 64 and args[0].shape[1] * args[0].shape[2] > _deep_fuse_max_pixels():
        return False
    return True


def _should_fuse(module: nn.Module, args, kwargs) -> bool:
    return isinstance(module, TransformerBlock) and _fusable(module, args)


def _packed_tail_default() -> bool:
    return os.environ.get("BAYER_TPU_PACKED_TAIL", "1") == "1"


def _pack_factor(c: int) -> Optional[int]:
    """W-phase pack factor filling the 128 lanes exactly: f=4 at C=32,
    f=2 at C=64 (measured win at full-res level-2 geometry; crops A/B in
    BENCHMARKS.md round 3). None = keep the dense XLA conv."""
    if c == 32:
        return 4
    if c == 64 and os.environ.get("BAYER_TPU_PACK64", "1") == "1":
        return 2
    return None


def _should_pack_conv(module: nn.Module, args) -> bool:
    return (
        isinstance(module, Conv2d)
        and module.name in _PACKED_CONV_NAMES
        and module.spatial_axis is None
        and module.stride == 1
        and module.dilation == 1
        and module.groups == 1
        and module.kernel_size in (1, 3)  # variants reuse these names
        and bool(args)
        and wpack_ops.conv_fusable(args[0], 4)
        # Measured win regimes only: the f x FLOP waste turns a 3x3 at
        # C>=64 MXU-bound (0.66x), while the pointwise reduce stays
        # traffic-bound up to C=64. Note ConvTransformer's INNER conv_out
        # shares the name — this gate keeps the C=64 stages on XLA.
        and args[0].shape[-1] <= (32 if module.kernel_size == 3 else 64)
    )


def _should_pack_down(module: nn.Module, args) -> Optional[int]:
    """Returns the pack factor (4 at C=32, 2 at C=64) or None."""
    if not (
        isinstance(module, Downsample)
        and module.spatial_axis is None
        and bool(args)
        and getattr(args[0], "ndim", 0) == 4
        and args[0].shape[1] % 2 == 0
    ):
        return None
    f = _pack_factor(args[0].shape[-1])
    if f is not None and wpack_ops.conv_fusable(args[0], f):
        return f
    return None


def _should_pack_tail(module: nn.Module, args) -> Optional[int]:
    """W-phase-packed stage tail (ops/wpack.py): rewrite the ConvTransformer
    conv-branch + reduce + conv_out in the free-reshape packed layout where
    the dense convs are lane-starved (C=32 -> 4x128 lanes, C=64 -> 2x128).
    Gated to the canonical (inner=None) unsharded stage; the transformer
    branch must be kernel-fusable too so the whole stage leaves the XLA
    slow path. Returns the pack factor or None."""
    if not (
        isinstance(module, ConvTransformer)
        and module.inner is None
        and module.spatial_axis is None
        and bool(args)
        and getattr(args[0], "ndim", 0) == 4
    ):
        return None
    f = _pack_factor(args[0].shape[-1])
    if f is not None and wpack_ops.tail_fusable(args[0], f):
        return f
    return None


# Whole-stage fusion (formerly kernels/fused_stage.py, now attic/) measured
# a LOSS on chip and was retired: at [8,256,256,32] the Pallas tail ran
# 3.33 ms vs ~1.85 ms for XLA's tail overlapped into the stage — full 3x3
# convs become 18 dense block-diagonal [gC, gC] tap-matmuls whose 8x
# zero-block FLOP waste is MXU-bound. Writeup in BENCHMARKS.md.


def _band_halo(x, r: int, bands: int):
    """Rows from the neighbouring bands (bands ride the batch axis,
    batch-major per frame; zeros at each frame's own top/bottom edges —
    identical to the monolithic frame's SAME pad). Built by overlapping
    slices of the zero-padded FRAME view so a halo may span several bands
    (bottleneck bands can be a single row tall).

    Negative result (round 5, keep for the record): running the spatial
    convs on the free FRAME VIEW instead (reshape [K,Hb,..] -> [1,K*Hb,..],
    exact with zero halo cost) measured 164.5 ms full-res vs 152.7 with
    these halo copies — the frame view puts the convs back at the slow
    monolithic geometry and the view reshapes break XLA fusion; the band
    GEOMETRY is what the halo copies buy."""
    import jax.numpy as jnp

    h = x.shape[1]
    nf = x.shape[0] // bands
    frame = x.reshape(nf, bands * h, *x.shape[2:])
    fp = jnp.pad(frame, ((0, 0), (r, r)) + ((0, 0),) * (frame.ndim - 2))
    out = jnp.stack(
        [fp[:, k * h : k * h + h + 2 * r] for k in range(bands)], axis=1
    )
    return out.reshape(x.shape[0], h + 2 * r, *x.shape[2:])


def fused_apply(
    model: nn.Module,
    variables: Any,
    *args,
    tile_rows: Optional[int] = None,
    trainable: bool = False,
    packed_tail: Optional[bool] = None,
    bands: int = 1,
    method=None,
    **kwargs,
):
    """``model.apply(variables, *args)`` with TransformerBlocks fused.

    ``tile_rows``: kernel H-tile override (default: fused_block's default).
    ``trainable``: route blocks through the custom-VJP version
    (kernels/fused_block_bwd.py) so the fused kernels run in TRAINING too —
    forward and backward both Pallas, grads parity-tested against fp32
    truth (and tighter than XLA's own bf16 autodiff on the cancelling bias
    sums). Blocks outside the trainable geometry (see fused_block_bwd
    docstring) keep the plain XLA path.
    ``packed_tail``: also rewrite the lane-starved ConvTransformer tails
    and named convs/downsamples in the W-phase-packed layout (ops/wpack.py)
    — C=32 at f=4, and C=64 at f=2 (the latter gated by the
    ``BAYER_TPU_PACK64`` env var) — in both inference and training.
    Defaults to the ``BAYER_TPU_PACKED_TAIL`` env var (on).
    Falls back to the plain path automatically for spatially-sharded blocks.

    ``bands``: single-chip H-band streaming for full-resolution frames
    (round 5; inference only). The caller passes x as ``bands`` contiguous
    H-bands of ONE frame riding the batch axis (see
    :func:`make_banded_forward`); every op then runs at crop-like batched
    geometry — measured 1.51x the monolithic full-res graph — while
    staying numerically identical to it: 3x3 convs see real neighbour-band
    on the free frame view (exact, zero halo cost), the fused attention
    kernel fills its windows' halos from neighbour bands and sums each
    frame's gram across bands (``fused_transformer_block(bands=)``), and
    band-preserving ops (1x1 convs, LN, s2d/d2s) are untouched.
    """
    kw = {} if tile_rows is None else {"tile_rows": tile_rows}
    if packed_tail is None:
        packed_tail = _packed_tail_default()
    if bands > 1 and trainable:
        raise ValueError("band streaming is an inference path")

    def interceptor(next_fn, iargs, ikwargs, context):
        module = context.module
        if context.method_name != "__call__":
            return next_fn(*iargs, **ikwargs)
        if trainable:
            # Packed convs/tails are plain XLA ops (autodiff derives their
            # packed backward at the same full lane occupancy), so they
            # apply in training too; only the transformer branch needs the
            # custom-VJP kernel.
            if packed_tail and _should_pack_conv(module, iargs):
                p = module.variables["params"]
                x = iargs[0].astype(module.dtype)
                return wpack_ops.packed_conv(x, p["kernel"], p.get("bias"), f=4)
            fd = _should_pack_down(module, iargs) if packed_tail else None
            if fd is not None:
                p = module.variables["params"]
                x = iargs[0].astype(module.dtype)
                return wpack_ops.packed_downsample(x, p["conv"]["kernel"], f=fd)
            ft = _should_pack_tail(module, iargs) if packed_tail else None
            if ft is not None and _fusable(module, iargs):
                from bayer_low_light_image_enhancement_tpu.kernels.fused_block_bwd import (
                    fused_transformer_block_train,
                    trainable_fusable,
                )

                if trainable_fusable(iargs[0]):
                    params = module.variables["params"]
                    x = iargs[0].astype(module.dtype)
                    t = fused_transformer_block_train(
                        x, params["transformer"], module.num_heads
                    )
                    return wpack_ops.packed_stage_tail(x, t, params, f=ft)
            if _should_fuse(module, iargs, ikwargs):
                from bayer_low_light_image_enhancement_tpu.kernels.fused_block_bwd import (
                    fused_transformer_block_train,
                    trainable_fusable,
                )

                if trainable_fusable(iargs[0]):
                    params = module.variables["params"]
                    return fused_transformer_block_train(
                        iargs[0], params, module.num_heads
                    )
            return next_fn(*iargs, **ikwargs)
        if packed_tail and _should_pack_conv(module, iargs):
            p = module.variables["params"]
            x = iargs[0].astype(module.dtype)
            if bands > 1 and module.kernel_size == 3:
                hb = x.shape[1]
                y = wpack_ops.packed_conv(
                    _band_halo(x, 1, bands), p["kernel"], p.get("bias"), f=4
                )
                return y[:, 1 : 1 + hb]
            return wpack_ops.packed_conv(x, p["kernel"], p.get("bias"), f=4)
        fd = _should_pack_down(module, iargs) if packed_tail else None
        if fd is not None:
            p = module.variables["params"]
            x = iargs[0].astype(module.dtype)
            if bands > 1:
                hb = x.shape[1]
                y = wpack_ops.packed_downsample(
                    _band_halo(x, 2, bands), p["conv"]["kernel"], f=fd
                )
                return y[:, 1 : 1 + hb // 2]
            return wpack_ops.packed_downsample(x, p["conv"]["kernel"], f=fd)
        ft = _should_pack_tail(module, iargs) if packed_tail else None
        if ft is not None and _fusable(module, iargs):
            params = module.variables["params"]
            x = iargs[0].astype(module.dtype)
            t = fused_transformer_block(
                x, params["transformer"], module.num_heads, bands=bands, **kw
            )
            if bands > 1:
                hb = x.shape[1]
                y = wpack_ops.packed_stage_tail(
                    _band_halo(x, 2, bands), _band_halo(t, 2, bands),
                    params, f=ft
                )
                return y[:, 2 : 2 + hb]
            return wpack_ops.packed_stage_tail(x, t, params, f=ft)
        if _should_fuse(module, iargs, ikwargs) or (
            bands > 1 and isinstance(module, TransformerBlock)
        ):
            # Band mode force-fuses EVERY TransformerBlock regardless of the
            # cmax/pixel gates: cross-band gram summation only exists in the
            # kernel, and a per-band XLA block would silently compute
            # band-local attention.
            if bands > 1 and module.spatial_axis is not None:
                raise ValueError("band mode cannot nest spatial sharding")
            params = module.variables["params"]
            return fused_transformer_block(
                iargs[0], params, module.num_heads, bands=bands, **kw
            )
        if (
            bands > 1
            and isinstance(module, Conv2d)
            and module.kernel_size > 1
            and module.stride == 1
            and module.dilation == 1
            and module.spatial_axis is None
            and getattr(iargs[0], "ndim", 0) == 4
        ):
            # Generic banded 3x3/5x5: neighbour-band halo rows + crop ==
            # the monolithic frame's SAME conv (covers Downsample's inner
            # conv, the unpacked stage tails at C>=128, and any head conv
            # the packed route declined).
            r = (module.kernel_size - 1) * module.dilation // 2
            hb = iargs[0].shape[1]
            y = next_fn(_band_halo(iargs[0], r, bands), *iargs[1:], **ikwargs)
            return y[:, r : r + hb]
        return next_fn(*iargs, **ikwargs)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, *args, method=method, **kwargs)


def make_fused_forward(
    model: nn.Module,
    tile_rows: Optional[int] = None,
    trainable: bool = False,
):
    """jit-friendly closure: (variables, x) -> y with fused blocks."""

    @functools.wraps(model.apply)
    def forward(variables, x, **kwargs):
        return fused_apply(
            model, variables, x, tile_rows=tile_rows, trainable=trainable,
            **kwargs,
        )

    return forward


def pick_bands(h: int, target: int = 8, unit: int = 16) -> int:
    """Largest band count <= target such that h splits into equal bands
    each divisible by ``unit`` (the model's /16 grid). The eval CLI pads H
    to a multiple of ``target*unit`` first, so this normally returns
    ``target``; odd pre-padded heights degrade gracefully toward 1."""
    for k in range(target, 0, -1):
        if h % k == 0 and (h // k) % unit == 0:
            return k
    return 1


def make_banded_forward(
    model: nn.Module,
    bands: int,
    tile_rows: Optional[int] = None,
):
    """Single-chip H-band-streamed full-resolution forward (inference).

    The monolithic batch-1 12MP graph runs every op at a geometry the chip
    hates (round-5 attribution: 163.6 ms vs 108.6 for the identical pixels
    as an 8-band batch). This closure splits each frame into ``bands``
    contiguous H-bands riding the batch axis — a FREE reshape in NHWC
    row-major — and runs :func:`fused_apply` in band mode, which keeps the
    result numerically identical to the monolithic forward (neighbour-band
    halos for every spatial op, per-frame gram summation in the attention;
    see ``fused_apply``'s ``bands`` doc). The output is re-assembled to
    frame shape. H must split into equal /16-divisible bands
    (:func:`pick_bands`; the eval CLI pads accordingly).
    """

    @functools.wraps(model.apply)
    def forward(variables, x, **kwargs):
        b, h, w, c = x.shape
        hb = h // bands
        xb = x.reshape(b * bands, hb, w, c)
        y = fused_apply(
            model, variables, xb, tile_rows=tile_rows, bands=bands, **kwargs
        )
        return y.reshape(b, h, w, y.shape[-1])

    return forward
