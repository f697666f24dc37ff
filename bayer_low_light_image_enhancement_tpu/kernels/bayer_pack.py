"""Fused Bayer preprocessing Pallas kernel.

The BASELINE.json north star: the SID loader's black-level subtraction,
white-level normalisation, exposure-ratio amplification and RGGB
pack-to-4-channel (``/root/reference/RawFomer_WFB_FFAB/load_dataset.py:88-90``
+ ``correctdataloader.py:58-72``) fused device-side, operating directly on
the uint16 mosaic — no float32 mosaic intermediate in HBM.

Split of labour (Mosaic constraints shape this):
  * The Pallas kernel does the bandwidth-heavy elementwise part in one pass:
    one uint16 read, the int16-bitcast decode (Mosaic has no uint16->f32
    cast), clip, affine normalisation, and the per-image ratio from SMEM
    (scalar prefetch). The kernel is shape-preserving — any Bayer-pair
    interleave inside the kernel is a tiled-dim relayout Mosaic rejects.
  * The space-to-depth pack to NHWC [B, H/2, W/2, 4] is left to XLA, which
    fuses the relayout into the consumer (the embedding conv).

On non-TPU backends (CPU tests) the kernel runs in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLACK_LEVEL = 512.0
WHITE_LEVEL = 16383.0


def _pack_kernel(
    ratio_ref,
    mosaic_ref,
    out_ref,
    *,
    th: int,
    black: float,
    white: float,
    clamp01: bool,
):
    # Mosaic can't cast uint16 -> f32 directly: bitcast to int16, widen, and
    # undo two's complement for codes >= 32768 (hot pixels above white level).
    xi = pltpu.bitcast(mosaic_ref[0], jnp.int16).astype(jnp.int32)
    xi = jnp.where(xi < 0, xi + 65536, xi)
    x = xi.astype(jnp.float32)  # [2*TH, W]
    x = jnp.clip(x, black, white)
    x = (x - black) * (1.0 / (white - black + 1e-6))
    b = pl.program_id(0)
    x = x * ratio_ref[b]
    if clamp01:
        # The model clamps its input to [0,1] first thing (reference
        # model.py:475); x >= 0 already, so only the top clip is needed.
        # Folding it here lets the prepacked entry skip a full-tensor pass.
        x = jnp.minimum(x, 1.0)
    out_ref[0] = x.astype(out_ref.dtype)


def bayer_pack_normalize(
    mosaic: jnp.ndarray,
    ratio: jnp.ndarray,
    tile_rows: int = 64,
    out_dtype=jnp.float32,
    interpret: bool = None,
    clamp01: bool = False,
) -> jnp.ndarray:
    """[B, H, W] uint16 mosaic + [B] ratio -> [B, H/2, W/2, 4] (R, G1, G2, B).

    Fused device-side equivalent of normalize_sid + pack_bayer for RGGB.
    With ``clamp01`` the model's input clamp (reference model.py:475) is
    folded into the same pass; with ``out_dtype=jnp.bfloat16`` the kernel
    writes bf16 straight into the embedding conv's input — half the HBM
    write traffic and no separate convert pass (VERDICT r2 #2).
    """
    bsz, h, w = mosaic.shape
    if h % 2 or w % 2:
        raise ValueError(f"mosaic dims {(h, w)} must be even")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th = min(tile_rows, h // 2)
    while (h // 2) % th:
        th //= 2
    grid = (bsz, (h // 2) // th)

    kernel = functools.partial(
        _pack_kernel, th=th, black=BLACK_LEVEL, white=WHITE_LEVEL, clamp01=clamp01
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # ratio [B] lands in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    # index_map also receives the scalar-prefetch ref(s).
                    (1, 2 * th, w), lambda b, i, *_: (b, i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 2 * th, w), lambda b, i, *_: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w), out_dtype),
        interpret=interpret,
    )(ratio.astype(jnp.float32), mosaic)
    # Pack via XLA space-to-depth (fuses into the consumer conv).
    from bayer_low_light_image_enhancement_tpu.ops.shuffle import space_to_depth

    return space_to_depth(out[..., None], 2)


def make_raw_u16_forward(apply_fn, dtype=jnp.bfloat16):
    """Compose the fused pack kernel with a model forward.

    ``apply_fn(variables, x, prepacked=True)`` must accept the packed
    [B, H/2, W/2, 4] planes (models/rawformer.py ``prepacked``). The pack
    kernel decodes the uint16 mosaic, normalises, amplifies, clamps and
    emits ``dtype`` (bf16 by default) in ONE pass — the production input
    path: uint16 H2D, no fp32 mosaic or separate clamp/convert in HBM.
    Reference semantics: ``load_dataset.py:81-90`` + ``model.py:475``.
    """

    def forward(variables, mosaic: jnp.ndarray, ratio: jnp.ndarray, **kw):
        x4 = bayer_pack_normalize(mosaic, ratio, out_dtype=dtype, clamp01=True)
        return apply_fn(variables, x4, prepacked=True, **kw)

    return forward


def bayer_pack_normalize_xla(
    mosaic: jnp.ndarray, ratio: jnp.ndarray, out_dtype=jnp.float32
) -> jnp.ndarray:
    """Reference XLA implementation (used for parity tests / fallback)."""
    from bayer_low_light_image_enhancement_tpu.ops.bayer import (
        normalize_sid,
        pack_bayer,
    )

    x = normalize_sid(mosaic[..., None].astype(jnp.float32), ratio.reshape(-1, 1, 1, 1))
    return pack_bayer(x, "RGGB").astype(out_dtype)
