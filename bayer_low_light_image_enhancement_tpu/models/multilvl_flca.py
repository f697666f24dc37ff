"""Multi-level FLCA RawFormer with color anchors.

Reference: ``/root/reference/MultiLvlFrequencyawareLumaChromaAttentionRAWFormer.py``.
The FLCA U-Net with FLCAPyramid stages, plus the two output "protections":

* ``color_anchor_correction``: nudge the per-channel output means toward the
  linear-demosaic input means, strength alpha=0.12 (:270-288);
* an LL-anchor luminance nudge of strength 0.03 from a 2-level Haar of the
  luma guidance (:406-414).

And the companion ``color_consistency_loss`` (:294-307).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from bayer_low_light_image_enhancement_tpu.models.common import (
    Conv2d,
    Downsample,
    TransformerBlock,
    Upsample2x,
)
from bayer_low_light_image_enhancement_tpu.models.registry import register_model
from bayer_low_light_image_enhancement_tpu.ops.conv import global_mean, leaky_relu
from bayer_low_light_image_enhancement_tpu.ops.dwt import haar_dwt_fb
from bayer_low_light_image_enhancement_tpu.ops.flca import FLCAPyramid, resize_bilinear
from bayer_low_light_image_enhancement_tpu.ops.luma import BT601, bayer_luma_chroma
from bayer_low_light_image_enhancement_tpu.ops.shuffle import depth_to_space, space_to_depth

Dtype = Any


def demosaic_from_packed(planes: jnp.ndarray) -> jnp.ndarray:
    """[.., 4] (R, G1, G2, B) -> [.., 3] linear demosaic (reference :351-357)."""
    r = planes[..., 0:1]
    g = 0.5 * (planes[..., 1:2] + planes[..., 2:3])
    b = planes[..., 3:4]
    return jnp.concatenate([r, g, b], axis=-1)


def color_anchor_correction(
    out_rgb: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: float = 0.12,
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Mean-shift out_rgb toward the linear-demosaic mean (reference :270-288)."""
    in_rgb = demosaic_from_packed(packed)
    # Means are resize-invariant, so skip the reference's upsample.
    in_mean = global_mean(in_rgb, (1, 2), spatial_axis)
    out_mean = global_mean(out_rgb, (1, 2), spatial_axis)
    return out_rgb + alpha * (in_mean - out_mean)


def color_consistency_loss(pred_rgb: jnp.ndarray, packed: jnp.ndarray) -> jnp.ndarray:
    """L2 between per-channel means of prediction and demosaiced input
    (reference :294-307)."""
    in_mean = jnp.mean(demosaic_from_packed(packed).astype(jnp.float32), axis=(1, 2))
    out_mean = jnp.mean(pred_rgb.astype(jnp.float32), axis=(1, 2))
    return jnp.mean((in_mean - out_mean) ** 2)


class PyramidStage(nn.Module):
    num_heads: int = 8
    ffn_expansion: int = 2
    flca_levels: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, feat, y, cr, cb):
        dim = feat.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        flca_feat = FLCAPyramid(levels=self.flca_levels, name="FLCA", **kw)(feat, y, cr, cb)
        trans = TransformerBlock(
            num_heads=self.num_heads, ffn_expansion=self.ffn_expansion,
            name="Transformer", **kw,
        )(feat)
        x = jnp.concatenate([flca_feat, trans], axis=-1)
        x = Conv2d(dim, 1, name="channel_reduce", **kw)(x)
        return leaky_relu(Conv2d(dim, 3, name="Conv_out", **kw)(x), 0.2)


@dataclasses.dataclass(frozen=True)
class MultiLvlFLCAConfig:
    inp_channels: int = 1
    out_channels: int = 3
    dim: int = 48
    num_heads: Tuple[int, int, int, int] = (8, 8, 8, 8)
    ffn_expansion: int = 2
    flca_levels: int = 2
    anchor_alpha: float = 0.12
    ll_nudge: float = 0.03
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    spatial_axis: Optional[str] = None


class MultiLvlFLCARawFormer(nn.Module):
    config: MultiLvlFLCAConfig = MultiLvlFLCAConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  spatial_axis=cfg.spatial_axis)

        def stage(heads, name):
            return PyramidStage(
                num_heads=heads, ffn_expansion=cfg.ffn_expansion,
                flca_levels=cfg.flca_levels, name=name, **kw,
            )

        x = x.astype(cfg.dtype)
        x_ds = space_to_depth(x, 2)
        y, cr, cb = bayer_luma_chroma(
            x_ds.astype(jnp.float32), spatial_axis=cfg.spatial_axis
        )

        # Deep LL anchor: 2-level Haar of y (reference :362-368).
        ll_anchor = y
        for _ in range(2):
            ll_anchor, _ = haar_dwt_fb(ll_anchor)

        yc, crc, cbc = (t.astype(cfg.dtype) for t in (y, cr, cb))
        x0 = Conv2d(cfg.dim, 3, name="embedding", **kw)(x_ds)

        c1 = stage(cfg.num_heads[0], "conv_tran1")(x0, yc, crc, cbc)
        p1 = Downsample(name="down1", **kw)(c1)
        c2 = stage(cfg.num_heads[1], "conv_tran2")(p1, yc, crc, cbc)
        p2 = Downsample(name="down2", **kw)(c2)
        c3 = stage(cfg.num_heads[2], "conv_tran3")(p2, yc, crc, cbc)
        p3 = Downsample(name="down3", **kw)(c3)
        c4 = stage(cfg.num_heads[3], "conv_tran4")(p3, yc, crc, cbc)

        u1 = Upsample2x(cfg.dim * 4, name="up1", **kw)(c4)
        c5 = stage(cfg.num_heads[2], "conv_tran5")(
            Conv2d(cfg.dim * 4, 1, name="channel_reduce1", **kw)(
                jnp.concatenate([u1, c3], axis=-1)
            ),
            yc, crc, cbc,
        )
        u2 = Upsample2x(cfg.dim * 2, name="up2", **kw)(c5)
        c6 = stage(cfg.num_heads[1], "conv_tran6")(
            Conv2d(cfg.dim * 2, 1, name="channel_reduce2", **kw)(
                jnp.concatenate([u2, c2], axis=-1)
            ),
            yc, crc, cbc,
        )
        u3 = Upsample2x(cfg.dim, name="up3", **kw)(c6)
        c7 = stage(cfg.num_heads[0], "conv_tran7")(
            Conv2d(cfg.dim, 1, name="channel_reduce3", **kw)(
                jnp.concatenate([u3, c1], axis=-1)
            ),
            yc, crc, cbc,
        )

        out = leaky_relu(Conv2d(cfg.out_channels * 4, 3, name="conv_out", **kw)(c7), 0.2)
        out = depth_to_space(out, 2).astype(jnp.float32)

        out = color_anchor_correction(
            out, x_ds.astype(jnp.float32), cfg.anchor_alpha,
            spatial_axis=cfg.spatial_axis,
        )

        # LL-anchor luminance nudge (reference :406-414).
        h, w = out.shape[1], out.shape[2]
        ll_up = resize_bilinear(ll_anchor, h, w, cfg.spatial_axis)
        wr, wg, wb = BT601
        out_y = wr * out[..., 0:1] + wg * out[..., 1:2] + wb * out[..., 2:3]
        out = out + (ll_up - out_y) * cfg.ll_nudge

        return out


register_model(
    "multilvl_flca_rawformer",
    lambda **kw: MultiLvlFLCARawFormer(MultiLvlFLCAConfig(**kw)),
)
