"""TrueColorRawFormer: learned-ISP guided U-Net.

Reference: ``/root/reference/TrueColorRawFormer.py:377-453`` (canonical) and
``/root/reference/BayerTORGBColorMultiLvl.py:387-462`` (softplus-positive
gains, residual demosaic refine, bounded tone curve — enabled with
``bayertorgb=True``). The stages are FLCA-style dual branches whose guidance
adds the learned rgb_guide as a 5th channel threaded to all seven stages.
Output head: ReLU (not leaky) -> pixel shuffle -> camera-aware color
correction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.models.common import (
    Conv2d,
    Downsample,
    TransformerBlock,
    Upsample2x,
)
from bayer_low_light_image_enhancement_tpu.models.registry import register_model
from bayer_low_light_image_enhancement_tpu.ops.conv import leaky_relu
from bayer_low_light_image_enhancement_tpu.ops.isp import (
    BayerProcessor,
    ColorCorrection,
    EnhancedFLCA,
)
from bayer_low_light_image_enhancement_tpu.ops.shuffle import depth_to_space, space_to_depth

Dtype = Any


class TrueColorStage(nn.Module):
    """EnhancedConv_Transformer (TrueColorRawFormer.py:340-372; pyramid/
    log-temperature variant BayerTORGBColorMultiLvl.py:370-385)."""

    num_heads: int = 8
    ffn_expansion: int = 2
    flca_levels: int = 1
    log_temperature: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, feat, y, cr, cb, rgb_guide):
        dim = feat.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        flca_feat = EnhancedFLCA(levels=self.flca_levels, name="FLCA", **kw)(
            feat, y, cr, cb, rgb_guide
        )
        trans = TransformerBlock(
            num_heads=self.num_heads, ffn_expansion=self.ffn_expansion,
            log_temperature=self.log_temperature,
            name="Transformer", **kw,
        )(feat)
        x = jnp.concatenate([flca_feat, trans], axis=-1)
        x = Conv2d(dim, 1, name="channel_reduce", **kw)(x)
        return leaky_relu(Conv2d(dim, 3, name="Conv_out", **kw)(x), 0.2)


@dataclasses.dataclass(frozen=True)
class TrueColorConfig:
    inp_channels: int = 1
    out_channels: int = 3
    dim: int = 48
    num_heads: Tuple[int, int, int, int] = (8, 8, 8, 8)
    ffn_expansion: int = 2
    bayertorgb: bool = False  # BayerTORGBColorMultiLvl variant switches
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    spatial_axis: Optional[str] = None


class TrueColorRawFormer(nn.Module):
    config: TrueColorConfig = TrueColorConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  spatial_axis=cfg.spatial_axis)

        def stage(heads, name):
            return TrueColorStage(
                num_heads=heads, ffn_expansion=cfg.ffn_expansion,
                flca_levels=2 if cfg.bayertorgb else 1,
                log_temperature=cfg.bayertorgb,
                name=name, **kw,
            )

        x = x.astype(cfg.dtype)
        x_ds = space_to_depth(x, 2)
        y, cr, cb, rgb_guide = BayerProcessor(
            positive_gains=cfg.bayertorgb, name="bayer_processor", **kw
        )(x_ds)

        x0 = Conv2d(cfg.dim, 3, name="embedding", **kw)(x_ds)

        c1 = stage(cfg.num_heads[0], "conv_tran1")(x0, y, cr, cb, rgb_guide)
        p1 = Downsample(name="down1", **kw)(c1)
        c2 = stage(cfg.num_heads[1], "conv_tran2")(p1, y, cr, cb, rgb_guide)
        p2 = Downsample(name="down2", **kw)(c2)
        c3 = stage(cfg.num_heads[2], "conv_tran3")(p2, y, cr, cb, rgb_guide)
        p3 = Downsample(name="down3", **kw)(c3)
        c4 = stage(cfg.num_heads[3], "conv_tran4")(p3, y, cr, cb, rgb_guide)

        u1 = Upsample2x(cfg.dim * 4, name="up1", **kw)(c4)
        c5 = stage(cfg.num_heads[2], "conv_tran5")(
            Conv2d(cfg.dim * 4, 1, name="channel_reduce1", **kw)(
                jnp.concatenate([u1, c3], axis=-1)
            ),
            y, cr, cb, rgb_guide,
        )
        u2 = Upsample2x(cfg.dim * 2, name="up2", **kw)(c5)
        c6 = stage(cfg.num_heads[1], "conv_tran6")(
            Conv2d(cfg.dim * 2, 1, name="channel_reduce2", **kw)(
                jnp.concatenate([u2, c2], axis=-1)
            ),
            y, cr, cb, rgb_guide,
        )
        u3 = Upsample2x(cfg.dim, name="up3", **kw)(c6)
        c7 = stage(cfg.num_heads[0], "conv_tran7")(
            Conv2d(cfg.dim, 1, name="channel_reduce3", **kw)(
                jnp.concatenate([u3, c1], axis=-1)
            ),
            y, cr, cb, rgb_guide,
        )

        out = jnp.maximum(Conv2d(cfg.out_channels * 4, 3, name="conv_out", **kw)(c7), 0.0)
        out = depth_to_space(out, 2)
        cc_kw = dict(kw)
        cc_kw.pop("spatial_axis")  # ColorCorrection is pointwise
        out = ColorCorrection(
            bounded=cfg.bayertorgb, name="color_correction", **cc_kw
        )(out)
        return out.astype(jnp.float32)


register_model("truecolor_rawformer", lambda **kw: TrueColorRawFormer(TrueColorConfig(**kw)))
register_model(
    "bayertorgb_rawformer",
    lambda **kw: TrueColorRawFormer(TrueColorConfig(bayertorgb=True, **kw)),
)
