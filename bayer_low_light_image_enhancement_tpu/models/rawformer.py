"""RawFormer: the canonical channel-attention U-Net (S/B/L).

TPU-native rebuild of the reference RawFormer
(``/root/reference/RawFomer_WFB_FFAB/model.py:437-508`` skeleton with the
channel-attention ``Conv_Transformer`` of ``model.py:394-412``; the root-level
``/root/reference/model.py`` copy has a broken decoder — its skip concats are
never channel-reduced — so the WFB wiring with ``channel_reduce{1..3}`` convs
is the canonical contract, per SURVEY.md §7 "reference inconsistencies").

Contract: input [B, H, W, 1] RAW mosaic in [0, 1]*ratio (packing happens
inside the model via space_to_depth, ``model.py:473-476``), output
[B, H, W, 3] RGB in [0, 1]. NHWC throughout; H and W must be divisible by 16
(one space_to_depth + three downsample stages).

Sizes (``/root/reference/train.py:105``): S/B/L = dim 32/48/64, heads
[8,8,8,8], ffn expansion 2.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.models.common import (
    Conv2d,
    ConvTransformer,
    Downsample,
    Upsample2x,
)
from bayer_low_light_image_enhancement_tpu.models.registry import register_model
from bayer_low_light_image_enhancement_tpu.ops.conv import leaky_relu
from bayer_low_light_image_enhancement_tpu.ops.shuffle import depth_to_space, space_to_depth

SIZE_DIMS = {"S": 32, "B": 48, "L": 64}


@dataclasses.dataclass(frozen=True)
class RawFormerConfig:
    inp_channels: int = 1
    out_channels: int = 3
    dim: int = 48
    num_heads: Tuple[int, int, int, int] = (8, 8, 8, 8)
    ffn_expansion: int = 2
    clamp_io: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    spatial_axis: Optional[str] = None

    @classmethod
    def from_size(cls, size: str, **kw) -> "RawFormerConfig":
        return cls(dim=SIZE_DIMS[size.upper()], **kw)


class RawFormer(nn.Module):
    config: RawFormerConfig = RawFormerConfig()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, prepacked: bool = False
    ) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype, spatial_axis=cfg.spatial_axis)

        def stage(dim_heads, name):
            return ConvTransformer(
                num_heads=dim_heads, ffn_expansion=cfg.ffn_expansion, name=name, **kw
            )

        if prepacked:
            # Input is the already clamped + packed [B, H/2, W/2, 4] planes
            # from kernels/bayer_pack.bayer_pack_normalize(clamp01=True,
            # out_dtype=cfg.dtype) — the fused device-side input path. The
            # param tree is unchanged; only the (clip, space_to_depth)
            # prologue is skipped.
            x = x.astype(cfg.dtype)
        else:
            if cfg.clamp_io:
                x = jnp.clip(x, 0.0, 1.0)
            x = x.astype(cfg.dtype)
            x = space_to_depth(x, 2)
        x = Conv2d(cfg.dim, 3, name="embedding", **kw)(x)

        conv_tran1 = stage(cfg.num_heads[0], "conv_tran1")(x)
        pool1 = Downsample(name="down1", **kw)(conv_tran1)

        conv_tran2 = stage(cfg.num_heads[1], "conv_tran2")(pool1)
        pool2 = Downsample(name="down2", **kw)(conv_tran2)

        conv_tran3 = stage(cfg.num_heads[2], "conv_tran3")(pool2)
        pool3 = Downsample(name="down3", **kw)(conv_tran3)

        conv_tran4 = stage(cfg.num_heads[3], "conv_tran4")(pool3)

        up1 = Upsample2x(cfg.dim * 4, name="up1", **kw)(conv_tran4)
        cat1 = jnp.concatenate([up1, conv_tran3], axis=-1)
        cat1 = Conv2d(cfg.dim * 4, 1, name="channel_reduce1", **kw)(cat1)
        conv_tran5 = stage(cfg.num_heads[2], "conv_tran5")(cat1)

        up2 = Upsample2x(cfg.dim * 2, name="up2", **kw)(conv_tran5)
        cat2 = jnp.concatenate([up2, conv_tran2], axis=-1)
        cat2 = Conv2d(cfg.dim * 2, 1, name="channel_reduce2", **kw)(cat2)
        conv_tran6 = stage(cfg.num_heads[1], "conv_tran6")(cat2)

        up3 = Upsample2x(cfg.dim, name="up3", **kw)(conv_tran6)
        cat3 = jnp.concatenate([up3, conv_tran1], axis=-1)
        cat3 = Conv2d(cfg.dim, 1, name="channel_reduce3", **kw)(cat3)
        conv_tran7 = stage(cfg.num_heads[0], "conv_tran7")(cat3)

        out = leaky_relu(Conv2d(cfg.out_channels * 4, 3, name="conv_out", **kw)(conv_tran7), 0.2)
        out = depth_to_space(out, 2)
        out = out.astype(jnp.float32)
        if cfg.clamp_io:
            out = jnp.clip(out, 0.0, 1.0)
        return out


def _make_rawformer(size: str):
    def build(**kw) -> RawFormer:
        return RawFormer(RawFormerConfig.from_size(size, **kw))

    return build


register_model("rawformer_s", _make_rawformer("S"))
register_model("rawformer_b", _make_rawformer("B"))
register_model("rawformer_l", _make_rawformer("L"))
