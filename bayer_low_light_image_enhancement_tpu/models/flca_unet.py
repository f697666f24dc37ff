"""Transformer_FLCA_UNet: residual-conv/SE U-Net with token-MHSA bottleneck.

Reference: ``/root/reference/Transformer_FLCA_UNet.py``. Operates on packed
planes ([B, H, W, 4] -> [B, H, W, 4]): ResBlock(dilation 1/2, scale 0.2) + SE
stages, an avg-pool frequency-split FLCA per encoder stage, a token
self-attention transformer only at the bottleneck (res_scale 0.2), and a
global residual when in/out channels match.

This family is the repo's only *token* (O(N^2)) attention user — applied at
1/8 resolution where N is small enough for the MXU to eat it whole.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from bayer_low_light_image_enhancement_tpu.models.common import Conv2d, torch_uniform_init
from bayer_low_light_image_enhancement_tpu.models.registry import register_model
from bayer_low_light_image_enhancement_tpu.ops.conv import conv2d, global_mean, spatial_axes
from bayer_low_light_image_enhancement_tpu.ops.flca import SqueezeExcite, resize_bilinear
from bayer_low_light_image_enhancement_tpu.ops.luma import bayer_luma_chroma

Dtype = Any


def frequency_split(x: jnp.ndarray, kernel_size: int = 3, spatial_axis=None):
    """low = 3x3 avg pool (stride 1, same), high = x - low (reference :31-36)."""
    c = x.shape[-1]
    k = jnp.full((kernel_size, kernel_size, 1, 1), 1.0 / (kernel_size**2), x.dtype)
    k = jnp.tile(k, (1, 1, 1, c))
    low = conv2d(x, k, groups=c, spatial_axis=spatial_axis)
    return low, x - low


class PoolFLCA(nn.Module):
    """FLCA with avg-pool frequency split (reference :40-89)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, feat, y, cr, cb):
        _, h, w, c = feat.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        y = resize_bilinear(y, h, w, self.spatial_axis).astype(self.dtype)
        cr = resize_bilinear(cr, h, w, self.spatial_axis).astype(self.dtype)
        cb = resize_bilinear(cb, h, w, self.spatial_axis).astype(self.dtype)
        y_low, y_high = frequency_split(y, spatial_axis=self.spatial_axis)
        a_low = jax.nn.sigmoid(
            Conv2d(c, 3, use_bias=False, name="low_attn", **kw)(y_low).astype(jnp.float32)
        ).astype(self.dtype)
        a_high = jnp.tanh(
            Conv2d(c, 3, use_bias=False, name="high_attn", **kw)(y_high).astype(jnp.float32)
        ).astype(self.dtype)
        a_chr = jax.nn.sigmoid(
            Conv2d(c, 3, use_bias=False, name="chroma_attn", **kw)(
                jnp.concatenate([cr, cb], axis=-1)
            ).astype(jnp.float32)
        ).astype(self.dtype)
        alpha = self.param("alpha", nn.initializers.ones, (), self.param_dtype)
        beta = self.param("beta", nn.initializers.ones, (), self.param_dtype)
        gamma = self.param("gamma", nn.initializers.ones, (), self.param_dtype)
        x = feat * (1.0 + alpha * a_low + beta * a_high + gamma * a_chr).astype(feat.dtype)
        se = SqueezeExcite(name="se", dtype=self.dtype, param_dtype=self.param_dtype,
                           spatial_axis=self.spatial_axis)(x)
        return x * se


class ResBlock(nn.Module):
    dilation: int = 1
    residual_scale: float = 0.2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # conv 3x3 (dilated) -> GELU -> conv 3x3, scaled residual.
        kernel1 = self.param(
            "conv1_kernel", torch_uniform_init(c * 9), (3, 3, c, c), self.param_dtype
        )
        bias1 = self.param("conv1_bias", torch_uniform_init(c * 9), (c,), self.param_dtype)
        y = conv2d(
            x.astype(self.dtype), kernel1.astype(self.dtype),
            bias1.astype(self.dtype), dilation=self.dilation,
            spatial_axis=self.spatial_axis,
        )
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(self.dtype)
        y = Conv2d(c, 3, name="conv2", dtype=self.dtype, param_dtype=self.param_dtype,
                   spatial_axis=self.spatial_axis)(y)
        return x + y * self.residual_scale


class ResCA(nn.Module):
    dilation: int = 1
    residual_scale: float = 0.2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        x = ResBlock(dilation=self.dilation, residual_scale=self.residual_scale, name="rb", **kw)(x)
        se = SqueezeExcite(name="se", **kw)(x)
        return x * se + x  # residual-on-residual (reference :124)


class TokenTransformerBlock(nn.Module):
    """Token MHSA + MLP with 0.2 residual scale (reference :130-150)."""

    num_heads: int = 4
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name="ln1")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name="ln2")
        tn = ln1(t.astype(jnp.float32)).astype(self.dtype)
        # Token attention is global over the image. Under spatial sharding,
        # queries stay local (each shard only needs its own pixels' outputs);
        # keys/values are all-gathered — attention is permutation-invariant
        # in keys, so the gathered token ORDER does not matter and a 2D
        # (H x W) mesh just gathers along both axes. Bottleneck-only (1/8
        # res), so the kv gather is small. This is the gather-kv form of
        # sequence-parallel attention.
        h_ax, w_ax = spatial_axes(self.spatial_axis)
        kv = tn
        for ax in (h_ax, w_ax):
            if ax is not None:
                kv = jax.lax.all_gather(kv, ax, axis=1, tiled=True)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=c,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(tn, kv)
        t = t + attn * 0.2
        tn = ln2(t.astype(jnp.float32)).astype(self.dtype)
        hdim = int(c * self.mlp_ratio)
        m = nn.Dense(hdim, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp1")(tn)
        m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(self.dtype)
        m = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp2")(m)
        t = t + m * 0.2
        return t.reshape(b, h, w, c)


class EncoderStage(nn.Module):
    out_ch: int
    num_blocks: int = 3
    guidance: str = "pool"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x, y, cr, cb):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        x = Conv2d(self.out_ch, 3, name="in_conv", **kw)(x)
        for i in range(self.num_blocks):
            x = ResCA(dilation=1 if i % 2 == 0 else 2, name=f"block{i}", **kw)(x)
        if self.guidance == "dwt":
            from bayer_low_light_image_enhancement_tpu.ops.flca import FLCA

            x = FLCA(name="flca", **kw)(x, y, cr, cb)
        else:
            x = PoolFLCA(name="flca", **kw)(x, y, cr, cb)
        skip = x
        x = Conv2d(self.out_ch, 3, stride=2, name="down", **kw)(x)
        return x, skip


class DecoderStage(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x, skip):
        from bayer_low_light_image_enhancement_tpu.models.common import Upsample2x

        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        x = Upsample2x(self.out_ch, name="up", **kw)(x)
        if x.shape[1:3] != skip.shape[1:3]:
            x = resize_bilinear(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2d(self.out_ch, 3, name="fuse_conv", **kw)(x)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(self.dtype)
        x = ResCA(dilation=1, name="resca1", **kw)(x)
        x = ResCA(dilation=2, name="resca2", **kw)(x)
        return x


@dataclasses.dataclass(frozen=True)
class FLCAUNetConfig:
    in_ch: int = 4
    out_ch: int = 4
    base: int = 48
    blocks: Tuple[int, int, int] = (3, 3, 3)
    heads: int = 4
    # 'pool' = avg-pool frequency split (Transformer_FLCA_UNet.py);
    # 'dwt'  = Haar-DWT guidance (UnetLummaDWT.py) with an enhTail input
    #          branch replacing the identity global residual.
    guidance: str = "pool"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # H mesh axis for spatially-sharded full-resolution inference. The
    # bottleneck token attention uses gather-kv sequence parallelism; SE
    # pools and the luma max psum/pmax across shards.
    spatial_axis: Any = None


class TransformerFLCAUNet(nn.Module):
    config: FLCAUNetConfig = FLCAUNetConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  spatial_axis=cfg.spatial_axis)
        x = x.astype(cfg.dtype)
        y, cr, cb = bayer_luma_chroma(x.astype(jnp.float32),
                                      spatial_axis=cfg.spatial_axis)
        y, cr, cb = (t.astype(cfg.dtype) for t in (y, cr, cb))

        g = cfg.guidance
        x1, s1 = EncoderStage(cfg.base, cfg.blocks[0], g, name="enc1", **kw)(x, y, cr, cb)
        x2, s2 = EncoderStage(cfg.base * 2, cfg.blocks[1], g, name="enc2", **kw)(x1, y, cr, cb)
        x3, s3 = EncoderStage(cfg.base * 4, cfg.blocks[2], g, name="enc3", **kw)(x2, y, cr, cb)

        b = Conv2d(cfg.base * 4, 3, stride=2, name="down_bott", **kw)(x3)
        b = TokenTransformerBlock(num_heads=cfg.heads, name="trans", **kw)(b)
        from bayer_low_light_image_enhancement_tpu.models.common import Upsample2x

        b = Upsample2x(cfg.base * 4, name="up_bott", **kw)(b)
        if b.shape[1:3] != x3.shape[1:3]:
            b = resize_bilinear(b, x3.shape[1], x3.shape[2])

        d3 = DecoderStage(cfg.base * 4, name="dec3", **kw)(b, s3)
        d2 = DecoderStage(cfg.base * 2, name="dec2", **kw)(d3, s2)
        d1 = DecoderStage(cfg.base, name="dec1", **kw)(d2, s1)

        out = Conv2d(cfg.base // 2, 3, name="tail_conv", **kw)(d1)
        out = jax.nn.gelu(out.astype(jnp.float32), approximate=False).astype(cfg.dtype)
        out = Conv2d(cfg.out_ch, 1, name="tail_out", **kw)(out)
        if cfg.guidance == "dwt":
            # UnetLummaDWT.py:278-283: learned enhancement branch from the
            # input replaces the identity residual.
            enh = Conv2d(cfg.base // 2, 3, name="enh_conv", **kw)(x)
            enh = jax.nn.gelu(enh.astype(jnp.float32), approximate=False).astype(cfg.dtype)
            out = out + Conv2d(cfg.out_ch, 1, name="enh_out", **kw)(enh)
        elif cfg.in_ch == cfg.out_ch:
            out = out + x
        return out.astype(jnp.float32)


register_model("flca_unet", lambda **kw: TransformerFLCAUNet(FLCAUNetConfig(**kw)), raw_domain=True)
register_model(
    "unet_luma_dwt",
    lambda **kw: TransformerFLCAUNet(FLCAUNetConfig(guidance="dwt", **kw)),
    raw_domain=True,
)
