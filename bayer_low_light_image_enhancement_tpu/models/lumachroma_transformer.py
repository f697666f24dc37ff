"""BayerLumaChromaTransformer: InstanceNorm U-Net with multi-kernel FLCA.

Reference: ``/root/reference/BayerLumaChromaTransformer.py``
(``Transformer_FLCA_UNet_Full``): InstanceNorm conv blocks, a
resolution-agnostic transformer block with a depthwise local-enhance branch,
FLCA driven by a multi-scale avg-pool frequency split (kernels 7/15/31) with
InstanceNorm'd attention maps, a conv-down/transformer/FLCA/conv-up
bottleneck, and a (projected) global input residual. Operates on packed
planes [B, H, W, 4].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.models.common import Conv2d, Upsample2x
from bayer_low_light_image_enhancement_tpu.models.flca_unet import frequency_split
from bayer_low_light_image_enhancement_tpu.models.luma_variants import SimpleTokenTransformer
from bayer_low_light_image_enhancement_tpu.models.registry import register_model
from bayer_low_light_image_enhancement_tpu.ops.conv import (
    global_mean, leaky_relu, spatial_axes,
)
from bayer_low_light_image_enhancement_tpu.ops.flca import resize_bilinear
from bayer_low_light_image_enhancement_tpu.ops.luma import bayer_luma_chroma

Dtype = Any


def instance_norm(x: jnp.ndarray, eps: float = 1e-5, spatial_axis=None) -> jnp.ndarray:
    """torch nn.InstanceNorm2d default: per-sample, per-channel spatial
    normalisation, no affine params. Stats are global over the image ->
    pmean across spatial shards."""
    xf = x.astype(jnp.float32)
    mu = global_mean(xf, (1, 2), spatial_axis)
    var = global_mean(xf * xf, (1, 2), spatial_axis) - mu * mu
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class MultiKernelFLCA(nn.Module):
    """FLCA with 7/15/31 avg-pool splits and InstanceNorm'd attention maps
    (reference :56-111)."""

    freq_kernels: Tuple[int, ...] = (7, 15, 31)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, feat, y, cr, cb):
        _, h, w, c = feat.shape
        sp = self.spatial_axis
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=sp)
        y_r = resize_bilinear(y, h, w, sp).astype(self.dtype)
        cr_r = resize_bilinear(cr, h, w, sp).astype(self.dtype)
        cb_r = resize_bilinear(cb, h, w, sp).astype(self.dtype)

        # Large pool kernels (halo up to 15 rows; deep stages fall back to
        # the gather path inside conv2d when the halo exceeds the shard).
        low, _ = frequency_split(y_r, kernel_size=15, spatial_axis=sp)
        highs = jnp.concatenate(
            [frequency_split(y_r, kernel_size=k, spatial_axis=sp)[1]
             for k in self.freq_kernels], axis=-1
        )

        low_a = jax.nn.sigmoid(
            instance_norm(Conv2d(c, 3, use_bias=False, name="low_attn", **kw)(low),
                          spatial_axis=sp).astype(jnp.float32)
        ).astype(self.dtype)
        high_a = jnp.tanh(
            instance_norm(Conv2d(c, 3, use_bias=False, name="high_attn", **kw)(highs),
                          spatial_axis=sp).astype(jnp.float32)
        ).astype(self.dtype)
        chroma_a = jax.nn.sigmoid(
            instance_norm(
                Conv2d(c, 3, use_bias=False, name="chroma_attn", **kw)(
                    jnp.concatenate([cr_r, cb_r], axis=-1)
                ),
                spatial_axis=sp,
            ).astype(jnp.float32)
        ).astype(self.dtype)

        out = feat * (1.0 + low_a + high_a + chroma_a)
        return out + Conv2d(c, 1, use_bias=False, name="refine", **kw)(out)


class LocalEnhanceTransformer(nn.Module):
    """Token MHSA with a parallel depthwise local-enhance branch
    (reference :116-147)."""

    num_heads: int = 4
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        t = x.reshape(b, h * w, c)
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name="ln1")
        tn = ln1(t.astype(jnp.float32)).astype(self.dtype)
        # Gather-kv sequence-parallel token attention (queries local; 2D
        # meshes gather keys/values along both sharded axes).
        from bayer_low_light_image_enhancement_tpu.ops.conv import gather_spatial

        kv = gather_spatial(tn, self.spatial_axis, axis=1)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=c,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(tn, kv)
        t = t + attn

        local = Conv2d(c, 3, groups=c, name="local_dw",
                       spatial_axis=self.spatial_axis, **kw)(x)
        local = jax.nn.gelu(local.astype(jnp.float32), approximate=False).astype(self.dtype)
        x_comb = t.reshape(b, h, w, c) + local

        t2 = x_comb.reshape(b, h * w, c)
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name="ln2")
        tn2 = ln2(t2.astype(jnp.float32)).astype(self.dtype)
        m = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, param_dtype=self.param_dtype, name="mlp1")(tn2)
        m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(self.dtype)
        m = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp2")(m)
        return (t2 + m).reshape(b, h, w, c)


class INConvBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x):
        sp = self.spatial_axis
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=sp)
        x = leaky_relu(instance_norm(Conv2d(self.features, 3, name="conv1", **kw)(x),
                                     spatial_axis=sp), 0.2)
        return leaky_relu(instance_norm(Conv2d(self.features, 3, name="conv2", **kw)(x),
                                        spatial_axis=sp), 0.2)


@dataclasses.dataclass(frozen=True)
class LumaChromaTransformerConfig:
    in_ch: int = 4
    out_ch: int = 4
    base: int = 48
    num_blocks: int = 2
    freq_kernels: Tuple[int, ...] = (7, 15, 31)
    heads: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # H mesh axis for spatially-sharded inference (gather-kv token
    # attention, pmean'd InstanceNorm stats, halo pool splits).
    spatial_axis: Any = None


class BayerLumaChromaTransformer(nn.Module):
    config: LumaChromaTransformerConfig = LumaChromaTransformerConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        sp = cfg.spatial_axis
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        cv = dict(spatial_axis=sp)
        raw = x.astype(cfg.dtype)
        y, cr, cb = bayer_luma_chroma(raw.astype(jnp.float32), spatial_axis=sp)
        y, cr, cb = (t.astype(cfg.dtype) for t in (y, cr, cb))

        def encoder(out_ch, name, inp):
            z = Conv2d(out_ch, 3, name=f"{name}_in", **kw, **cv)(inp)
            for i in range(cfg.num_blocks):
                z = INConvBlock(out_ch, name=f"{name}_block{i}", **kw, **cv)(z)
            z = LocalEnhanceTransformer(cfg.heads, name=f"{name}_trans", **kw, **cv)(z)
            z = MultiKernelFLCA(cfg.freq_kernels, name=f"{name}_flca", **kw, **cv)(z, y, cr, cb)
            skip = z
            z = Conv2d(out_ch, 3, stride=2, name=f"{name}_down", **kw, **cv)(z)
            return z, skip

        x1, s1 = encoder(cfg.base, "enc1", raw)
        x2, s2 = encoder(cfg.base * 2, "enc2", x1)
        x3, s3 = encoder(cfg.base * 4, "enc3", x2)

        # Bottleneck: conv-down -> transformer -> FLCA -> conv-up.
        bch = cfg.base * 4
        b = Conv2d(bch, 3, stride=2, name="bott_down", **kw, **cv)(x3)
        b = LocalEnhanceTransformer(cfg.heads, name="bott_trans", **kw, **cv)(b)
        b = MultiKernelFLCA(cfg.freq_kernels, name="bott_flca", **kw, **cv)(b, y, cr, cb)
        b = Upsample2x(bch, name="bott_up", **kw)(b)
        if b.shape[1:3] != x3.shape[1:3]:
            b = resize_bilinear(b, x3.shape[1], x3.shape[2])

        def decoder(out_ch, name, inp, skip):
            z = Upsample2x(out_ch, name=f"{name}_up", **kw)(inp)
            if z.shape[1:3] != skip.shape[1:3]:
                z = resize_bilinear(z, skip.shape[1], skip.shape[2], sp)
            z = jnp.concatenate([z, skip], axis=-1)
            z = Conv2d(out_ch, 3, name=f"{name}_fuse1", **kw, **cv)(z)
            z = jax.nn.gelu(instance_norm(z, spatial_axis=sp).astype(jnp.float32), approximate=False).astype(cfg.dtype)
            z = Conv2d(out_ch, 3, name=f"{name}_fuse2", **kw, **cv)(z)
            return jax.nn.gelu(instance_norm(z, spatial_axis=sp).astype(jnp.float32), approximate=False).astype(cfg.dtype)

        d3 = decoder(cfg.base * 4, "dec3", b, s3)
        d2 = decoder(cfg.base * 2, "dec2", d3, s2)
        d1 = decoder(cfg.base, "dec1", d2, s1)

        out = Conv2d(cfg.base // 2, 3, name="tail_conv", **kw, **cv)(d1)
        out = jax.nn.gelu(out.astype(jnp.float32), approximate=False).astype(cfg.dtype)
        out = Conv2d(cfg.out_ch, 1, name="tail_out", **kw)(out)

        res = raw
        if cfg.in_ch != cfg.out_ch:
            res = Conv2d(cfg.out_ch, 1, name="res_proj", **kw)(raw)
        if res.shape[1:3] != out.shape[1:3]:
            res = resize_bilinear(res, out.shape[1], out.shape[2], sp)
        return (out + res).astype(jnp.float32)


register_model(
    "lumachroma_transformer",
    lambda **kw: BayerLumaChromaTransformer(LumaChromaTransformerConfig(**kw)),
    raw_domain=True,
)
