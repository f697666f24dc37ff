"""Luma-guided variants: luminance-aware token MHSA and the simple FLCA U-Net.

1. ``LumaMHSARawFormer`` — reference ``/root/reference/Attenblock.py``:
   *token* self-attention (the zoo's O(N^2) exception) with luma FiLM
   conditioning (gamma/beta from a conv net over pooled luma) plus a
   centered inverse-luma scalar query bias (alpha-scaled); per-stage
   average-pooled luma (H/2..H/16); CFA-phase-aware 3x3 luma extraction
   kernels for all four Bayer patterns (``Attenblock.py:79-138``).
   Deviation (SURVEY.md §7): the reference decoder's proj2/proj3 assume
   concat widths (dim*6 / dim*3) inconsistent with its own up-projections;
   we use the consistent widths (dim*4 / dim*2).

2. ``SimpleFLCAUNet`` — reference ``/root/reference/rawformerwithLumma.py``:
   plain conv blocks + max-pool U-Net over packed planes, a token
   transformer + FLCA (15-tap avg-pool frequency split, unnormalised luma)
   at each scale.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bayer_low_light_image_enhancement_tpu.models.common import (
    Conv2d,
    ConvFFN,
    Downsample,
    LayerNorm2d,
    Upsample2x,
)
from bayer_low_light_image_enhancement_tpu.models.flca_unet import frequency_split
from bayer_low_light_image_enhancement_tpu.models.registry import register_model
from bayer_low_light_image_enhancement_tpu.ops.conv import (
    conv2d, global_mean, global_max, global_min, leaky_relu, spatial_axes,
)
from bayer_low_light_image_enhancement_tpu.ops.luma import BT601
from bayer_low_light_image_enhancement_tpu.ops.shuffle import depth_to_space, space_to_depth

Dtype = Any

# 3x3 CFA extraction taps per pattern (Attenblock.py:93-127): positions of
# nonzero weights in the 3x3 kernel for each of r/g/b.
_CFA_TAPS = {
    "rggb": {"r": [((0, 0), 1.0)], "g": [((0, 1), 0.5), ((1, 0), 0.5)], "b": [((1, 1), 1.0)]},
    "bggr": {"b": [((0, 0), 1.0)], "g": [((0, 1), 0.5), ((1, 0), 0.5)], "r": [((1, 1), 1.0)]},
    "grbg": {"g": [((0, 0), 0.5), ((1, 1), 0.5)], "r": [((0, 1), 1.0)], "b": [((1, 0), 1.0)]},
    "gbrg": {"g": [((0, 0), 0.5), ((1, 1), 0.5)], "b": [((0, 1), 1.0)], "r": [((1, 0), 1.0)]},
}


def bayer_luma_cfa(mosaic: jnp.ndarray, pattern: str = "rggb",
                   spatial_axis=None) -> jnp.ndarray:
    """[B, H, W, 1] mosaic -> [B, H, W, 1] min-max-normalised luma via 3x3
    CFA extraction convs (Attenblock.py:129-138)."""
    taps = _CFA_TAPS[pattern.lower()]
    kernels = np.zeros((3, 3, 1, 3), np.float32)
    for ci, ch in enumerate("rgb"):
        for (i, j), wgt in taps[ch]:
            kernels[i, j, 0, ci] = wgt
    rgb = conv2d(mosaic.astype(jnp.float32), jnp.asarray(kernels),
                 spatial_axis=spatial_axis)
    luma = jnp.sum(rgb * jnp.asarray(BT601, jnp.float32), axis=-1, keepdims=True)
    lo = global_min(luma, (1, 2, 3), spatial_axis)
    hi = global_max(luma, (1, 2, 3), spatial_axis)
    return (luma - lo) / (hi - lo + 1e-6)


def avg_pool(x: jnp.ndarray, k: int, stride: int = None, pad: str = "VALID") -> jnp.ndarray:
    stride = stride or k
    s = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, (1, k, k, 1), (1, stride, stride, 1), pad
    )
    return (s / (k * k)).astype(x.dtype)


class LumaCond(nn.Module):
    """FiLM gamma/beta from luma (Attenblock.py:145-160)."""

    inner: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, luma):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        hidden = max(16, self.inner // 2)
        h = jnp.maximum(Conv2d(hidden, 3, name="net0", **kw)(luma), 0.0)
        h = jnp.maximum(Conv2d(hidden, 3, name="net1", **kw)(h), 0.0)
        return (
            Conv2d(self.inner, 1, name="gamma", **kw)(h),
            Conv2d(self.inner, 1, name="beta", **kw)(h),
        )


class LuminanceAwareMHSA(nn.Module):
    """Token MHSA with luma FiLM + inverse-luma query bias
    (Attenblock.py:162-220)."""

    num_heads: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x, luma):
        b, h, w, c = x.shape
        dh = c // self.num_heads
        inner = self.num_heads * dh
        n = h * w
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        qkv = Conv2d(inner * 3, 1, name="to_qkv", **kw)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        gamma, beta = LumaCond(inner, name="luma_cond",
                               spatial_axis=self.spatial_axis, **kw)(luma)

        def to_tokens(t):
            return t.reshape(b, n, self.num_heads, dh).transpose(0, 2, 1, 3)

        g, bta = to_tokens(gamma), to_tokens(beta)
        q = g * to_tokens(q) + bta
        k = g * to_tokens(k) + bta
        v = g * to_tokens(v) + bta

        # Centered inverse-luma scalar bias on queries (mean is global over
        # the image's tokens -> pmean across H shards).
        alpha = self.param("alpha", nn.initializers.zeros, (), self.param_dtype)
        inv = 1.0 - luma
        ones = jnp.full((3, 3, 1, 1), 1.0 / 9.0, jnp.float32)
        inv = conv2d(inv.astype(jnp.float32), ones,
                     spatial_axis=self.spatial_axis).astype(inv.dtype)
        inv_mean = global_mean(inv, (1, 2, 3), self.spatial_axis)
        inv = (inv - inv_mean).reshape(b, n)
        q = q + alpha.astype(q.dtype) * inv[:, None, :, None]

        # Token attention is global: queries stay local, keys/values are
        # all-gathered along the sharded spatial axes (gather-kv sequence
        # parallelism; key order is irrelevant — attention is
        # permutation-invariant in keys, so 2D meshes gather both axes);
        # softmax over the (complete) key axis is then local, and the
        # attention output is per-query so no slice-back is needed.
        from bayer_low_light_image_enhancement_tpu.ops.conv import gather_spatial

        k = gather_spatial(k, self.spatial_axis, axis=2)
        v = gather_spatial(v, self.spatial_axis, axis=2)

        scale = dh ** -0.5
        attn = lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        ) * scale
        attn = attn - lax.stop_gradient(jnp.max(attn, axis=-1, keepdims=True))
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = lax.dot_general(
            attn.astype(v.dtype), v,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        return Conv2d(c, 1, name="proj", **kw)(out)


class LumaMHSABlock(nn.Module):
    num_heads: int = 8
    ffn_expansion: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x, luma):
        dim = x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        x = x + LuminanceAwareMHSA(num_heads=self.num_heads, name="attn", **kw)(
            LayerNorm2d(name="norm1", param_dtype=self.param_dtype)(x).astype(self.dtype), luma
        )
        x = x + ConvFFN(hidden_features=dim * self.ffn_expansion, name="ffn", **kw)(
            LayerNorm2d(name="norm2", param_dtype=self.param_dtype)(x).astype(self.dtype)
        )
        return x


@dataclasses.dataclass(frozen=True)
class LumaMHSAConfig:
    inp_channels: int = 1
    out_channels: int = 3
    dim: int = 48
    num_heads: Tuple[int, int, int, int] = (8, 8, 8, 8)
    ffn_expansion: int = 2
    bayer_pattern: str = "rggb"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # H mesh axis for spatially-sharded inference: gather-kv token MHSA at
    # every stage, pmean'd inverse-luma bias, pmin/pmax luma normalisation.
    spatial_axis: Any = None


class LumaMHSARawFormer(nn.Module):
    """Attenblock.py:241-329 U-Net with consistent decoder widths."""

    config: LumaMHSAConfig = LumaMHSAConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        luma = bayer_luma_cfa(x, cfg.bayer_pattern,
                              spatial_axis=cfg.spatial_axis).astype(cfg.dtype)
        # Non-overlapping stride-s pools stay local (per-shard H is a
        # multiple of 16 -> 32 packed rows per shard at the deepest pool).
        lumas = {s: avg_pool(luma, s) for s in (2, 4, 8, 16)}

        def block(heads, name):
            return LumaMHSABlock(
                num_heads=heads, ffn_expansion=cfg.ffn_expansion, name=name,
                spatial_axis=cfg.spatial_axis, **kw
            )

        x = space_to_depth(x.astype(cfg.dtype), 2)
        x = Conv2d(cfg.dim, 3, name="embedding",
                   spatial_axis=cfg.spatial_axis, **kw)(x)

        x1 = block(cfg.num_heads[0], "enc1")(x, lumas[2])
        d1 = Downsample(name="down1", spatial_axis=cfg.spatial_axis, **kw)(x1)
        x2 = block(cfg.num_heads[1], "enc2")(d1, lumas[4])
        d2 = Downsample(name="down2", spatial_axis=cfg.spatial_axis, **kw)(x2)
        x3 = block(cfg.num_heads[2], "enc3")(d2, lumas[8])
        d3 = Downsample(name="down3", spatial_axis=cfg.spatial_axis, **kw)(x3)
        xb = block(cfg.num_heads[3], "bottleneck")(d3, lumas[16])

        u1 = Upsample2x(cfg.dim * 4, name="up1", spatial_axis=cfg.spatial_axis, **kw)(xb)
        p1 = Conv2d(cfg.dim * 4, 1, name="proj1", spatial_axis=cfg.spatial_axis, **kw)(jnp.concatenate([u1, x3], axis=-1))
        y = block(cfg.num_heads[2], "dec1")(p1, lumas[8])

        u2 = Upsample2x(cfg.dim * 2, name="up2", spatial_axis=cfg.spatial_axis, **kw)(y)
        p2 = Conv2d(cfg.dim * 2, 1, name="proj2", spatial_axis=cfg.spatial_axis, **kw)(jnp.concatenate([u2, x2], axis=-1))
        y = block(cfg.num_heads[1], "dec2")(p2, lumas[4])

        u3 = Upsample2x(cfg.dim, name="up3", spatial_axis=cfg.spatial_axis, **kw)(y)
        p3 = Conv2d(cfg.dim, 1, name="proj3", spatial_axis=cfg.spatial_axis, **kw)(jnp.concatenate([u3, x1], axis=-1))
        y = block(cfg.num_heads[0], "dec3")(p3, lumas[2])

        out = Conv2d(cfg.out_channels * 4, 3, name="output_conv", spatial_axis=cfg.spatial_axis, **kw)(y)
        return depth_to_space(out, 2).astype(jnp.float32)


register_model("luma_mhsa_rawformer", lambda **kw: LumaMHSARawFormer(LumaMHSAConfig(**kw)))


# ---------------------------------------------------------------------------
# rawformerwithLumma.py: simple conv U-Net with token transformers + FLCA.
# ---------------------------------------------------------------------------


class SimpleFLCA(nn.Module):
    """FLCA with 15-tap avg-pool split, additive combination
    (rawformerwithLumma.py:29-42)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, feat, y, cr, cb):
        from bayer_low_light_image_enhancement_tpu.ops.flca import resize_bilinear

        _, h, w, c = feat.shape
        sp = self.spatial_axis
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=sp)
        y = resize_bilinear(y, h, w, sp).astype(self.dtype)
        cr = resize_bilinear(cr, h, w, sp).astype(self.dtype)
        cb = resize_bilinear(cb, h, w, sp).astype(self.dtype)
        y_low, y_high = frequency_split(y, kernel_size=15, spatial_axis=sp)
        low_a = jax.nn.sigmoid(
            Conv2d(c, 3, name="low_attn", **kw)(y_low).astype(jnp.float32)
        ).astype(self.dtype)
        high_a = jnp.tanh(
            Conv2d(c, 3, name="high_attn", **kw)(y_high).astype(jnp.float32)
        ).astype(self.dtype)
        chroma_a = jax.nn.sigmoid(
            Conv2d(c, 3, name="chroma_attn", **kw)(
                jnp.concatenate([cr, cb], axis=-1)
            ).astype(jnp.float32)
        ).astype(self.dtype)
        return feat * (1.0 + low_a) + feat * high_a + feat * chroma_a


class SimpleTokenTransformer(nn.Module):
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
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name="ln2")
        tn = ln2(t.astype(jnp.float32)).astype(self.dtype)
        m = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, param_dtype=self.param_dtype, name="mlp1")(tn)
        m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(self.dtype)
        m = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp2")(m)
        return (t + m).reshape(b, h, w, c)


class ConvBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)
        x = jnp.maximum(Conv2d(self.features, 3, name="conv1", **kw)(x), 0.0)
        return jnp.maximum(Conv2d(self.features, 3, name="conv2", **kw)(x), 0.0)


def max_pool2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@dataclasses.dataclass(frozen=True)
class SimpleFLCAUNetConfig:
    in_ch: int = 4
    out_ch: int = 4
    base_ch: int = 32
    heads: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # H mesh axis for spatially-sharded inference (gather-kv token
    # attention at every stage; max pools are stride-aligned and local).
    spatial_axis: Any = None


class SimpleFLCAUNet(nn.Module):
    """rawformerwithLumma.py:75-149 (packed planes in/out, luma NOT
    normalised in this variant)."""

    config: SimpleFLCAUNetConfig = SimpleFLCAUNetConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        cv = dict(spatial_axis=cfg.spatial_axis)
        from bayer_low_light_image_enhancement_tpu.ops.luma import bayer_luma_chroma

        x = x.astype(cfg.dtype)
        y, cr, cb = bayer_luma_chroma(x.astype(jnp.float32), normalize=False)
        y, cr, cb = (t.astype(cfg.dtype) for t in (y, cr, cb))

        def enc(feats, name):
            return ConvBlock(feats, name=name, **kw, **cv)

        e1 = enc(cfg.base_ch, "enc1")(x)
        e1 = SimpleTokenTransformer(cfg.heads, name="trans1", **kw, **cv)(e1)
        e1 = SimpleFLCA(name="flca1", **kw, **cv)(e1, y, cr, cb)

        e2 = enc(cfg.base_ch * 2, "enc2")(max_pool2(e1))
        e2 = SimpleTokenTransformer(cfg.heads, name="trans2", **kw, **cv)(e2)
        e2 = SimpleFLCA(name="flca2", **kw, **cv)(e2, y, cr, cb)

        e3 = enc(cfg.base_ch * 4, "enc3")(max_pool2(e2))
        e3 = SimpleTokenTransformer(cfg.heads, name="trans3", **kw, **cv)(e3)
        e3 = SimpleFLCA(name="flca3", **kw, **cv)(e3, y, cr, cb)

        # Reference bottleneck feeds pooled e3 (base*4 channels) into a
        # transformer declared at base*8; we keep the consistent width.
        bneck = max_pool2(e3)
        bneck = SimpleTokenTransformer(cfg.heads, name="bottleneck", **kw, **cv)(bneck)
        bneck = SimpleFLCA(name="flca_bottleneck", **kw, **cv)(bneck, y, cr, cb)

        d3 = Upsample2x(cfg.base_ch * 4, name="up3", **kw)(bneck)
        d3 = enc(cfg.base_ch * 4, "dec3")(jnp.concatenate([d3, e3], axis=-1))
        d2 = Upsample2x(cfg.base_ch * 2, name="up2", **kw)(d3)
        d2 = enc(cfg.base_ch * 2, "dec2")(jnp.concatenate([d2, e2], axis=-1))
        d1 = Upsample2x(cfg.base_ch, name="up1", **kw)(d2)
        d1 = enc(cfg.base_ch, "dec1")(jnp.concatenate([d1, e1], axis=-1))

        return Conv2d(cfg.out_ch, 1, name="final", **kw)(d1).astype(jnp.float32)


register_model("simple_flca_unet", lambda **kw: SimpleFLCAUNet(SimpleFLCAUNetConfig(**kw)), raw_domain=True)
