"""Frequency-aware Luma-Chroma Attention (FLCA) and SE channel attention.

Reference: ``/root/reference/FrequencyawareLumaChromaAttentionRAWFormer.py:103-162``.
A Haar DWT of the luma guidance yields a low band and a high-frequency
magnitude map; these plus the chroma planes are bilinearly resized to the
feature resolution and turned into three spatial attention maps (sigmoid /
tanh / sigmoid). Features are modulated ``feat * (1 + a*low + b*high + g*chr)``
then passed through an SE (squeeze-excitation) channel gate.

The guidance tensors are computed once per forward at packed resolution and
resized per stage — loop-invariant broadcast side-channels that XLA folds
(SURVEY.md §3.4).

Global reductions (SE average pool) take ``spatial_axis`` for H-sharded
inference.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bayer_low_light_image_enhancement_tpu.models.common import Conv2d
from bayer_low_light_image_enhancement_tpu.ops.conv import global_mean
from bayer_low_light_image_enhancement_tpu.ops.dwt import haar_dwt_fb

Dtype = Any


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] 2-tap bilinear interpolation matrix, half-pixel centers,
    edge-clamped — exactly torch F.interpolate(mode='bilinear',
    align_corners=False), which does NOT antialias on downsample (unlike
    jax.image.resize). Dense matmul form keeps the resize on the MXU."""
    m = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        i0c = min(max(i0, 0), in_size - 1)
        i1c = min(max(i0 + 1, 0), in_size - 1)
        m[o, i0c] += 1.0 - frac
        m[o, i1c] += frac
    return m


def resize_bilinear(
    x: jnp.ndarray, h: int, w: int, spatial_axis: Optional[str] = None
) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (= torch align_corners=False,
    no antialias). x: [B, H, W, C].

    With ``spatial_axis`` (inside shard_map; a single H mesh-axis name or an
    ``(h_axis, w_axis)`` tuple for 2D spatial meshes), ``h``/``w``/``x`` are
    per-shard sizes and the result is exactly the local slice of the global
    resize: upsampled boundary rows/cols sample pixels owned by the
    neighbouring shard, and edge clamping is a *global*-edge property, so the
    sharded axis is all-gathered (guidance tensors here are 1-2 channels —
    cheap) and each shard applies its own row/col block of the global resize
    matrix.
    """
    from bayer_low_light_image_enhancement_tpu.ops.conv import spatial_axes

    b, hi, wi, c = x.shape
    h_ax, w_ax = spatial_axes(spatial_axis)

    def axis_matrix(in_local: int, out_local: int, ax: Optional[str]):
        """Per-shard [out_local, in_global] block of the global resize."""
        if ax is None:
            return jnp.asarray(_bilinear_matrix(in_local, out_local)), False
        n = jax.lax.psum(1, ax)
        mg = jnp.asarray(_bilinear_matrix(in_local * n, out_local * n))
        s = jax.lax.axis_index(ax)
        return jax.lax.dynamic_slice(
            mg, (s * out_local, 0), (out_local, in_local * n)
        ), True

    if (hi, wi) == (h, w) and h_ax is None and w_ax is None:
        return x
    wh, gather_h = axis_matrix(hi, h, h_ax)
    if gather_h:
        x = jax.lax.all_gather(x, h_ax, axis=1, tiled=True)
    y = jnp.einsum("oh,bhwc->bowc", wh.astype(x.dtype), x)
    ww, gather_w = axis_matrix(wi, w, w_ax)
    if gather_w:
        y = jax.lax.all_gather(y, w_ax, axis=2, tiled=True)
    return jnp.einsum("pw,bowc->bopc", ww.astype(y.dtype), y)


class SqueezeExcite(nn.Module):
    """SE gate: global avg pool -> 1x1 -> ReLU -> 1x1 -> sigmoid."""

    reduction: int = 8
    min_hidden: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        hidden = max(self.min_hidden, c // self.reduction)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pooled = global_mean(x, (1, 2), self.spatial_axis)
        g = Conv2d(hidden, 1, name="fc1", **kw)(pooled)
        g = jnp.maximum(g, 0.0)
        g = Conv2d(c, 1, name="fc2", **kw)(g)
        return jax.nn.sigmoid(g.astype(jnp.float32)).astype(x.dtype)


class FLCA(nn.Module):
    """Frequency-aware luma-chroma attention block."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None
    eps: float = 1e-8

    @nn.compact
    def __call__(
        self,
        feat: jnp.ndarray,
        y: jnp.ndarray,
        cr: jnp.ndarray,
        cb: jnp.ndarray,
    ) -> jnp.ndarray:
        _, hf, wf, c = feat.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=self.spatial_axis)

        ll, highs = haar_dwt_fb(y.astype(jnp.float32))
        high_mag = jnp.sqrt(jnp.sum(jnp.square(highs), axis=-1) + self.eps)

        sp = self.spatial_axis
        y_low = resize_bilinear(ll, hf, wf, sp).astype(self.dtype)
        y_high = resize_bilinear(high_mag, hf, wf, sp).astype(self.dtype)
        cr_r = resize_bilinear(cr, hf, wf, sp).astype(self.dtype)
        cb_r = resize_bilinear(cb, hf, wf, sp).astype(self.dtype)

        a_low = jax.nn.sigmoid(
            Conv2d(c, 3, use_bias=False, name="low_attn", **kw)(y_low).astype(jnp.float32)
        ).astype(self.dtype)
        a_high = jnp.tanh(
            Conv2d(c, 3, use_bias=False, name="high_attn", **kw)(y_high).astype(jnp.float32)
        ).astype(self.dtype)
        a_chr = jax.nn.sigmoid(
            Conv2d(c, 3, use_bias=False, name="chroma_attn", **kw)(
                jnp.concatenate([cr_r, cb_r], axis=-1)
            ).astype(jnp.float32)
        ).astype(self.dtype)

        alpha = self.param("alpha", nn.initializers.ones, (), self.param_dtype)
        beta = self.param("beta", nn.initializers.ones, (), self.param_dtype)
        gamma = self.param("gamma", nn.initializers.ones, (), self.param_dtype)

        spatial = 1.0 + alpha * a_low + beta * a_high + gamma * a_chr
        x = feat * spatial.astype(feat.dtype)
        se = SqueezeExcite(
            name="se", dtype=self.dtype, param_dtype=self.param_dtype,
            spatial_axis=self.spatial_axis,
        )(x)
        return x * se


class FLCAPyramid(nn.Module):
    """Multi-level FLCA with gated, magnitude-limited residuals.

    Reference: ``MultiLvlFrequencyawareLumaChromaAttentionRAWFormer.py:86-183``.
    A ``levels``-deep Haar pyramid of the luma guidance; per level, attention
    maps gated by sigmoids of pooled band statistics produce a residual
    bounded by ``tanh(.) * max_residual_scale``; then a gated chroma residual
    and an SE channel gate.
    """

    levels: int = 2
    max_residual_scale: float = 0.2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None
    eps: float = 1e-8

    @nn.compact
    def __call__(self, feat, y, cr, cb, return_ll_anchor: bool = False):
        _, hf, wf, c = feat.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=self.spatial_axis)

        # Haar pyramid of y (fp32).
        lows, highs = [], []
        cur = y.astype(jnp.float32)
        for _ in range(self.levels):
            ll, hb = haar_dwt_fb(cur)
            lows.append(ll)
            highs.append(jnp.sqrt(jnp.sum(jnp.square(hb), axis=-1) + self.eps))
            cur = ll

        res_proj_1 = Conv2d(c, 1, name="res_proj_0", **kw)
        res_proj_2 = Conv2d(c, 1, name="res_proj_1", **kw)

        def res_proj(t):
            return res_proj_2(jnp.maximum(res_proj_1(t), 0.0))

        x = feat
        for l in range(self.levels):
            y_low = resize_bilinear(lows[l], hf, wf, self.spatial_axis).astype(self.dtype)
            y_high = resize_bilinear(highs[l], hf, wf, self.spatial_axis).astype(self.dtype)
            a_low = jax.nn.sigmoid(
                Conv2d(c, 3, use_bias=False, name=f"low_attn_{l}", **kw)(y_low).astype(jnp.float32)
            ).astype(self.dtype)
            a_high = jnp.tanh(
                Conv2d(c, 3, use_bias=False, name=f"high_attn_{l}", **kw)(y_high).astype(jnp.float32)
            ).astype(self.dtype)

            low_g = global_mean(y_low, (1, 2), self.spatial_axis)
            high_g = global_mean(y_high, (1, 2), self.spatial_axis)
            gates = jax.nn.sigmoid(
                Conv2d(2, 1, name=f"freq_gate_{l}", **kw)(
                    jnp.concatenate([low_g, high_g], axis=-1)
                ).astype(jnp.float32)
            ).astype(self.dtype)
            alpha_l, beta_l = gates[..., 0:1], gates[..., 1:2]

            spatial = alpha_l * a_low + beta_l * a_high
            raw_res = res_proj(x * spatial)
            x = x + jnp.tanh(raw_res.astype(jnp.float32)).astype(x.dtype) * self.max_residual_scale

        cr_r = resize_bilinear(cr.astype(jnp.float32), hf, wf, self.spatial_axis).astype(self.dtype)
        cb_r = resize_bilinear(cb.astype(jnp.float32), hf, wf, self.spatial_axis).astype(self.dtype)
        a_chr = jax.nn.sigmoid(
            Conv2d(c, 3, use_bias=False, name="chroma_attn", **kw)(
                jnp.concatenate([cr_r, cb_r], axis=-1)
            ).astype(jnp.float32)
        ).astype(self.dtype)
        chr_mag = jnp.sqrt(cr_r.astype(jnp.float32) ** 2 + cb_r.astype(jnp.float32) ** 2 + self.eps)
        gamma = jax.nn.sigmoid(
            Conv2d(1, 1, name="chroma_gate", **kw)(
                global_mean(chr_mag.astype(self.dtype), (1, 2), self.spatial_axis)
            ).astype(jnp.float32)
        ).astype(self.dtype)
        raw_res_c = res_proj(x * (gamma * a_chr))
        x = x + jnp.tanh(raw_res_c.astype(jnp.float32)).astype(x.dtype) * self.max_residual_scale

        se = SqueezeExcite(
            name="se", dtype=self.dtype, param_dtype=self.param_dtype,
            spatial_axis=self.spatial_axis,
        )(x)
        x = x * se
        if return_ll_anchor:
            return x, lows[-1]
        return x
