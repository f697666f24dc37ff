"""Learned-ISP components for the TrueColor model family.

Reference: ``/root/reference/TrueColorRawFormer.py:79-257`` and the
softplus/bounded variants in ``/root/reference/BayerTORGBColorMultiLvl.py:72-177``.

* ``BayerProcessor``: learnable white-balance gains, conv demosaic
  refinement, learnable 3x4 color matrix, BT.709 luma (per-image max
  normalised), learned tanh chroma extractor. The ``positive_gains`` flag
  switches to the BayerTORGB variant's softplus-positive gains + residual
  refinement.
* ``ColorCorrection``: learnable gamma, 1x1 color MLP, per-channel shared
  tone curve. ``bounded=True`` gives the BayerTORGB [0.8, 1.2]
  multiplicative tone variant.
* ``EnhancedFLCA``: FLCA with a 5-channel (Y, Cr, Cb, R, G) color-guidance
  attention (``TrueColorRawFormer.py:191-257``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.models.common import Conv2d
from bayer_low_light_image_enhancement_tpu.ops.conv import global_max
from bayer_low_light_image_enhancement_tpu.ops.dwt import haar_dwt_fb
from bayer_low_light_image_enhancement_tpu.ops.flca import SqueezeExcite, resize_bilinear
from bayer_low_light_image_enhancement_tpu.ops.luma import BT709

Dtype = Any


class BayerProcessor(nn.Module):
    """Learned Bayer->guidance front end (TrueColorRawFormer.py:79-142).

    ``positive_gains=True`` switches to the BayerTORGB variant
    (``BayerTORGBColorMultiLvl.py:72-134``), whose pipeline differs beyond
    the gains: WB init (1.8, 1, 1, 1.6) with softplus+1e-6, linear demosaic
    straight from the WB planes (no pre-matrix conv), 3x3 color matrix,
    then a residual GELU demosaic-refine on the 3-channel linear RGB whose
    output becomes the rgb_guide (y/chroma come from the pre-refine RGB).
    """

    positive_gains: bool = False  # BayerTORGBColorMultiLvl.py:72-134 variant
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, planes: jnp.ndarray):
        """planes: [B, H, W, 4] (R, G1, G2, B) -> (y, cr, cb, rgb_guide)."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)

        wb_init = (
            (lambda k, s, d: jnp.asarray([1.8, 1.0, 1.0, 1.6], d))
            if self.positive_gains
            else nn.initializers.ones
        )
        wb_raw = self.param("wb_gains", wb_init, (4,), self.param_dtype)
        gains = (
            jax.nn.softplus(wb_raw) + 1e-6 if self.positive_gains else wb_raw
        )
        wb = planes * gains.astype(planes.dtype)

        if self.positive_gains:
            # BayerTORGB: linear demosaic directly from the WB planes.
            refined = wb
        else:
            refined = Conv2d(32, 3, name="demosaic_refine_0", **kw)(wb)
            refined = jnp.maximum(refined, 0.0)
            refined = Conv2d(4, 3, name="demosaic_refine_1", **kw)(refined)
            refined = jax.nn.softplus(refined.astype(jnp.float32)).astype(refined.dtype)

        r = refined[..., 0:1]
        g = 0.5 * (refined[..., 1:2] + refined[..., 2:3])
        b = refined[..., 3:4]
        rgb = jnp.concatenate([r, g, b], axis=-1)

        # 3x4 color matrix: 3x3 transform + bias column, identity init.
        cm = self.param(
            "color_matrix",
            lambda key, shape, dtype: jnp.eye(3, 4, dtype=dtype),
            (3, 4),
            self.param_dtype,
        )
        rgb_linear = jnp.einsum("ij,bhwj->bhwi", cm[:, :3].astype(rgb.dtype), rgb)
        rgb_linear = rgb_linear + cm[:, 3].astype(rgb.dtype)

        wts = jnp.asarray(BT709, dtype=jnp.float32)
        y = jnp.sum(rgb_linear.astype(jnp.float32) * wts, axis=-1, keepdims=True)
        # Per-image max is global over the frame -> pmax under H-sharding.
        y = y / jnp.maximum(global_max(y, (1, 2, 3), self.spatial_axis), self.eps)
        y = y.astype(self.dtype)

        chroma_in = jnp.concatenate([r, g, b, y], axis=-1)
        ch = Conv2d(16, 3, name="chroma_extractor_0", **kw)(chroma_in)
        ch = jnp.maximum(ch, 0.0)
        ch = Conv2d(2, 3, name="chroma_extractor_1", **kw)(ch)
        ch = jnp.tanh(ch.astype(jnp.float32)).astype(self.dtype)
        cr, cb = ch[..., 0:1], ch[..., 1:2]

        if self.positive_gains:
            # Residual GELU refine on linear RGB; the refined map is the
            # guidance (y/cr/cb stay on the pre-refine RGB).
            d = Conv2d(32, 3, name="demosaic_refine_0", **kw)(rgb_linear)
            d = jax.nn.gelu(d.astype(jnp.float32), approximate=False).astype(d.dtype)
            d = Conv2d(3, 3, name="demosaic_refine_1", **kw)(d)
            rgb_guide = rgb_linear + d
            return y, cr, cb, rgb_guide
        return y, cr, cb, rgb_linear


class ColorCorrection(nn.Module):
    """Camera-aware output correction (TrueColorRawFormer.py:148-185)."""

    bounded: bool = False  # BayerTORGBColorMultiLvl.py:139-177 variant
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c = x.shape[-1]
        gamma = self.param(
            "gamma", lambda k, s, d: jnp.full(s, 2.2, d), (), self.param_dtype
        )
        if self.bounded:
            # BayerTORGB keeps gamma positive (BayerTORGBColorMultiLvl.py:162).
            gamma = jax.nn.softplus(gamma) + 1e-6
        xg = jnp.power(jnp.clip(x.astype(jnp.float32), 0.0, 1.0), 1.0 / gamma)
        xg = xg.astype(self.dtype)

        xt = Conv2d(64, 1, name="color_transform_0", **kw)(xg)
        xt = jnp.maximum(xt, 0.0)
        xt = Conv2d(c, 1, name="color_transform_1", **kw)(xt)

        # Shared per-channel tone curve: fold channels into batch so one
        # 1->32->1 MLP applies to each channel independently (reference loops
        # channels through the same module).
        b, h, w, _ = xt.shape
        per_ch = xt.transpose(0, 3, 1, 2).reshape(b * c, h, w, 1)
        t = Conv2d(32, 1, name="tone_curve_0", **kw)(per_ch)
        t = jnp.maximum(t, 0.0)
        t = Conv2d(1, 1, name="tone_curve_1", **kw)(t)
        t = jax.nn.sigmoid(t.astype(jnp.float32)).astype(self.dtype)
        tone = t.reshape(b, c, h, w).transpose(0, 2, 3, 1)

        if self.bounded:
            # Bounded multiplicative adjustment in [0.8, 1.2].
            out = xt * (0.8 + 0.4 * tone)
        else:
            out = tone
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0).astype(self.dtype)


class EnhancedFLCA(nn.Module):
    """FLCA with 5-channel color guidance (TrueColorRawFormer.py:191-257).

    ``levels > 1`` gives the BayerTORGB pyramid variant
    (``BayerTORGBColorMultiLvl.py:182-285``): an N-level Haar pyramid of y
    (y_low = deepest LL, y_high = mean of the per-level HF magnitudes),
    tanh-bounded frequency attention, and a tanh-bounded 0.2-scaled residual
    projection before the SE gate.
    """

    levels: int = 1
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, feat, y, cr, cb, rgb_guide):
        _, hf, wf, c = feat.shape
        sp = self.spatial_axis
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=sp)
        pyramid = self.levels > 1

        cur = y.astype(jnp.float32)
        high_mags = []
        for _ in range(max(1, self.levels)):
            cur, highs = haar_dwt_fb(cur)
            high_mags.append(jnp.sqrt(jnp.sum(jnp.square(highs), axis=-1) + self.eps))
        ll = cur

        y_r = resize_bilinear(y.astype(jnp.float32), hf, wf, sp).astype(self.dtype)
        y_low = resize_bilinear(ll, hf, wf, sp).astype(self.dtype)
        hm_r = [resize_bilinear(h, hf, wf, sp) for h in high_mags]
        y_high = (sum(hm_r) / len(hm_r)).astype(self.dtype)
        cr_r = resize_bilinear(cr.astype(jnp.float32), hf, wf, sp).astype(self.dtype)
        cb_r = resize_bilinear(cb.astype(jnp.float32), hf, wf, sp).astype(self.dtype)
        rgb_r = resize_bilinear(rgb_guide.astype(jnp.float32), hf, wf, sp).astype(self.dtype)

        guidance = jnp.concatenate(
            [y_r, cr_r, cb_r, rgb_r[..., 0:1], rgb_r[..., 1:2]], axis=-1
        )
        color_attn = jax.nn.sigmoid(
            Conv2d(c, 3, name="color_attention", **kw)(guidance).astype(jnp.float32)
        ).astype(self.dtype)

        low = jax.nn.sigmoid(
            Conv2d(c, 3, name="low_attn", **kw)(y_low).astype(jnp.float32)
        )
        high = jnp.tanh(
            Conv2d(c, 3, name="high_attn", **kw)(y_high).astype(jnp.float32)
        )
        freq_attn = (jnp.tanh(low + high) if pyramid else low + high).astype(self.dtype)

        x = feat * (1.0 + color_attn + freq_attn)
        if pyramid:
            res = Conv2d(c, 1, name="res_proj_0", **kw)(x)
            res = jnp.maximum(res, 0.0)
            res = Conv2d(c, 1, name="res_proj_1", **kw)(res)
            x = x + (jnp.tanh(res.astype(jnp.float32)) * 0.2).astype(self.dtype)
        se = SqueezeExcite(
            name="se", dtype=self.dtype, param_dtype=self.param_dtype,
            spatial_axis=self.spatial_axis,
        )(x)
        return x * se
