"""Image-quality metrics: PSNR and SSIM, in JAX.

The reference relies on scikit-image (``/root/reference/test.py:3-4``);
skimage defaults are reproduced exactly so numbers are comparable:

* PSNR on uint8 arrays with data_range 255.
* SSIM: 7x7 uniform window, K1=0.01, K2=0.03, sample (N/(N-1)) covariance
  normalisation, mean over the valid (border-cropped) region, averaged over
  channels for multichannel input — matching ``skimage.metrics.
  structural_similarity(channel_axis=-1)`` as invoked at ``test.py:124``.

Implemented with depthwise convs so the metric itself runs on TPU and can be
jitted into the eval step (the reference round-trips 12-megapixel frames to
the host for this).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """PSNR over the whole array (skimage peak_signal_noise_ratio)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mse = jnp.mean((p - t) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Valid-mode uniform filter over H, W of [H, W, C] or [B, H, W, C]."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    c = x.shape[-1]
    kernel = jnp.full((win, win, 1, 1), 1.0 / (win * win), dtype=jnp.float32)
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    y = lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return y[0] if squeeze else y


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM (skimage structural_similarity defaults, channel_axis=-1).

    pred/target: [H, W, C] or [B, H, W, C]; returns scalar (or [B]).
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    batched = p.ndim == 4

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)

    ux = _uniform_filter(p, win_size)
    uy = _uniform_filter(t, win_size)
    uxx = _uniform_filter(p * p, win_size)
    uyy = _uniform_filter(t * t, win_size)
    uxy = _uniform_filter(p * t, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    # VALID conv already cropped the (win-1)//2 border skimage crops.
    if batched:
        return jnp.mean(s, axis=(1, 2, 3))
    return jnp.mean(s)


def _to_uint8_vals(x01: jnp.ndarray) -> jnp.ndarray:
    # Reference quantisation is a truncating cast: (x*255).astype(np.uint8)
    # (``/root/reference/train.py:159-160``), so floor, not round.
    return jnp.floor(jnp.clip(x01, 0.0, 1.0) * 255.0).clip(0, 255)


def psnr_uint8(pred01: jnp.ndarray, target01: jnp.ndarray) -> jnp.ndarray:
    """Reference eval protocol (``train.py:159-162``): clamp to [0,1],
    quantise to uint8, PSNR at data_range 255."""
    return psnr(_to_uint8_vals(pred01), _to_uint8_vals(target01), 255.0)


def ssim_uint8(pred01: jnp.ndarray, target01: jnp.ndarray) -> jnp.ndarray:
    return ssim(_to_uint8_vals(pred01), _to_uint8_vals(target01), 255.0)
