"""Training losses.

* Charbonnier (``/root/reference/train.py:16-25``, eps=1e-3) — the canonical
  RawFormer loss.
* L1 — what the WFB training script actually optimises
  (``/root/reference/RawFomer_WFB_FFAB/train.py:124``).
* SID color loss (``/root/reference/TrueColorRawFormer.py:459-510``):
  0.7*MSE + 0.2*L1(Lab) + 0.1*angular, used by the TrueColor ISP variants.

All losses reduce in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _f32(x):
    return x.astype(jnp.float32)


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    diff = _f32(pred) - _f32(target)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(_f32(pred) - _f32(target)))


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = _f32(pred) - _f32(target)
    return jnp.mean(d * d)


# --- SID color loss (TrueColor variants) -----------------------------------

_D65 = (0.95047, 1.0, 1.08883)
# sRGB (linear) -> XYZ matrix, rows X/Y/Z.
_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=jnp.float32,
)


def rgb_to_lab(rgb: jnp.ndarray, srgb_linearize: bool = False) -> jnp.ndarray:
    """RGB [..., 3] in [0,1] -> CIELAB (D65), matching the reference's
    conversion (``TrueColorRawFormer.py:465-487``)."""
    rgb = jnp.clip(_f32(rgb), 0.0, 1.0)
    if srgb_linearize:
        rgb = jnp.where(
            rgb > 0.04045, jnp.power((rgb + 0.055) / 1.055, 2.4), rgb / 12.92
        )
    xyz = rgb @ _RGB2XYZ.T
    xyz = xyz / jnp.array(_D65, dtype=jnp.float32)
    eps = 216.0 / 24389.0
    kappa = 24389.0 / 27.0
    f = jnp.where(xyz > eps, jnp.cbrt(jnp.maximum(xyz, 1e-8)), (kappa * xyz + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def angular_color_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Mean (1 - cos) angle between RGB vectors per pixel."""
    p, t = _f32(pred), _f32(target)
    dot = jnp.sum(p * t, axis=-1)
    denom = jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1) + eps
    return jnp.mean(1.0 - dot / denom)


def sid_color_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    w_mse: float = 0.7,
    w_lab: float = 0.2,
    w_ang: float = 0.1,
) -> jnp.ndarray:
    lab_l1 = jnp.mean(jnp.abs(rgb_to_lab(pred) - rgb_to_lab(target)))
    return (
        w_mse * mse_loss(pred, target)
        + w_lab * lab_l1
        + w_ang * angular_color_loss(pred, target)
    )


_LOSSES = {
    "charbonnier": charbonnier_loss,
    "l1": l1_loss,
    "mse": mse_loss,
    "sid_color": sid_color_loss,
}


def get_loss(name: str) -> Callable:
    try:
        return _LOSSES[name]
    except KeyError:
        raise KeyError(f"unknown loss {name!r}; available: {sorted(_LOSSES)}") from None
