"""Bayer-domain luma/chroma extraction.

Reference semantics:
  * ``BayerLumaChroma`` (``/root/reference/FrequencyawareLumaChromaAttentionRAWFormer.py:79-97``
    and ``/root/reference/Lumma.py:4-45``): BT.601 luma from RGGB planes with
    G = avg(G1, G2), per-image max-normalisation of y, chroma cr = r - y,
    cb = b - y.
  * ``rawformerwithLumma.py:6-20`` uses the same without the normalisation
    (``normalize=False``).

Plane order convention here is the packed (R, G1, G2, B) NHWC layout produced
by ``ops.bayer.pack_bayer`` / ``space_to_depth`` on an RGGB mosaic.

Under spatial sharding the per-image max is a global reduction -> ``pmax``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

BT601 = (0.299, 0.587, 0.114)
BT709 = (0.2126, 0.7152, 0.0722)


def bayer_luma_chroma(
    planes: jnp.ndarray,
    normalize: bool = True,
    weights: Tuple[float, float, float] = BT601,
    eps: float = 1e-6,
    spatial_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """planes: [B, H, W, 4] (R, G1, G2, B) -> (y, cr, cb) each [B, H, W, 1]."""
    r = planes[..., 0:1]
    g = 0.5 * (planes[..., 1:2] + planes[..., 2:3])
    b = planes[..., 3:4]
    wr, wg, wb = weights
    y = wr * r + wg * g + wb * b
    if normalize:
        from bayer_low_light_image_enhancement_tpu.ops.conv import reduce_axis_names

        m = jnp.max(y, axis=(1, 2, 3), keepdims=True)
        names = reduce_axis_names(spatial_axis, (1, 2))
        if names:
            m = lax.pmax(m, names)
        y = y / jnp.maximum(m, eps)
    cr = r - y
    cb = b - y
    return y, cr, cb
