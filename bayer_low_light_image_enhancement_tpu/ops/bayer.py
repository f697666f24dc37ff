"""Bayer mosaic handling: CFA-aware packing and SID/MCR normalisation.

Reference semantics:
  * pack-to-4: ``/root/reference/correctdataloader.py:58-72`` packs the RGGB
    mosaic into planes [R, G1, B, G2] via strided slicing; the CFA-aware
    loader (``/root/reference/dataloader.py:24-42``) maps the four Bayer
    patterns onto a canonical (R, G1, G2, B) order.
  * SID normalisation: ``/root/reference/RawFomer_WFB_FFAB/load_dataset.py:88-90``
    clips the uint14 mosaic to [512, 16383], subtracts the 512 black level,
    divides by (16383-512) and multiplies by the exposure-amplification
    ratio.

These run on-device (the fused Pallas version lives in
``kernels/bayer_pack.py``); the host side only hands over the raw uint16
mosaic.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.ops.shuffle import space_to_depth

# For each CFA pattern: position (i, j) within the 2x2 tile of (R, G1, G2, B),
# where G1 is the green sharing a row with R. space_to_depth on [B,H,W,1]
# yields plane order [(0,0), (0,1), (1,0), (1,1)].
CFA_PATTERNS: Dict[str, Tuple[int, int, int, int]] = {
    # plane index (into s2d output) of    R  G1  G2  B
    "RGGB": (0, 1, 2, 3),
    "BGGR": (3, 2, 1, 0),
    "GRBG": (1, 0, 3, 2),
    "GBRG": (2, 3, 0, 1),
}


def pack_bayer(x: jnp.ndarray, pattern: str = "RGGB") -> jnp.ndarray:
    """[B, H, W, 1] mosaic -> [B, H/2, W/2, 4] planes in (R, G1, G2, B) order."""
    planes = space_to_depth(x, 2)  # [(0,0),(0,1),(1,0),(1,1)]
    idx = CFA_PATTERNS[pattern.upper()]
    return planes[..., jnp.array(idx)]


def normalize_sid(
    mosaic: jnp.ndarray,
    ratio: jnp.ndarray,
    black_level: float = 512.0,
    white_level: float = 16383.0,
) -> jnp.ndarray:
    """uint16 mosaic -> amplified float in [0, ratio].

    ``ratio`` broadcasts per-image: shape [] or [B, 1, 1, 1].
    """
    x = jnp.clip(mosaic.astype(jnp.float32), black_level, white_level)
    x = (x - black_level) / (white_level - black_level + 1e-6)
    return x * ratio


def normalize_mcr(raw: jnp.ndarray, amp: jnp.ndarray) -> jnp.ndarray:
    """uint8 PNG-encoded RAW -> amplified float (reference
    ``load_dataset.py:151``: ``raw / 255 * amp``)."""
    return raw.astype(jnp.float32) / 255.0 * amp
