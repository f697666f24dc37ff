"""Host-side augmentation with reference-matching semantics.

Reference (``/root/reference/RawFomer_WFB_FFAB/load_dataset.py:62-75``):
even-aligned random crop to ``patch_size`` (offsets are forced even so the
crop stays on the Bayer grid), horizontal flip with p~0.5, vertical flip with
p~0.2. Flips of the *mosaic* are done before packing, exactly like the
reference (note: flipping a RGGB mosaic changes the effective CFA phase; the
reference accepts this as augmentation noise and so do we).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def random_even_crop(
    rng: np.random.Generator,
    raw: np.ndarray,
    gt: np.ndarray,
    patch_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """raw: [H, W] mosaic; gt: [H, W, 3] at the same resolution."""
    h, w = raw.shape[:2]
    i = int(rng.integers(0, (h - patch_size - 2) // 2 + 1)) * 2
    j = int(rng.integers(0, (w - patch_size - 2) // 2 + 1)) * 2
    return (
        raw[i : i + patch_size, j : j + patch_size],
        gt[i : i + patch_size, j : j + patch_size],
    )


def random_flips(
    rng: np.random.Generator,
    raw: np.ndarray,
    gt: np.ndarray,
    p_lr: float = 0.5,
    p_ud: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    if rng.random() < p_lr:
        raw = raw[:, ::-1]
        gt = gt[:, ::-1]
    if rng.random() < p_ud:
        raw = raw[::-1]
        gt = gt[::-1]
    return np.ascontiguousarray(raw), np.ascontiguousarray(gt)
