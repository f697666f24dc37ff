"""Host-side RAW (ARW) decode gateway.

LibRaw has no TPU equivalent; decode stays on the host (SURVEY.md §2.1
"TPU-native mapping"). Access goes through this module so that:

* environments with ``rawpy`` decode ARW containers directly
  (``raw_image_visible`` for short exposures, full ``postprocess`` for GT,
  matching ``/root/reference/RawFomer_WFB_FFAB/load_dataset.py:18-31``);
* environments without it (like CI) can use a **decoded cache**: ``.npz``
  files holding the uint16 mosaic / uint16 RGB that a one-time
  ``cache_decode`` pass produced on a machine with rawpy. The cache is also
  the fast path for training — the reference re-reads 30 GB into RAM every
  run (``load_dataset.py:99``); a decoded cache turns that into memory-mapped
  reads feeding the async loader.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:  # pragma: no cover - depends on environment
    import rawpy  # type: ignore

    HAVE_RAWPY = True
except ImportError:  # pragma: no cover
    rawpy = None
    HAVE_RAWPY = False


def decode_short_arw(path: str) -> np.ndarray:
    """Short-exposure ARW -> uint16 Bayer mosaic [H, W]."""
    if not HAVE_RAWPY:
        raise RuntimeError(
            "rawpy is not available; decode ARW files once with cache_decode() "
            "on a machine with rawpy, then point the dataset at the cache dir"
        )
    with rawpy.imread(path) as raw:
        return raw.raw_image_visible.copy()


def decode_long_arw(path: str) -> np.ndarray:
    """Long-exposure ARW -> uint16 RGB [H, W, 3] via LibRaw's full ISP
    (camera WB, no auto-bright, 16-bit — ``load_dataset.py:27``)."""
    if not HAVE_RAWPY:
        raise RuntimeError("rawpy is not available (see decode_short_arw)")
    with rawpy.imread(path) as raw:
        return raw.postprocess(
            use_camera_wb=True, half_size=False, no_auto_bright=True, output_bps=16
        ).copy()


def _cache_path(cache_dir: str, path: str) -> str:
    return os.path.join(cache_dir, os.path.basename(path) + ".npz")


def cache_decode(short_path: str, long_path: str, cache_dir: str) -> None:
    """Decode one (short, long) ARW pair into the npz cache."""
    os.makedirs(cache_dir, exist_ok=True)
    np.savez_compressed(
        _cache_path(cache_dir, short_path), mosaic=decode_short_arw(short_path)
    )
    np.savez_compressed(_cache_path(cache_dir, long_path), rgb=decode_long_arw(long_path))


def load_short(path: str, cache_dir: Optional[str] = None) -> np.ndarray:
    if cache_dir is not None:
        cp = _cache_path(cache_dir, path)
        if os.path.exists(cp):
            return np.load(cp)["mosaic"]
    return decode_short_arw(path)


def load_long(path: str, cache_dir: Optional[str] = None) -> np.ndarray:
    if cache_dir is not None:
        cp = _cache_path(cache_dir, path)
        if os.path.exists(cp):
            return np.load(cp)["rgb"]
    return decode_long_arw(path)
