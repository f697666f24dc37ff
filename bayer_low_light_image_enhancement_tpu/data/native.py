"""ctypes bridge to the native C++ batch-assembly engine (csrc/).

Builds ``libbayer_pipeline.so`` on first use with g++ (cached beside the
source; no pybind11 needed — plain C ABI). Falls back cleanly when no
compiler is available: ``native_available()`` gates the fast path and the
pure-numpy route stays the reference implementation.

The split of labour mirrors the reference semantics exactly: Python draws the
augmentation randomness (crop offsets, flips — ``load_dataset.py:62-75``),
C++ does the parallel crop/flip/normalise/gather into the batch buffer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_SRC, "libbayer_pipeline.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    src = os.path.join(_SRC, "bayer_pipeline.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, src, "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ invocation failed: {e}"
    if res.returncode != 0:
        return f"g++ failed: {res.stderr[:2000]}"
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_SRC, "bayer_pipeline.cpp"))
        ):
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bp_assemble_batch.restype = ctypes.c_int
        lib.bp_assemble_batch_u16gt.restype = ctypes.c_int
        lib.bp_gt_to_float.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def assemble_batch(
    mosaics: Sequence[np.ndarray],
    gts: Sequence[np.ndarray],
    crops: np.ndarray,      # [B, 2] even (ci, cj)
    flips: np.ndarray,      # [B, 2] bool (lr, ud)
    ratios: np.ndarray,     # [B]
    patch: int,
    device_normalize: bool = False,
    num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble (raw, gt) batch via the native engine.

    mosaics[i]: uint16 [h, w]; gts[i]: float32 [h, w, 3] in [0, 1].
    Returns raw [B, p, p, 1] (float32 normalised, or uint16 when
    ``device_normalize``) and gt [B, p, p, 3] float32.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    batch = len(mosaics)
    assert len(gts) == batch == crops.shape[0] == flips.shape[0] == ratios.shape[0]

    mos_ptrs = (ctypes.POINTER(ctypes.c_uint16) * batch)()
    gt_ptrs = (ctypes.POINTER(ctypes.c_float) * batch)()
    hs = (ctypes.c_int * batch)()
    ws = (ctypes.c_int * batch)()
    for i, (m, g) in enumerate(zip(mosaics, gts)):
        assert m.dtype == np.uint16 and m.flags.c_contiguous
        assert g.dtype == np.float32 and g.flags.c_contiguous
        assert m.shape[:2] == g.shape[:2] and g.shape[2] == 3
        mos_ptrs[i] = m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        gt_ptrs[i] = g.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        hs[i] = m.shape[0]
        ws[i] = m.shape[1]

    ci = np.ascontiguousarray(crops[:, 0], np.int32)
    cj = np.ascontiguousarray(crops[:, 1], np.int32)
    flr = np.ascontiguousarray(flips[:, 0], np.uint8)
    fud = np.ascontiguousarray(flips[:, 1], np.uint8)
    rat = np.ascontiguousarray(ratios, np.float32)

    out_gt = np.empty((batch, patch, patch, 3), np.float32)
    if device_normalize:
        out_raw = np.empty((batch, patch, patch, 1), np.uint16)
        raw_f32 = None
        raw_u16 = out_raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    else:
        out_raw = np.empty((batch, patch, patch, 1), np.float32)
        raw_f32 = out_raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        raw_u16 = None

    rc = lib.bp_assemble_batch(
        mos_ptrs, gt_ptrs, hs, ws,
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cj.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        fud.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(batch), ctypes.c_int(patch),
        raw_f32, raw_u16,
        out_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(num_threads),
    )
    if rc != 0:
        raise RuntimeError(f"bp_assemble_batch failed with code {rc}")
    return out_raw, out_gt


def assemble_batch_compact(
    mosaics: Sequence[np.ndarray],
    gts16: Sequence[np.ndarray],
    crops: np.ndarray,
    flips: np.ndarray,
    patch: int,
    num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Compact-transfer assembly: raw mosaic codes AND GT stay uint16, so the
    H2D copy is 16-bit end-to-end (5x smaller than the fp32 batch).
    Normalisation and the /65535 GT decode run on device inside the jitted
    train step (train/trainer.py decode path) — numerically the same fp32
    expressions the float path evaluates on host.

    mosaics[i]: uint16 [h, w]; gts16[i]: uint16 [h, w, 3].
    Returns (raw_u16 [B, p, p, 1], gt_u16 [B, p, p, 3]).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pipeline unavailable: {_build_error}")
    batch = len(mosaics)
    assert len(gts16) == batch == crops.shape[0] == flips.shape[0]

    mos_ptrs = (ctypes.POINTER(ctypes.c_uint16) * batch)()
    gt_ptrs = (ctypes.POINTER(ctypes.c_uint16) * batch)()
    hs = (ctypes.c_int * batch)()
    ws = (ctypes.c_int * batch)()
    for i, (m, g) in enumerate(zip(mosaics, gts16)):
        assert m.dtype == np.uint16 and m.flags.c_contiguous
        assert g.dtype == np.uint16 and g.flags.c_contiguous
        assert m.shape[:2] == g.shape[:2] and g.shape[2] == 3
        mos_ptrs[i] = m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        gt_ptrs[i] = g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        hs[i] = m.shape[0]
        ws[i] = m.shape[1]

    ci = np.ascontiguousarray(crops[:, 0], np.int32)
    cj = np.ascontiguousarray(crops[:, 1], np.int32)
    flr = np.ascontiguousarray(flips[:, 0], np.uint8)
    fud = np.ascontiguousarray(flips[:, 1], np.uint8)
    rat = np.zeros((batch,), np.float32)  # unused in the compact path

    out_raw = np.empty((batch, patch, patch, 1), np.uint16)
    out_gt = np.empty((batch, patch, patch, 3), np.uint16)
    rc = lib.bp_assemble_batch_u16gt(
        mos_ptrs, gt_ptrs, hs, ws,
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cj.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        fud.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(batch), ctypes.c_int(patch),
        out_raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int(num_threads),
    )
    if rc != 0:
        raise RuntimeError(f"bp_assemble_batch_u16gt failed with code {rc}")
    return out_raw, out_gt


def gt16_to_float(gt16: np.ndarray, num_threads: int = 8) -> np.ndarray:
    """uint16 GT -> float32 [0,1] (parallel /65535)."""
    lib = _load()
    if lib is None:
        return np.clip(gt16, 0, 65535).astype(np.float32) / 65535.0
    out = np.empty(gt16.shape, np.float32)
    g = np.ascontiguousarray(gt16, np.uint16)
    lib.bp_gt_to_float(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(g.size),
        ctypes.c_int(num_threads),
    )
    return out


def sampler_for_dataset(
    dataset, seed: int = 0, device_normalize: bool = False, num_threads: int = 8,
    compact: bool = False,
) -> Optional["NativeBatchSampler"]:
    """Adapt an in-RAM training dataset to a :class:`NativeBatchSampler`.

    Supports any dataset holding its decoded frames in RAM:

    * ``SIDDataset(preload=True)`` — uint16 mosaics in ``_shorts``, uint16
      GTs in ``_longs`` (converted once, in parallel, via the C++
      ``gt16_to_float``), per-pair ratios from the GT filename
      (``/root/reference/RawFomer_WFB_FFAB/load_dataset.py:84-88``).
    * ``SyntheticBayerDataset`` — ``mosaics``/``gts`` attributes, scalar ratio.

    Returns None when the native engine can't be built, the dataset isn't a
    training split, or its frames aren't resident in RAM.
    """
    if not native_available() or not getattr(dataset, "training", False):
        return None
    patch = getattr(dataset, "patch_size", None)
    if not patch:
        return None
    if getattr(dataset, "_shorts", None) is not None:  # SIDDataset, preloaded
        from bayer_low_light_image_enhancement_tpu.data.sid import (
            sid_ratio_from_filename,
        )

        mosaics = dataset._shorts
        if compact:
            # GTs stay the uint16 the decoder produced: /65535 happens on
            # device, so the upfront fp32 conversion (3x RAM) is skipped too.
            gts = [np.ascontiguousarray(g) for g in dataset._longs]
        else:
            gts = [gt16_to_float(g, num_threads) for g in dataset._longs]
        ratios = [sid_ratio_from_filename(p) for p in dataset.long_paths]
    elif getattr(dataset, "mosaics", None) is not None and getattr(dataset, "gts", None) is not None:
        mosaics, gts = dataset.mosaics, dataset.gts
        if not (mosaics and mosaics[0].dtype == np.uint16 and gts[0].dtype == np.float32):
            return None
        if compact:
            # Synthetic GTs are generated fp32; quantise once to u16 (the
            # SID GTs are u16 at the source, where this is exact).
            gts = [
                np.ascontiguousarray(
                    np.round(np.clip(g, 0.0, 1.0) * 65535.0).astype(np.uint16)
                )
                for g in gts
            ]
        ratios = [float(getattr(dataset, "ratio", 1.0))] * len(mosaics)
    else:
        return None
    if any(m.shape[0] < patch + 2 or m.shape[1] < patch + 2 for m in mosaics):
        return None  # sampler's crop draw needs 2 rows/cols of slack
    return NativeBatchSampler(
        mosaics, gts, ratios, patch, seed=seed,
        device_normalize=device_normalize, num_threads=num_threads,
        compact=compact,
    )


class NativeLoader:
    """``Loader``-compatible iterator fed by the C++ batch engine.

    Same epoch/shuffle discipline as ``pipeline.Loader`` (seeded permutation
    per epoch, drop_last); batch assembly happens in native threads while a
    single producer thread keeps a small queue ahead of the consumer —
    functionally the reference's 16-worker DataLoader
    (``/root/reference/train.py:99``) with the per-item Python cost removed.
    """

    def __init__(self, dataset, sampler: "NativeBatchSampler", batch_size: int,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 4):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        import queue

        epoch = self._epoch
        self._epoch += 1
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        batches = [order[i : i + self.batch_size] for i in range(0, end, self.batch_size)]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    q.put(self.sampler.sample_batch([int(i) for i in idxs], epoch))
            finally:
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        def gen():
            try:
                while True:
                    item = q.get()
                    if item is None:
                        return
                    yield item
            finally:
                stop.set()
                while thread.is_alive():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        thread.join(timeout=0.1)

        return gen()


class NativeBatchSampler:
    """Batch-level sampler over an in-RAM SID-style dataset using the native
    engine; a drop-in producer for training loops.

    dataset protocol: ``mosaics`` (list of uint16 [h,w]), ``gts_f32`` (list of
    float32 [h,w,3]), ``ratios`` (list of float), ``patch_size``.
    """

    def __init__(self, mosaics, gts, ratios, patch_size: int, seed: int = 0,
                 device_normalize: bool = False, num_threads: int = 8,
                 compact: bool = False):
        self.mosaics = mosaics
        self.gts = gts
        self.ratios = np.asarray(ratios, np.float32)
        self.patch = patch_size
        self.seed = seed
        self.device_normalize = device_normalize
        self.num_threads = num_threads
        self.compact = compact

    def sample_batch(self, indices: Sequence[int], epoch: int):
        rng = np.random.default_rng((self.seed, epoch, tuple(int(i) for i in indices)))
        batch = len(indices)
        crops = np.empty((batch, 2), np.int32)
        flips = np.empty((batch, 2), np.uint8)
        for s, idx in enumerate(indices):
            h, w = self.mosaics[idx].shape
            crops[s, 0] = int(rng.integers(0, (h - self.patch - 2) // 2 + 1)) * 2
            crops[s, 1] = int(rng.integers(0, (w - self.patch - 2) // 2 + 1)) * 2
            flips[s, 0] = rng.random() < 0.5
            flips[s, 1] = rng.random() < 0.2
        if self.compact:
            raw16, gt16 = assemble_batch_compact(
                [self.mosaics[i] for i in indices],
                [self.gts[i] for i in indices],
                crops, flips, self.patch, self.num_threads,
            )
            # 3-tuple batch: the per-sample ratio rides along so the device
            # decode can apply it (train/trainer.py compact-batch path).
            return raw16, self.ratios[list(indices)], gt16
        return assemble_batch(
            [self.mosaics[i] for i in indices],
            [self.gts[i] for i in indices],
            crops, flips, self.ratios[list(indices)],
            self.patch, self.device_normalize, self.num_threads,
        )
