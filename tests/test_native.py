"""Native C++ batch-assembly engine tests (exact parity vs numpy path)."""

import numpy as np
import pytest

from bayer_low_light_image_enhancement_tpu.data import native
from bayer_low_light_image_enhancement_tpu.data.sid import BLACK_LEVEL, WHITE_LEVEL

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain for native engine"
)

RNG = np.random.default_rng(37)


def _make_data(n=3, h=64, w=96):
    mosaics = [RNG.integers(0, 40000, (h, w), dtype=np.uint16) for _ in range(n)]
    gts = [RNG.uniform(0, 1, (h, w, 3)).astype(np.float32) for _ in range(n)]
    return mosaics, gts


def _numpy_reference(mosaic, gt, ci, cj, flr, fud, ratio, patch):
    m = mosaic[ci : ci + patch, cj : cj + patch]
    g = gt[ci : ci + patch, cj : cj + patch]
    if flr:
        m, g = m[:, ::-1], g[:, ::-1]
    if fud:
        m, g = m[::-1], g[::-1]
    mf = np.clip(m.astype(np.float32), BLACK_LEVEL, WHITE_LEVEL)
    mf = (mf - BLACK_LEVEL) / (WHITE_LEVEL - BLACK_LEVEL + 1e-6) * ratio
    return mf[..., None], np.ascontiguousarray(g)


class TestAssembleBatch:
    def test_exact_parity_with_numpy(self):
        mosaics, gts = _make_data()
        crops = np.array([[0, 0], [2, 4], [10, 20]], np.int32)
        flips = np.array([[0, 0], [1, 0], [1, 1]], np.uint8)
        ratios = np.array([100.0, 300.0, 1.0], np.float32)
        raw, gt = native.assemble_batch(mosaics, gts, crops, flips, ratios, patch=32)
        for i in range(3):
            exp_raw, exp_gt = _numpy_reference(
                mosaics[i], gts[i], crops[i, 0], crops[i, 1],
                flips[i, 0], flips[i, 1], ratios[i], 32,
            )
            np.testing.assert_allclose(raw[i], exp_raw, rtol=1e-6, atol=1e-6)
            np.testing.assert_array_equal(gt[i], exp_gt)

    def test_uint16_passthrough_mode(self):
        mosaics, gts = _make_data(n=2)
        crops = np.zeros((2, 2), np.int32)
        flips = np.zeros((2, 2), np.uint8)
        ratios = np.array([100.0, 100.0], np.float32)
        raw, gt = native.assemble_batch(
            mosaics, gts, crops, flips, ratios, patch=16, device_normalize=True
        )
        assert raw.dtype == np.uint16
        np.testing.assert_array_equal(raw[0, ..., 0], mosaics[0][:16, :16])

    def test_out_of_bounds_crop_rejected(self):
        mosaics, gts = _make_data(n=1, h=32, w=32)
        crops = np.array([[20, 0]], np.int32)  # 20 + 32 > 32
        flips = np.zeros((1, 2), np.uint8)
        with pytest.raises(RuntimeError):
            native.assemble_batch(
                mosaics, gts, crops, flips, np.ones(1, np.float32), patch=32
            )

    def test_gt16_to_float(self):
        gt16 = RNG.integers(0, 65536, (8, 8, 3), dtype=np.uint16)
        out = native.gt16_to_float(gt16)
        np.testing.assert_allclose(out, gt16.astype(np.float32) / 65535.0, rtol=1e-6)


class TestNativeBatchSampler:
    def test_deterministic_batches(self):
        mosaics, gts = _make_data(n=4)
        s1 = native.NativeBatchSampler(mosaics, gts, [100.0] * 4, patch_size=32, seed=5)
        s2 = native.NativeBatchSampler(mosaics, gts, [100.0] * 4, patch_size=32, seed=5)
        r1, g1 = s1.sample_batch([0, 2], epoch=1)
        r2, g2 = s2.sample_batch([0, 2], epoch=1)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(g1, g2)
        r3, _ = s1.sample_batch([0, 2], epoch=2)
        assert not np.array_equal(r1, r3)
