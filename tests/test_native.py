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


class TestCompactTransfer:
    def test_compact_assemble_parity(self):
        """u16 raw codes + u16 GT from the compact path match the float
        path's sources exactly (crop/flip are passthroughs)."""
        mosaics, gts = _make_data()
        gts16 = [
            np.ascontiguousarray(np.round(g * 65535.0).astype(np.uint16))
            for g in gts
        ]
        crops = np.array([[0, 0], [2, 4], [10, 20]], np.int32)
        flips = np.array([[0, 0], [1, 0], [1, 1]], np.uint8)
        raw16, gt16 = native.assemble_batch_compact(
            mosaics, gts16, crops, flips, patch=32
        )
        assert raw16.dtype == np.uint16 and gt16.dtype == np.uint16
        ratios = np.array([100.0, 300.0, 1.0], np.float32)
        raw_f, _ = native.assemble_batch(
            mosaics, gts, crops, flips, ratios, patch=32, device_normalize=True
        )
        np.testing.assert_array_equal(raw16, raw_f)
        for i in range(3):
            exp = gts16[i][crops[i, 0]:crops[i, 0] + 32, crops[i, 1]:crops[i, 1] + 32]
            if flips[i, 0]:
                exp = exp[:, ::-1]
            if flips[i, 1]:
                exp = exp[::-1]
            np.testing.assert_array_equal(gt16[i], exp)

    def test_decode_batch_matches_host_path(self):
        """Device decode of a compact batch == the host-normalised fp32
        batch (same expressions, fp32)."""
        import jax.numpy as jnp

        from bayer_low_light_image_enhancement_tpu.train.trainer import decode_batch

        mosaics, gts = _make_data(n=2)
        gts16 = [
            np.ascontiguousarray(np.round(g * 65535.0).astype(np.uint16))
            for g in gts
        ]
        # Make the float GTs the exact u16 decodes so both paths see the
        # same data (as SID preload does).
        gts = [g.astype(np.float32) / 65535.0 for g in gts16]
        crops = np.array([[2, 4], [6, 8]], np.int32)
        flips = np.array([[1, 0], [0, 1]], np.uint8)
        ratios = np.array([100.0, 250.0], np.float32)

        raw_f, gt_f = native.assemble_batch(mosaics, gts, crops, flips, ratios, patch=16)
        raw16, gt16b = native.assemble_batch_compact(mosaics, gts16, crops, flips, patch=16)
        inp, gt = decode_batch((jnp.asarray(raw16), jnp.asarray(ratios), jnp.asarray(gt16b)))
        np.testing.assert_allclose(np.asarray(inp), raw_f, rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gt), gt_f, rtol=1e-6, atol=1e-7)

    def test_train_step_equivalence(self):
        """A Trainer step on the compact 3-tuple == the step on the fp32
        pair (same synthetic draws; fp32 model)."""
        import jax
        import jax.numpy as jnp

        from bayer_low_light_image_enhancement_tpu.data.synthetic import (
            SyntheticBayerDataset,
        )
        from bayer_low_light_image_enhancement_tpu.models.rawformer import (
            RawFormer,
            RawFormerConfig,
        )
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            Trainer,
            TrainConfig,
        )

        ds = SyntheticBayerDataset(
            num_images=4, full_size=(48, 48), patch_size=32, training=True
        )
        s_f = native.sampler_for_dataset(ds, seed=0, compact=False)
        s_c = native.sampler_for_dataset(ds, seed=0, compact=True)
        assert s_f is not None and s_c is not None
        batch_f = s_f.sample_batch([0, 1], epoch=0)
        batch_c = s_c.sample_batch([0, 1], epoch=0)
        assert len(batch_c) == 3 and batch_c[0].dtype == np.uint16

        model = RawFormer(RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2)))
        cfg = TrainConfig(base_lr=1e-3, total_epochs=2, steps_per_epoch=1)
        tr = Trainer(model, cfg)
        state = tr.init(jax.random.PRNGKey(0), jnp.asarray(batch_f[0][:1]))
        st_f, loss_f = tr.train_step(state, tuple(jnp.asarray(x) for x in batch_f))
        state2 = tr.init(jax.random.PRNGKey(0), jnp.asarray(batch_f[0][:1]))
        st_c, loss_c = tr.train_step(state2, tuple(jnp.asarray(x) for x in batch_c))
        # Synthetic fp32 GTs are quantised to u16 in compact mode, so allow
        # quantisation-scale differences (<=1/131070 per pixel).
        assert abs(float(loss_f) - float(loss_c)) < 1e-4
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(st_f.params)[0],
            jax.tree_util.tree_flatten_with_path(st_c.params)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4,
                err_msg="/".join(str(getattr(k, "key", k)) for k in p),
            )
