"""Data-pipeline tests: filename semantics, augmentation, checkpoint I/O."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.data.augment import (
    random_even_crop,
    random_flips,
)
from bayer_low_light_image_enhancement_tpu.data.mcr import mcr_amplification
from bayer_low_light_image_enhancement_tpu.data.sid import (
    parse_sid_list,
    sid_ratio_from_filename,
)

RNG = np.random.default_rng(41)


class TestSIDSemantics:
    def test_ratio_from_filename(self):
        # load_dataset.py:81-84: char [-7] of the GT path decides 300 vs 100.
        assert sid_ratio_from_filename("Sony/long/00001_00_30s.ARW") == 300.0
        assert sid_ratio_from_filename("Sony/long/00001_00_10s.ARW") == 100.0

    def test_parse_list(self, tmp_path):
        p = tmp_path / "list.txt"
        p.write_text(
            "./Sony/short/00001_00_0.1s.ARW ./Sony/long/00001_00_10s.ARW ISO200 F9\n"
            "./Sony/short/00002_00_0.1s.ARW ./Sony/long/00002_00_30s.ARW ISO100 F9\n"
        )
        shorts, longs = parse_sid_list(str(p), root="/data")
        assert shorts == [
            "/data/Sony/short/00001_00_0.1s.ARW",
            "/data/Sony/short/00002_00_0.1s.ARW",
        ]
        assert longs[1].endswith("00002_00_30s.ARW")

    def test_reference_split_lists_parse(self):
        # The actual split lists shipped with the reference.
        path = "/root/reference/RawFomer_WFB_FFAB/Sony_train_list.txt"
        if not os.path.exists(path):
            pytest.skip("reference lists not present")
        shorts, longs = parse_sid_list(path)
        assert len(shorts) == len(longs) == 1865  # SURVEY §2.1
        assert all(s.endswith(".ARW") for s in shorts[:5])


class TestMCRSemantics:
    def test_amplification_rule(self):
        # load_dataset.py:141-151: img_num<500 -> gt_expo 12287 else 1023;
        # img_expo = hex of [-8:-4].
        low = "Mono/C00123_48mp_0x8_0x00ff.png"  # num 123, expo 0x00ff=255
        assert mcr_amplification(low) == pytest.approx(12287 / 255)
        high = "Mono/C00700_48mp_0x8_0x03ff.png"  # num 700, expo 1023
        assert mcr_amplification(high) == pytest.approx(1023 / 1023)


class TestAugment:
    def test_crop_is_even_aligned(self):
        rng = np.random.default_rng(0)
        raw = RNG.integers(0, 1000, (64, 80), np.uint16)
        gt = RNG.uniform(0, 1, (64, 80, 3)).astype(np.float32)
        for _ in range(20):
            r, g = random_even_crop(rng, raw, gt, 32)
            assert r.shape == (32, 32) and g.shape == (32, 32, 3)
        # Verify crops land on even offsets: mark odd rows/cols.
        marked = np.zeros((64, 80), np.uint16)
        marked[0::2, 0::2] = 7  # value only at even-even sites
        for _ in range(20):
            r, _ = random_even_crop(rng, marked, gt, 32)
            assert r[0, 0] == 7  # top-left of crop is an even-even site

    def test_flip_probabilities(self):
        rng = np.random.default_rng(3)
        raw = np.arange(16, dtype=np.uint16).reshape(4, 4)
        gt = RNG.uniform(0, 1, (4, 4, 3)).astype(np.float32)
        n_lr = n_ud = 0
        trials = 500
        for _ in range(trials):
            r, _ = random_flips(rng, raw, gt)
            if r[0, 0] != raw[0, 0] and r[0, -1] == raw[0, 0]:
                n_lr += 1
        assert 0.3 < n_lr / trials < 0.8  # ~p(lr flip alone or with ud)


class TestCheckpointRoundtrip:
    @pytest.mark.slow
    def test_save_restore_train_state(self, tmp_path):
        from bayer_low_light_image_enhancement_tpu.models.rawformer import (
            RawFormer,
            RawFormerConfig,
        )
        from bayer_low_light_image_enhancement_tpu.train.checkpoint import (
            BestTracker,
            CheckpointManager,
        )
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            TrainConfig,
            Trainer,
            TrainState,
        )

        model = RawFormer(RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2)))
        trainer = Trainer(model, TrainConfig(base_lr=1e-3, warmup_epochs=1))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        y = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        state = trainer.init(jax.random.PRNGKey(0), x)
        state, _ = trainer.train_step(state, (x, y))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(1, state)
        mgr.wait()

        template = trainer.init(jax.random.PRNGKey(1), x)
        restored, step = mgr.restore(template)
        assert step == 1
        # Optimizer moments restore too (the reference drops them).
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
        mgr.close()

    def test_best_tracker(self):
        from bayer_low_light_image_enhancement_tpu.train.checkpoint import BestTracker

        t = BestTracker()
        assert t.update(0, 20.0)
        assert not t.update(1, 19.0)
        assert t.update(2, 21.0)
        assert t.best_epoch == 2


class TestMetricsLogger:
    def test_epoch_line_format(self, tmp_path):
        from bayer_low_light_image_enhancement_tpu.utils.logging import MetricsLogger

        log = tmp_path / "log.txt"
        m = MetricsLogger(str(log))
        m.log_epoch(5, 3000, 12.3, 1.234, 28.5, 29.0, 3)
        m.close()
        text = log.read_text()
        # Reference format (train.py:175).
        assert "Epoch 5/3000 | Time: 12.30s | Loss: 1.2340 | Avg PSNR: 28.5000" in text
        assert "Best PSNR: 29.0000 (Epoch 3)" in text

    def test_csv(self, tmp_path):
        from bayer_low_light_image_enhancement_tpu.utils.logging import MetricsLogger

        path = tmp_path / "m.csv"
        MetricsLogger().write_metrics_csv(str(path), [30.1234, 31.5], [0.91, 0.92])
        lines = path.read_text().strip().split("\n")
        assert lines[0] == "30.1234,0.9100"


def test_mcr_device_normalize_parity(tmp_path):
    """Compact MCR sampling (uint8 codes + amp) decodes to the host fp32
    path exactly via ops.bayer.normalize_mcr."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.data.mcr import MCRDataset
    from bayer_low_light_image_enhancement_tpu.ops.bayer import normalize_mcr

    rng_np = np.random.default_rng(3)
    raw = rng_np.integers(0, 256, (32, 32), dtype=np.uint8)
    rgb = rng_np.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    # Filename fields drive the exposure parse: img_num 007, expo 0x00ff.
    name = "C00007_48mp_0x8_0x00ff.png"
    (tmp_path / "raw").mkdir()
    (tmp_path / "rgb").mkdir()
    rp, gp = str(tmp_path / "raw" / name), str(tmp_path / "rgb" / name)
    imageio.imwrite(rp, raw)
    imageio.imwrite(gp, rgb)

    host = MCRDataset([rp], [gp], training=False)
    comp = MCRDataset([rp], [gp], training=False, device_normalize=True)
    inp_f, gt_f, amp_f = host.sample(0, np.random.default_rng(0))
    inp8, gt_c, amp_c = comp.sample(0, np.random.default_rng(0))
    assert inp8.dtype == np.uint8 and amp_f == amp_c
    dec = np.asarray(normalize_mcr(jnp.asarray(inp8), jnp.float32(amp_c)))
    np.testing.assert_allclose(dec, inp_f, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(gt_f, gt_c)
