"""Training-stack tests: losses, schedule, metrics, end-to-end steps."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.models.rawformer import RawFormer, RawFormerConfig
from bayer_low_light_image_enhancement_tpu.train.losses import (
    charbonnier_loss,
    l1_loss,
    rgb_to_lab,
    sid_color_loss,
)
from bayer_low_light_image_enhancement_tpu.train.metrics import psnr, ssim
from bayer_low_light_image_enhancement_tpu.train.schedule import warmup_cosine_schedule
from bayer_low_light_image_enhancement_tpu.train.trainer import TrainConfig, Trainer

RNG = np.random.default_rng(7)


class TestLosses:
    def test_charbonnier_golden(self):
        # mean(sqrt(diff^2 + 1e-6)) — reference train.py:16-25.
        p = jnp.asarray([[0.5, 0.2]])
        t = jnp.asarray([[0.4, 0.2]])
        expected = np.mean(np.sqrt(np.array([0.1, 0.0]) ** 2 + 1e-6))
        np.testing.assert_allclose(float(charbonnier_loss(p, t)), expected, rtol=1e-6)

    def test_l1(self):
        p = jnp.asarray([1.0, 2.0])
        t = jnp.asarray([0.0, 4.0])
        assert float(l1_loss(p, t)) == pytest.approx(1.5)

    def test_lab_white_point(self):
        # RGB (1,1,1) -> L=100, a=b=0.
        # The classic 0.4124... matrix rows don't sum exactly to D65, so a/b
        # are ~5e-3 rather than exactly 0.
        lab = np.asarray(rgb_to_lab(jnp.ones((1, 1, 3))))
        np.testing.assert_allclose(lab[0, 0], [100.0, 0.0, 0.0], atol=0.02)

    def test_sid_color_loss_zero_for_identical(self):
        x = jnp.asarray(RNG.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32))
        assert float(sid_color_loss(x, x)) == pytest.approx(0.0, abs=1e-5)

    def test_sid_color_loss_parity_vs_reference(self):
        """vs /root/reference/TrueColorRawFormer.py:459-510 SIDColorLoss."""
        import importlib.util
        from conftest import REFERENCE_ROOT, add_reference_to_path

        add_reference_to_path()
        import torch

        spec = importlib.util.spec_from_file_location(
            "ref_truecolor", f"{REFERENCE_ROOT}/TrueColorRawFormer.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        pred = RNG.uniform(0.02, 0.98, (2, 8, 8, 3)).astype(np.float32)
        target = RNG.uniform(0.02, 0.98, (2, 8, 8, 3)).astype(np.float32)
        ref = mod.SIDColorLoss()
        with torch.no_grad():
            expected = float(
                ref(
                    torch.from_numpy(pred.transpose(0, 3, 1, 2)),
                    torch.from_numpy(target.transpose(0, 3, 1, 2)),
                )
            )
        ours = float(sid_color_loss(jnp.asarray(pred), jnp.asarray(target)))
        assert ours == pytest.approx(expected, rel=2e-3)


class TestSchedule:
    def test_reference_semantics(self):
        sched = warmup_cosine_schedule(1e-4, 20, 3000, 1e-5, steps_per_epoch=1)
        assert float(sched(0)) == 0.0  # reference trains epoch 0 at lr 0
        np.testing.assert_allclose(float(sched(10)), 1e-4 * 10 / 20, rtol=1e-6)
        np.testing.assert_allclose(float(sched(20)), 1e-4, rtol=1e-6)
        # Just past warmup: cosine at t=1 of period 3000.
        exp = 1e-5 + (1e-4 - 1e-5) * 0.5 * (1 + np.cos(np.pi * 1 / 3000))
        np.testing.assert_allclose(float(sched(21)), exp, rtol=1e-6)
        # End of schedule reaches eta_min.
        np.testing.assert_allclose(float(sched(3020)), 1e-5, rtol=1e-5)

    def test_staircase_per_epoch(self):
        sched = warmup_cosine_schedule(1e-4, 20, 3000, 1e-5, steps_per_epoch=10)
        assert float(sched(5)) == float(sched(9))
        assert float(sched(9)) != float(sched(10))


class TestMetrics:
    def test_psnr_golden(self):
        p = np.zeros((8, 8, 3), np.float32)
        t = np.full((8, 8, 3), 10.0, np.float32)
        expected = 10 * np.log10(255.0**2 / 100.0)
        np.testing.assert_allclose(float(psnr(jnp.asarray(p), jnp.asarray(t))), expected, rtol=1e-6)

    def test_ssim_identical_is_one(self):
        x = jnp.asarray(RNG.uniform(0, 255, (16, 16, 3)).astype(np.float32))
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-6)

    def test_ssim_matches_scipy_reference(self):
        """Independent oracle: skimage's algorithm re-derived with scipy."""
        from scipy.ndimage import uniform_filter

        x = RNG.uniform(0, 255, (24, 24)).astype(np.float64)
        y = np.clip(x + RNG.normal(0, 20, x.shape), 0, 255).astype(np.float64)

        win, R = 7, 255.0
        NP = win * win
        cov_norm = NP / (NP - 1)
        f = lambda im: uniform_filter(im, size=win)
        ux, uy = f(x), f(y)
        vx = cov_norm * (f(x * x) - ux * ux)
        vy = cov_norm * (f(y * y) - uy * uy)
        vxy = cov_norm * (f(x * y) - ux * uy)
        C1, C2 = (0.01 * R) ** 2, (0.03 * R) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
        pad = (win - 1) // 2
        expected = S[pad:-pad, pad:-pad].mean()

        ours = float(ssim(jnp.asarray(x[..., None]), jnp.asarray(y[..., None])))
        np.testing.assert_allclose(ours, expected, rtol=1e-5)


class TestTrainer:
    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2))
        model = RawFormer(cfg)
        trainer = Trainer(model, TrainConfig(base_lr=1e-3, warmup_epochs=1, steps_per_epoch=1))
        x = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
        y = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        state = trainer.init(jax.random.PRNGKey(0), x)
        return trainer, state, x, y

    @pytest.mark.slow
    def test_loss_decreases(self, tiny):
        trainer, state, x, y = tiny
        # train_step donates its input state; work on a copy so the
        # class-scoped fixture state stays alive for other tests.
        state = jax.tree.map(jnp.copy, state)
        losses = []
        for _ in range(8):
            state, loss = trainer.train_step(state, (x, y))
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    @pytest.mark.slow
    def test_bf16_train_step_compiles(self):
        """Regression: bf16 backward used to fail on mixed-dtype conv
        transpose (preferred_element_type f32 with bf16 operands)."""
        cfg = RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2), dtype=jnp.bfloat16)
        model = RawFormer(cfg)
        trainer = Trainer(model, TrainConfig(base_lr=1e-3, warmup_epochs=1))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        y = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        state = trainer.init(jax.random.PRNGKey(0), x)
        state, loss = trainer.train_step(state, (x, y))
        assert np.isfinite(float(loss))

    def test_eval_step_psnr_shape(self, tiny):
        trainer, state, x, y = tiny
        pred, per_image = trainer.eval_step(state.variables(), (x, y))
        assert pred.shape == y.shape
        assert per_image.shape == (2,)
        assert np.all(np.isfinite(np.asarray(per_image)))

    @pytest.mark.slow
    def test_nan_guard_skips_whole_batch(self, tiny):
        """Reference batch-skip semantics (RawFomer_WFB_FFAB/train.py:165-182):
        a NaN batch must leave params AND the optimizer state (moments, Adam
        step count) exactly unchanged — not zero individual grad leaves."""
        trainer, state, x, y = tiny
        state = jax.tree.map(jnp.copy, state)
        # Advance past the lr=0 epoch-0 warmup point so a good batch would
        # visibly move the params.
        state, _ = trainer.train_step(state, (x, y))
        bad_x = x.at[0, 0, 0, 0].set(jnp.nan)
        before = jax.tree.map(np.asarray, (state.params, state.opt_state))
        new_state, loss = trainer.train_step(
            jax.tree.map(jnp.copy, state), (bad_x, y)
        )
        assert not np.isfinite(float(loss))  # loss still reported from the batch
        after = jax.tree.map(np.asarray, (new_state.params, new_state.opt_state))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)
        # ...and a good batch through the same compiled step still updates.
        upd_state, loss2 = trainer.train_step(new_state, (x, y))
        assert np.isfinite(float(loss2))
        changed = any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(before[0]), jax.tree.leaves(upd_state.params)
            )
        )
        assert changed


class TestLoaderPipeline:
    def test_loader_batches(self):
        from bayer_low_light_image_enhancement_tpu.data import Loader, SyntheticBayerDataset

        ds = SyntheticBayerDataset(num_images=6, full_size=(64, 96), patch_size=32)
        loader = Loader(ds, batch_size=2, shuffle=True, seed=3)
        batches = list(loader)
        assert len(batches) == 3
        inp, gt, ratio = batches[0]
        assert inp.shape == (2, 32, 32, 1)
        assert gt.shape == (2, 32, 32, 3)
        assert ratio.shape == (2,)

    def test_loader_deterministic_per_epoch(self):
        from bayer_low_light_image_enhancement_tpu.data import Loader, SyntheticBayerDataset

        ds = SyntheticBayerDataset(num_images=4, full_size=(64, 64), patch_size=32)
        l1 = Loader(ds, batch_size=2, seed=5)
        l2 = Loader(ds, batch_size=2, seed=5)
        b1 = next(iter(l1))
        b2 = next(iter(l2))
        np.testing.assert_array_equal(b1[0], b2[0])
