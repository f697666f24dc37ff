"""Serving surface tests: Predictor padding/shape contract and AOT
artifact round-trips (serving/{predictor,export}.py)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.models.rawformer import (
    RawFormer,
    RawFormerConfig,
)
from bayer_low_light_image_enhancement_tpu.serving import (
    Predictor,
    export_artifact,
    load_artifact,
)

RNG = np.random.default_rng(11)


def small_model():
    return RawFormer(RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2)))


@pytest.fixture(scope="module")
def model_and_vars():
    model = small_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    return model, variables


class TestPredictor:
    def test_matches_direct_apply(self, model_and_vars):
        model, variables = model_and_vars
        pred = Predictor(model, variables, use_fused=False)
        x = RNG.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        expected = np.clip(np.asarray(model.apply(variables, jnp.asarray(x))), 0, 1)
        np.testing.assert_allclose(pred(x), expected, rtol=1e-6, atol=1e-6)

    def test_odd_size_padding_and_rank_handling(self, model_and_vars):
        model, variables = model_and_vars
        pred = Predictor(model, variables, use_fused=False)
        # [H,W] input, size not divisible by 16 -> padded, cropped back.
        x2d = RNG.uniform(0, 1, (37, 45)).astype(np.float32)
        y = pred(x2d)
        assert y.shape == (37, 45, 3)
        assert np.all((y >= 0) & (y <= 1))
        # [H,W,1]
        y3 = pred(x2d[..., None])
        np.testing.assert_allclose(y3, y)
        # padded-region independence: the valid region matches a manual
        # pad-to-48 run.
        xp = np.pad(x2d, ((0, 11), (0, 3)))[None, ..., None]
        ref = np.clip(np.asarray(model.apply(variables, jnp.asarray(xp))), 0, 1)
        np.testing.assert_allclose(y, ref[0, :37, :45], rtol=1e-6, atol=1e-6)

    def test_rejects_bad_shape(self, model_and_vars):
        model, variables = model_and_vars
        pred = Predictor(model, variables, use_fused=False)
        with pytest.raises(ValueError):
            pred(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))

    def test_from_orbax(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        from bayer_low_light_image_enhancement_tpu.train.checkpoint import (
            CheckpointManager,
        )
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            TrainConfig,
            Trainer,
            TrainState,
        )

        state = TrainState.create(variables, Trainer(model, TrainConfig()).tx)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(3, state)
        mgr.wait()
        pred = Predictor.from_orbax(model, str(tmp_path / "ck"), use_fused=False)
        x = RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
        expected = np.clip(np.asarray(model.apply(variables, jnp.asarray(x))), 0, 1)
        np.testing.assert_allclose(pred(x), expected, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
class TestArtifact:
    def test_export_load_round_trip(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        path = str(tmp_path / "m.bllx")
        meta = export_artifact(model, variables, path, batch=1, height=32, width=32)
        assert os.path.exists(path)
        assert meta["input_shape"] == [1, 32, 32, 1]

        fn, meta2 = load_artifact(path)
        assert meta2 == meta
        x = RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
        expected = np.clip(np.asarray(model.apply(variables, jnp.asarray(x))), 0, 1)
        np.testing.assert_allclose(fn(x), expected, rtol=1e-6, atol=1e-6)

    def test_artifact_rejects_wrong_shape(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        path = str(tmp_path / "m.bllx")
        export_artifact(model, variables, path, batch=1, height=32, width=32)
        fn, _ = load_artifact(path)
        with pytest.raises(ValueError):
            fn(RNG.uniform(0, 1, (1, 48, 48, 1)).astype(np.float32))


@pytest.mark.slow
class TestExportCli:
    def test_cli_random_init_export(self, tmp_path, capsys):
        from bayer_low_light_image_enhancement_tpu.cli import export_cli

        out = str(tmp_path / "cli.bllx")
        export_cli.main(
            ["--model_size", "S", "--height", "32", "--width", "32", "--out", out]
        )
        fn, meta = load_artifact(out)
        assert meta["model"] == "rawformer_s"
        y = fn(np.zeros((1, 32, 32, 1), np.float32))
        assert y.shape == (1, 32, 32, 3)
