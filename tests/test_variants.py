"""Smoke + behaviour tests for the remaining model-zoo variants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(17)


def _init_and_run(model, x):
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert np.all(np.isfinite(np.asarray(out)))
    return variables, out


class TestTrueColor:
    @pytest.mark.parametrize("bayertorgb", [False, True])
    def test_forward(self, bayertorgb):
        from bayer_low_light_image_enhancement_tpu.models.truecolor import (
            TrueColorConfig,
            TrueColorRawFormer,
        )

        model = TrueColorRawFormer(
            TrueColorConfig(dim=8, num_heads=(2, 2, 2, 2), bayertorgb=bayertorgb)
        )
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        _, out = _init_and_run(model, x)
        assert out.shape == (1, 32, 32, 3)
        # ColorCorrection clamps output to [0, 1].
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    def test_bayer_processor_guidance_shapes(self):
        from bayer_low_light_image_enhancement_tpu.ops.isp import BayerProcessor

        bp = BayerProcessor()
        planes = jnp.asarray(RNG.uniform(0, 1, (2, 8, 8, 4)).astype(np.float32))
        variables = bp.init(jax.random.PRNGKey(0), planes)
        y, cr, cb, rgb = bp.apply(variables, planes)
        assert y.shape == (2, 8, 8, 1)
        assert cr.shape == cb.shape == (2, 8, 8, 1)
        assert rgb.shape == (2, 8, 8, 3)
        # Luma is max-normalised per image.
        assert float(jnp.max(y)) <= 1.0 + 1e-5
        # Chroma deltas are tanh-bounded.
        assert float(jnp.max(jnp.abs(cr))) <= 1.0


class TestFLCAUNet:
    def test_forward_and_global_residual(self):
        from bayer_low_light_image_enhancement_tpu.models.flca_unet import (
            FLCAUNetConfig,
            TransformerFLCAUNet,
        )

        model = TransformerFLCAUNet(FLCAUNetConfig(base=8, blocks=(1, 1, 1), heads=2))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 4)).astype(np.float32))
        variables, out = _init_and_run(model, x)
        assert out.shape == (1, 32, 32, 4)

    def test_odd_sizes_via_resize_path(self):
        """The reference handles non-divisible sizes by bilinear re-alignment
        (Transformer_FLCA_UNet.py:184-186); 40 is not divisible by 16."""
        from bayer_low_light_image_enhancement_tpu.models.flca_unet import (
            FLCAUNetConfig,
            TransformerFLCAUNet,
        )

        model = TransformerFLCAUNet(FLCAUNetConfig(base=8, blocks=(1, 1, 1), heads=2))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 40, 40, 4)).astype(np.float32))
        variables, out = _init_and_run(model, x)
        assert out.shape == (1, 40, 40, 4)


class TestRegistry:
    def test_all_models_registered(self):
        from bayer_low_light_image_enhancement_tpu import list_models

        names = list_models()
        for expected in [
            "rawformer_s",
            "rawformer_b",
            "rawformer_l",
            "rawformer_wfb",
            "flca_rawformer",
            "multilvl_flca_rawformer",
            "truecolor_rawformer",
            "bayertorgb_rawformer",
            "flca_unet",
        ]:
            assert expected in names, f"{expected} missing from {names}"
