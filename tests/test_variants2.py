"""Smoke + behaviour tests for the second batch of variants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(31)


class TestWavKAN:
    def test_kanlinear_wavelets(self):
        from bayer_low_light_image_enhancement_tpu.models.wavkan import (
            KANLinear,
            wavelet_basis,
        )

        # mexican hat at 0 = -2/(sqrt(3)*pi^0.25).
        v = float(wavelet_basis(jnp.asarray(0.0), "mexican_hat"))
        assert v == pytest.approx(-2.0 / (np.sqrt(3.0) * np.pi**0.25), rel=1e-6)
        assert float(wavelet_basis(jnp.asarray(0.0), "morlet")) == pytest.approx(1.0)
        assert float(wavelet_basis(jnp.asarray(0.0), "dog")) == pytest.approx(0.0)

        m = KANLinear(features=6, wavelet_type="dog")
        x = jnp.asarray(RNG.standard_normal((4, 3)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
        assert y.shape == (4, 6)

    def test_model_forward(self):
        from bayer_low_light_image_enhancement_tpu.models.wavkan import (
            WavKANConfig,
            WavKANRawFormer,
        )

        model = WavKANRawFormer(WavKANConfig(dim=8, num_heads=(2, 2, 2, 2)))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" in variables
        out = model.apply(variables, x)
        assert out.shape == (1, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestLumaMHSA:
    def test_cfa_luma_extraction(self):
        from bayer_low_light_image_enhancement_tpu.models.luma_variants import (
            bayer_luma_cfa,
        )

        x = jnp.asarray(RNG.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
        luma = bayer_luma_cfa(x, "rggb")
        assert luma.shape == (2, 16, 16, 1)
        # min-max normalised per image
        assert float(jnp.min(luma)) >= 0.0
        assert float(jnp.max(luma)) <= 1.0 + 1e-6

    @pytest.mark.parametrize("pattern", ["rggb", "bggr", "grbg", "gbrg"])
    def test_all_cfa_patterns(self, pattern):
        from bayer_low_light_image_enhancement_tpu.models.luma_variants import (
            bayer_luma_cfa,
        )

        x = jnp.asarray(RNG.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32))
        luma = bayer_luma_cfa(x, pattern)
        assert np.all(np.isfinite(np.asarray(luma)))

    def test_model_forward(self):
        from bayer_low_light_image_enhancement_tpu.models.luma_variants import (
            LumaMHSAConfig,
            LumaMHSARawFormer,
        )

        model = LumaMHSARawFormer(LumaMHSAConfig(dim=8, num_heads=(2, 2, 2, 2)))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestSimpleFLCAUNet:
    def test_forward(self):
        from bayer_low_light_image_enhancement_tpu.models.luma_variants import (
            SimpleFLCAUNet,
            SimpleFLCAUNetConfig,
        )

        model = SimpleFLCAUNet(SimpleFLCAUNetConfig(base_ch=8, heads=2))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 16, 16, 4)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 16, 16, 4)
        assert np.all(np.isfinite(np.asarray(out)))


class TestLumaChromaTransformer:
    def test_instance_norm(self):
        from bayer_low_light_image_enhancement_tpu.models.lumachroma_transformer import (
            instance_norm,
        )

        x = jnp.asarray(RNG.standard_normal((2, 8, 8, 3)).astype(np.float32) * 5 + 3)
        y = np.asarray(instance_norm(x))
        np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(axis=(1, 2)), 1.0, atol=1e-3)

    def test_forward_odd_size(self):
        from bayer_low_light_image_enhancement_tpu.models.lumachroma_transformer import (
            BayerLumaChromaTransformer,
            LumaChromaTransformerConfig,
        )

        model = BayerLumaChromaTransformer(
            LumaChromaTransformerConfig(base=8, num_blocks=1, heads=2)
        )
        # 20 is not divisible by 16 — exercises the resize re-alignment.
        x = jnp.asarray(RNG.uniform(0, 1, (1, 20, 20, 4)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 20, 20, 4)
        assert np.all(np.isfinite(np.asarray(out)))


class TestUnetLumaDWT:
    def test_forward(self):
        from bayer_low_light_image_enhancement_tpu.models.flca_unet import (
            FLCAUNetConfig,
            TransformerFLCAUNet,
        )

        model = TransformerFLCAUNet(
            FLCAUNetConfig(base=8, blocks=(1, 1, 1), heads=2, guidance="dwt")
        )
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 4)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 32, 32, 4)
        assert np.all(np.isfinite(np.asarray(out)))


class TestFullRegistry:
    def test_complete_zoo(self):
        from bayer_low_light_image_enhancement_tpu import list_models

        names = set(list_models())
        expected = {
            "rawformer_s", "rawformer_b", "rawformer_l",
            "rawformer_wfb", "flca_rawformer", "multilvl_flca_rawformer",
            "truecolor_rawformer", "bayertorgb_rawformer",
            "flca_unet", "unet_luma_dwt", "wavkan_rawformer",
            "luma_mhsa_rawformer", "simple_flca_unet", "lumachroma_transformer",
        }
        missing = expected - names
        assert not missing, f"missing models: {missing}"
