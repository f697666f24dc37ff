"""FLCA family tests: luma/chroma extraction, FLCA block parity, model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.ops.luma import bayer_luma_chroma
from bayer_low_light_image_enhancement_tpu.ops.flca import FLCA, resize_bilinear

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(13)


@pytest.fixture(scope="module")
def ref_mod():
    from conftest import add_reference_to_path

    add_reference_to_path()
    import FrequencyawareLumaChromaAttentionRAWFormer as mod

    return mod


class TestLumaChroma:
    def test_parity_vs_reference(self, ref_mod):
        planes = RNG.uniform(0, 1, (2, 4, 8, 6)).astype(np.float32)
        ref = ref_mod.BayerLumaChroma()
        with torch.no_grad():
            y_t, cr_t, cb_t = ref(torch.from_numpy(planes.transpose(0, 3, 1, 2)))
        y, cr, cb = bayer_luma_chroma(jnp.asarray(planes))
        np.testing.assert_allclose(np.asarray(y), y_t.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cr), cr_t.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cb), cb_t.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)


class TestResize:
    @pytest.mark.parametrize("out_hw", [(9, 13), (3, 4), (5, 7), (16, 16)])
    def test_bilinear_matches_torch(self, out_hw):
        # Covers upsample, downsample (torch does NOT antialias), identity.
        x = RNG.standard_normal((1, 5, 7, 2)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=out_hw,
            mode="bilinear",
            align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestFLCABlock:
    def test_parity_vs_reference(self, ref_mod):
        c = 16
        ref = ref_mod.FLCA(c).eval()
        feat = RNG.standard_normal((1, c, 8, 8)).astype(np.float32)
        y = RNG.uniform(0, 1, (1, 1, 16, 16)).astype(np.float32)
        cr = RNG.standard_normal((1, 1, 16, 16)).astype(np.float32) * 0.1
        cb = RNG.standard_normal((1, 1, 16, 16)).astype(np.float32) * 0.1
        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(feat), torch.from_numpy(y),
                torch.from_numpy(cr), torch.from_numpy(cb),
            ).numpy()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        def cw(w):
            return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

        params = {
            "params": {
                "low_attn": {"kernel": cw(sd["low_attn.0.weight"])},
                "high_attn": {"kernel": cw(sd["high_attn.0.weight"])},
                "chroma_attn": {"kernel": cw(sd["chroma_attn.0.weight"])},
                "se": {
                    "fc1": {"kernel": cw(sd["se.1.weight"]), "bias": jnp.asarray(sd["se.1.bias"])},
                    "fc2": {"kernel": cw(sd["se.3.weight"]), "bias": jnp.asarray(sd["se.3.bias"])},
                },
                "alpha": jnp.asarray(sd["alpha"]),
                "beta": jnp.asarray(sd["beta"]),
                "gamma": jnp.asarray(sd["gamma"]),
            }
        }
        flca = FLCA()
        out = flca.apply(
            params,
            jnp.asarray(feat.transpose(0, 2, 3, 1)),
            jnp.asarray(y.transpose(0, 2, 3, 1)),
            jnp.asarray(cr.transpose(0, 2, 3, 1)),
            jnp.asarray(cb.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(out), ref_out.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )


class TestFLCARawFormer:
    def test_forward_shape(self):
        from bayer_low_light_image_enhancement_tpu.models.flca_rawformer import (
            FLCARawFormer,
            FLCARawFormerConfig,
        )

        model = FLCARawFormer(FLCARawFormerConfig(dim=8, num_heads=(2, 2, 2, 2)))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_grad_flows(self):
        from bayer_low_light_image_enhancement_tpu.models.flca_rawformer import (
            FLCARawFormer,
            FLCARawFormerConfig,
        )

        model = FLCARawFormer(FLCARawFormerConfig(dim=8, num_heads=(2, 2, 2, 2)))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda v: jnp.sum(model.apply(v, x)))(variables)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


class TestMultiLvlFLCA:
    def test_forward_shape(self):
        from bayer_low_light_image_enhancement_tpu.models.multilvl_flca import (
            MultiLvlFLCAConfig,
            MultiLvlFLCARawFormer,
        )

        model = MultiLvlFLCARawFormer(MultiLvlFLCAConfig(dim=8, num_heads=(2, 2, 2, 2)))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_color_anchor_correction(self):
        from bayer_low_light_image_enhancement_tpu.models.multilvl_flca import (
            color_anchor_correction,
        )

        out = jnp.zeros((1, 4, 4, 3))
        packed = jnp.ones((1, 2, 2, 4))
        corrected = color_anchor_correction(out, packed, alpha=0.12)
        # Input demosaic mean is (1,1,1); output mean 0 -> shift 0.12 each.
        np.testing.assert_allclose(np.asarray(corrected), 0.12, rtol=1e-6)

    def test_color_consistency_loss(self):
        from bayer_low_light_image_enhancement_tpu.models.multilvl_flca import (
            color_consistency_loss,
        )

        pred = jnp.full((1, 4, 4, 3), 0.5)
        packed = jnp.full((1, 2, 2, 4), 0.5)
        assert float(color_consistency_loss(pred, packed)) == pytest.approx(0.0, abs=1e-8)
