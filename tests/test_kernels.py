"""Pallas kernel tests (interpreter mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.kernels.bayer_pack import (
    bayer_pack_normalize,
    bayer_pack_normalize_xla,
)

RNG = np.random.default_rng(29)


class TestBayerPackKernel:
    def test_matches_xla_reference(self):
        mosaic = RNG.integers(0, 17000, (2, 32, 64), dtype=np.uint16)
        ratio = np.array([100.0, 300.0], np.float32)
        fused = np.asarray(bayer_pack_normalize(jnp.asarray(mosaic), jnp.asarray(ratio)))
        ref = np.asarray(
            bayer_pack_normalize_xla(jnp.asarray(mosaic), jnp.asarray(ratio))
        )
        assert fused.shape == (2, 16, 32, 4)
        np.testing.assert_allclose(fused, ref, rtol=1e-6, atol=1e-6)

    def test_channel_semantics(self):
        # Distinct constants at each CFA site round-trip into the right plane.
        mosaic = np.zeros((1, 8, 8), np.uint16)
        mosaic[:, 0::2, 0::2] = 1000   # R
        mosaic[:, 0::2, 1::2] = 2000   # G1
        mosaic[:, 1::2, 0::2] = 3000   # G2
        mosaic[:, 1::2, 1::2] = 4000   # B
        out = np.asarray(
            bayer_pack_normalize(jnp.asarray(mosaic), jnp.asarray([100.0], np.float32))
        )

        def expect(code):
            return (code - 512.0) / (16383.0 - 512.0 + 1e-6) * 100.0

        np.testing.assert_allclose(out[..., 0], expect(1000), rtol=1e-5)
        np.testing.assert_allclose(out[..., 1], expect(2000), rtol=1e-5)
        np.testing.assert_allclose(out[..., 2], expect(3000), rtol=1e-5)
        np.testing.assert_allclose(out[..., 3], expect(4000), rtol=1e-5)

    def test_black_white_clipping(self):
        mosaic = np.array([[[0, 512], [40000 % 65536, 16383]]], np.uint16).reshape(1, 2, 2)
        out = np.asarray(
            bayer_pack_normalize(jnp.asarray(mosaic), jnp.asarray([1.0], np.float32))
        )
        assert out.min() >= 0.0
        assert out.max() <= 1.0 + 1e-6

    def test_clamp01_folds_model_input_clamp(self):
        # ratio 300 pushes many codes past 1.0; clamp01 must reproduce the
        # model's own input clamp (reference model.py:475).
        mosaic = RNG.integers(0, 17000, (1, 16, 16), dtype=np.uint16)
        ratio = np.array([300.0], np.float32)
        clamped = np.asarray(
            bayer_pack_normalize(jnp.asarray(mosaic), jnp.asarray(ratio), clamp01=True)
        )
        plain = np.asarray(
            bayer_pack_normalize(jnp.asarray(mosaic), jnp.asarray(ratio))
        )
        assert plain.max() > 1.0  # the clamp actually bites on this input
        np.testing.assert_allclose(clamped, np.clip(plain, 0.0, 1.0), rtol=1e-6)

    def test_raw_u16_forward_matches_f32_path(self):
        """u16 mosaic -> bf16 pack -> prepacked model == the fp32 input path
        (clip + space_to_depth inside the model), to bf16 tolerance."""
        import jax

        from bayer_low_light_image_enhancement_tpu.kernels.bayer_pack import (
            make_raw_u16_forward,
        )
        from bayer_low_light_image_enhancement_tpu.models.rawformer import (
            RawFormer,
            RawFormerConfig,
        )

        mosaic = RNG.integers(0, 17000, (1, 32, 32), dtype=np.uint16)
        ratio = np.array([300.0], np.float32)
        model = RawFormer(RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2)))
        x_f32 = np.asarray(
            bayer_pack_normalize_xla(jnp.asarray(mosaic), jnp.asarray(ratio))
        )
        # The fp32 path feeds the unpacked [B,H,W,1] raw (model packs it).
        from bayer_low_light_image_enhancement_tpu.ops.shuffle import depth_to_space

        x_raw = depth_to_space(jnp.asarray(x_f32), 2)
        variables = model.init(jax.random.PRNGKey(0), x_raw)
        expected = model.apply(variables, x_raw)

        fwd = make_raw_u16_forward(model.apply, dtype=jnp.bfloat16)
        got = fwd(variables, jnp.asarray(mosaic), jnp.asarray(ratio))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=0.05, atol=2e-2
        )
