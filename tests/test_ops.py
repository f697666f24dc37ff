"""Unit tests for core ops, with torch-reference parity oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.ops import (
    space_to_depth,
    depth_to_space,
    channel_layernorm,
    haar_dwt_stack,
    haar_iwt_stack,
    haar_dwt_fb,
    haar_iwt_fb,
    pack_bayer,
    normalize_sid,
    CFA_PATTERNS,
)
from bayer_low_light_image_enhancement_tpu.ops.conv import conv2d, leaky_relu

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


class TestShuffle:
    def test_roundtrip(self):
        x = _rand(2, 8, 12, 5)
        y = depth_to_space(space_to_depth(jnp.asarray(x), 2), 2)
        np.testing.assert_array_equal(np.asarray(y), x)

    def test_torch_parity_unshuffle(self):
        x = _rand(2, 8, 12, 3)
        ours = np.asarray(space_to_depth(jnp.asarray(x), 2))
        # torch works NCHW
        ref = torch.nn.functional.pixel_unshuffle(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=0, atol=0)

    def test_torch_parity_shuffle(self):
        x = _rand(2, 4, 6, 12)
        ours = np.asarray(depth_to_space(jnp.asarray(x), 2))
        ref = torch.nn.functional.pixel_shuffle(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


class TestLayerNorm:
    def test_torch_parity(self):
        x = _rand(2, 4, 4, 16)
        w = _rand(16)
        b = _rand(16)
        ours = np.asarray(channel_layernorm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        ln = torch.nn.LayerNorm(16)
        with torch.no_grad():
            ln.weight.copy_(torch.from_numpy(w))
            ln.bias.copy_(torch.from_numpy(b))
        ref = ln(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_bias_free(self):
        # BiasFree_LayerNorm (reference model.py:89-103): x / sqrt(var+eps) * w
        x = _rand(1, 2, 2, 8)
        w = np.ones(8, np.float32)
        ours = np.asarray(channel_layernorm(jnp.asarray(x), jnp.asarray(w), bias_free=True))
        var = x.var(axis=-1, keepdims=True)
        ref = x / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


class TestHaarStack:
    def test_roundtrip(self):
        x = _rand(3, 8, 8, 4)
        y = haar_iwt_stack(haar_dwt_stack(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(y), x, rtol=1e-6, atol=1e-6)

    def test_reference_parity(self, reference_blocks):
        blocks = reference_blocks
        x = _rand(2, 8, 8, 3)
        ours = np.asarray(haar_dwt_stack(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = blocks.dwt_init(xt).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    def test_reference_iwt_parity(self, reference_blocks):
        blocks = reference_blocks
        x = _rand(8, 4, 4, 3)  # 4*B with B=2
        ours = np.asarray(haar_iwt_stack(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = blocks.iwt_init(xt).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


class TestHaarFilterBank:
    def test_roundtrip(self):
        x = _rand(2, 6, 10, 3)
        ll, highs = haar_dwt_fb(jnp.asarray(x))
        y = haar_iwt_fb(ll, highs)
        np.testing.assert_allclose(np.asarray(y), x, rtol=1e-6, atol=1e-6)

    def test_reference_parity(self, reference_flca_module):
        mod = reference_flca_module
        x = _rand(2, 9, 7, 2)  # odd sizes exercise the reflect pad
        ll, highs = haar_dwt_fb(jnp.asarray(x))
        dwt = mod.HaarDWT()
        with torch.no_grad():
            LL, (LH, HL, HH) = dwt(torch.from_numpy(x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(np.asarray(ll), LL.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(highs[..., 0]), LH.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(highs[..., 1]), HL.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(highs[..., 2]), HH.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)


class TestBayer:
    def test_pack_rggb(self):
        # Construct a mosaic with known values per CFA site.
        h, w = 6, 8
        mosaic = np.zeros((1, h, w, 1), np.float32)
        mosaic[:, 0::2, 0::2] = 1.0  # R
        mosaic[:, 0::2, 1::2] = 2.0  # G1
        mosaic[:, 1::2, 0::2] = 3.0  # G2
        mosaic[:, 1::2, 1::2] = 4.0  # B
        packed = np.asarray(pack_bayer(jnp.asarray(mosaic), "RGGB"))
        assert packed.shape == (1, 3, 4, 4)
        np.testing.assert_array_equal(packed[..., 0], 1.0)
        np.testing.assert_array_equal(packed[..., 1], 2.0)
        np.testing.assert_array_equal(packed[..., 2], 3.0)
        np.testing.assert_array_equal(packed[..., 3], 4.0)

    @pytest.mark.parametrize("pattern", list(CFA_PATTERNS))
    def test_all_patterns_canonicalise(self, pattern):
        """Whatever the CFA, output plane order is (R, G1, G2, B)."""
        h, w = 4, 4
        vals = {"R": 10.0, "G1": 20.0, "G2": 30.0, "B": 40.0}
        layout = {
            "RGGB": [["R", "G1"], ["G2", "B"]],
            "BGGR": [["B", "G1"], ["G2", "R"]],
            "GRBG": [["G1", "R"], ["B", "G2"]],
            "GBRG": [["G1", "B"], ["R", "G2"]],
        }[pattern]
        mosaic = np.zeros((1, h, w, 1), np.float32)
        for i in range(2):
            for j in range(2):
                mosaic[:, i::2, j::2] = vals[layout[i][j]]
        packed = np.asarray(pack_bayer(jnp.asarray(mosaic), pattern))
        np.testing.assert_array_equal(packed[..., 0], vals["R"])
        np.testing.assert_array_equal(packed[..., 3], vals["B"])
        greens = sorted([packed[0, 0, 0, 1], packed[0, 0, 0, 2]])
        assert greens == [vals["G1"], vals["G2"]] or greens == [vals["G2"], vals["G1"]]

    def test_normalize_sid_golden(self):
        # load_dataset.py:88-90 semantics.
        mosaic = jnp.asarray(np.array([[0, 512, 8000, 16383, 40000]], np.float32).reshape(1, 1, 5, 1))
        out = np.asarray(normalize_sid(mosaic, ratio=100.0))
        expected = (np.clip([0, 512, 8000, 16383, 40000], 512, 16383) - 512) / (16383 - 512 + 1e-6) * 100
        np.testing.assert_allclose(out.reshape(-1), expected, rtol=1e-5)


class TestConv:
    def test_torch_parity_same_pad(self):
        x = _rand(1, 7, 9, 4)
        w = _rand(3, 3, 4, 6)
        b = _rand(6)
        ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        conv = torch.nn.Conv2d(4, 6, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
            conv.bias.copy_(torch.from_numpy(b))
        ref = conv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_depthwise_parity(self):
        x = _rand(1, 6, 6, 8)
        w = _rand(3, 3, 1, 8)
        ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), None, groups=8))
        conv = torch.nn.Conv2d(8, 8, 3, padding=1, groups=8, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        ref = conv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_leaky_relu(self):
        x = jnp.asarray([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(np.asarray(leaky_relu(x, 0.2)), [-0.4, 0.0, 3.0])


@pytest.fixture(scope="module")
def reference_blocks():
    from conftest import add_reference_to_path

    add_reference_to_path()
    import blocks

    return blocks


@pytest.fixture(scope="module")
def reference_flca_module():
    from conftest import add_reference_to_path

    add_reference_to_path()
    import FrequencyawareLumaChromaAttentionRAWFormer as mod

    return mod
