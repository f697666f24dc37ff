"""W-phase-packed conv rewrites (ops/wpack.py): exact parity vs the dense
ConvTransformer tail in fp32 (same math, different lane geometry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayer_low_light_image_enhancement_tpu.models.common import (
    ConvTransformer,
    TransformerBlock,
)
from bayer_low_light_image_enhancement_tpu.ops import wpack as wp

rng = np.random.default_rng(0)


def _conv_dense(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestPackedConv:
    @pytest.mark.parametrize("f", [2, 4])
    @pytest.mark.parametrize("shape", [(2, 8, 16, 8), (1, 5, 12, 4)])
    def test_conv3_parity(self, f, shape):
        b, h, w, c = shape
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c + 4)), jnp.float32)
        dense = _conv_dense(x, k)
        packed = wp.wunpack(_conv_dense(wp.wpack(x, f), wp.pack_conv3_kernel(k, f)), f)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(packed), atol=1e-5)

    def test_roundtrip(self):
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 3)), jnp.float32)
        assert bool(jnp.all(wp.wunpack(wp.wpack(x, 4), 4) == x))

    def test_pointwise_parity(self):
        x = jnp.asarray(rng.standard_normal((2, 6, 8, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 1, 8, 5)), jnp.float32)
        dense = _conv_dense(x, k)
        packed = wp.wunpack(
            _conv_dense(wp.wpack(x, 2), wp.pack_pointwise_kernel(k, 2)), 2
        )
        np.testing.assert_allclose(np.asarray(dense), np.asarray(packed), atol=1e-5)


class TestPackedStageTail:
    @pytest.mark.parametrize("f,c", [(4, 32), (2, 64)])
    def test_tail_matches_convtransformer(self, f, c):
        # fp32 end-to-end: the packed tail must reproduce the module's
        # conv-branch + concat + reduce + conv_out exactly, at both shipped
        # geometries (C=32/f=4 and the round-3 C=64/f=2 routing).
        x = jnp.asarray(rng.standard_normal((2, 8, 16, c)) * 0.3, jnp.float32)
        mod = ConvTransformer(num_heads=8)
        variables = mod.init(jax.random.PRNGKey(0), x)
        y_ref = mod.apply(variables, x)

        params = variables["params"]
        t = TransformerBlock(num_heads=8).apply(
            {"params": params["transformer"]}, x
        )
        y_packed = wp.packed_stage_tail(x, t, params, f=f)
        np.testing.assert_allclose(
            np.asarray(y_ref), np.asarray(y_packed), atol=2e-5
        )

    def test_gate(self):
        ok = jnp.zeros((1, 8, 64, 32))
        assert wp.tail_fusable(ok, 4)
        assert not wp.tail_fusable(jnp.zeros((1, 8, 64, 64)), 4)  # 256 lanes
        assert not wp.tail_fusable(jnp.zeros((1, 8, 63, 32)), 4)  # W % f
        assert not wp.tail_fusable(jnp.zeros((1, 8, 8, 32)), 4)   # too narrow


@pytest.mark.slow
def test_fused_apply_packed_tail_full_model():
    """fused_apply with packed_tail rewrites the C=32 stages and matches
    plain apply on the canonical model (dim 32 so the gate fires)."""
    from unittest import mock

    from bayer_low_light_image_enhancement_tpu.models import fused_apply as fa
    from bayer_low_light_image_enhancement_tpu.models.rawformer import (
        RawFormer,
        RawFormerConfig,
    )

    cfg = RawFormerConfig(dim=32, num_heads=(8, 8, 8, 8), dtype=jnp.bfloat16)
    model = RawFormer(cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    expected = model.apply(variables, x)

    calls = []
    real = wp.packed_stage_tail

    def counted(*a, **k):
        calls.append(1)
        return real(*a, **k)

    with mock.patch.object(fa.wpack_ops, "packed_stage_tail", counted):
        got = fa.fused_apply(model, variables, x, tile_rows=4, packed_tail=True)
    assert calls, "packed-tail gate never fired"
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(expected, np.float32),
        atol=0.05, rtol=0.05,
    )


class TestPackedNamedConv:
    def test_conv1x1_with_bias(self):
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 64)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 1, 64, 32)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
        dense = _conv_dense(x, k) + b
        packed = wp.packed_conv(x, k, b, f=4)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(packed), atol=1e-5)

    def test_conv3x3_embed_geometry(self):
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 32)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
        dense = _conv_dense(x, k) + b
        packed = wp.packed_conv(x, k, b, f=4)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(packed), atol=1e-5)

    def test_conv_gate(self):
        assert wp.conv_fusable(jnp.zeros((1, 8, 64, 32)), 4)
        assert not wp.conv_fusable(jnp.zeros((1, 8, 63, 32)), 4)
        assert not wp.conv_fusable(jnp.zeros((1, 8, 12, 32)), 4)


@pytest.mark.slow
def test_trainable_packed_stage_grad_parity():
    """Packed tail + custom-VJP TB in training: every param grad within the
    XLA-bf16-vs-fp32 noise yardstick (methodology of tests/test_fused_bwd)."""
    from bayer_low_light_image_enhancement_tpu.models import fused_apply as fa

    B, H, W, C, HEADS = 8, 16, 16, 32, 8
    x32 = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    mod16 = ConvTransformer(num_heads=HEADS, dtype=jnp.bfloat16)
    mod32 = ConvTransformer(num_heads=HEADS, dtype=jnp.float32)
    params = mod16.init(jax.random.PRNGKey(0), x32)["params"]

    loss32 = lambda p, xx: jnp.sum(mod32.apply({"params": p}, xx) ** 2)
    loss16 = lambda p, xx: jnp.sum(
        mod16.apply({"params": p}, xx).astype(jnp.float32) ** 2
    )

    calls = []
    real = wp.packed_stage_tail

    def counted(*a, **k):
        calls.append(1)
        return real(*a, **k)

    def lossk(p, xx):
        from unittest import mock

        with mock.patch.object(fa.wpack_ops, "packed_stage_tail", counted):
            y = fa.fused_apply(
                mod16, {"params": p}, xx, trainable=True, packed_tail=True
            )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g32 = jax.grad(loss32)(params, x32)
    g16 = jax.grad(loss16)(params, x32.astype(jnp.bfloat16))
    gk = jax.grad(lossk)(params, x32.astype(jnp.bfloat16))
    assert calls, "trainable packed-tail gate never fired"

    f32 = jax.tree_util.tree_flatten_with_path(g32)[0]
    f16 = dict(jax.tree_util.tree_flatten_with_path(g16)[0])
    fk = dict(jax.tree_util.tree_flatten_with_path(gk)[0])
    for path, a in f32:
        a = np.asarray(a, np.float32)
        b = np.asarray(f16[path], np.float32)
        c = np.asarray(fk[path], np.float32)
        s = np.abs(a).max() + 1e-8
        e16 = np.abs(a - b).max() / s
        ek = np.abs(a - c).max() / s
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        assert ek <= max(3 * e16, 2e-2), (
            f"{name}: packed {ek:.3e} vs noise yardstick {e16:.3e}"
        )


@pytest.mark.parametrize("f,c", [(4, 32), (2, 64)])
def test_packed_downsample_parity(f, c):
    from bayer_low_light_image_enhancement_tpu.models.common import Downsample

    x = jnp.asarray(rng.standard_normal((2, 8, 16, c)) * 0.3, jnp.float32)
    mod = Downsample()
    v = mod.init(jax.random.PRNGKey(0), x)
    y_ref = mod.apply(v, x)
    y_packed = wp.packed_downsample(x, v["params"]["conv"]["kernel"], f=f)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_packed), atol=1e-5)
