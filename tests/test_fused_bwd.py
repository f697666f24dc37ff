"""Fused TransformerBlock backward (kernels/fused_block_bwd.py).

Grad-parity methodology: bf16 bias grads are catastrophically-cancelling
sums where XLA's own bf16 autodiff deviates from fp32 truth by up to ~0.6
relative (measured), so naive kernel-vs-XLA-bf16 comparison is meaningless
for those leaves. Instead every leaf is compared against the fp32 XLA
block's grads, with XLA-bf16-vs-fp32 as the per-leaf noise yardstick: the
kernel must be within max(3x yardstick, 2e-2). In practice the kernel's
fp32 VMEM accumulators make it *tighter* than XLA bf16 on every leaf.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.kernels.fused_block_bwd import (
    fused_transformer_block_train,
    trainable_fusable,
)
from bayer_low_light_image_enhancement_tpu.models.common import TransformerBlock
from bayer_low_light_image_enhancement_tpu.models.rawformer import (
    RawFormer,
    RawFormerConfig,
)

RNG = np.random.default_rng(3)


def _grad_parity(B, H, W, C, HEADS, tile_rows):
    x32 = jnp.asarray(RNG.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    blk16 = TransformerBlock(num_heads=HEADS, ffn_expansion=2, dtype=jnp.bfloat16)
    blk32 = TransformerBlock(num_heads=HEADS, ffn_expansion=2, dtype=jnp.float32)
    params = blk16.init(jax.random.PRNGKey(0), x32)["params"]

    loss16 = lambda p, xx: jnp.sum(
        blk16.apply({"params": p}, xx).astype(jnp.float32) ** 2
    )
    loss32 = lambda p, xx: jnp.sum(blk32.apply({"params": p}, xx) ** 2)
    lossk = lambda p, xx: jnp.sum(
        fused_transformer_block_train(xx, p, HEADS, tile_rows).astype(
            jnp.float32
        )
        ** 2
    )

    g32, gx32 = jax.grad(loss32, argnums=(0, 1))(params, x32)
    g16, gx16 = jax.grad(loss16, argnums=(0, 1))(
        params, x32.astype(jnp.bfloat16)
    )
    gk, gxk = jax.grad(lossk, argnums=(0, 1))(params, x32.astype(jnp.bfloat16))

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
            f"{name}: kernel {ek:.3e} vs noise yardstick {e16:.3e}"
        )
    sx = np.abs(np.asarray(gx32)).max()
    e16 = np.abs(np.asarray(gx16, np.float32) - np.asarray(gx32)).max() / sx
    ek = np.abs(np.asarray(gxk, np.float32) - np.asarray(gx32)).max() / sx
    assert ek <= max(3 * e16, 2e-2), f"dx: {ek:.3e} vs {e16:.3e}"


@pytest.mark.slow
class TestGradParity:
    def test_single_tile_c64(self):
        _grad_parity(B=4, H=8, W=14, C=64, HEADS=8, tile_rows=8)

    def test_multi_tile_c64(self):
        _grad_parity(B=4, H=24, W=14, C=64, HEADS=8, tile_rows=8)

    def test_multi_tile_c32_g8(self):
        _grad_parity(B=8, H=20, W=12, C=32, HEADS=8, tile_rows=8)

    def test_odd_height_padding(self):
        _grad_parity(B=4, H=13, W=10, C=64, HEADS=8, tile_rows=8)

    def test_c48_g4_rawformer_b_geometry(self):
        # RawFormer-B level 1: C=48, g=4 -> 192 lanes (1.5 lane tiles).
        _grad_parity(B=8, H=16, W=10, C=48, HEADS=8, tile_rows=8)


class TestGeometryGate:
    def test_fusable_predicate(self):
        assert trainable_fusable(jnp.zeros((8, 16, 16, 32)))
        assert trainable_fusable(jnp.zeros((4, 16, 16, 64)))
        # Too few images for the lane target -> forward would W-pack.
        assert not trainable_fusable(jnp.zeros((1, 16, 16, 32)))
        # Wide frames exceed the single-W-tile scope.
        assert not trainable_fusable(jnp.zeros((8, 16, 2048, 32)))


@pytest.mark.slow
class TestTrainerIntegration:
    def test_fused_train_step_matches_xla(self):
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            TrainConfig,
            Trainer,
        )

        model = RawFormer(
            RawFormerConfig(dim=32, num_heads=(8, 8, 8, 8), dtype=jnp.bfloat16)
        )
        x = jnp.asarray(RNG.uniform(0, 1, (8, 32, 32, 1)), jnp.float32)
        y = jnp.asarray(RNG.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)

        t0 = Trainer(model, TrainConfig(steps_per_epoch=1))
        s0 = t0.init(jax.random.PRNGKey(1), x[:1])
        t1 = Trainer(model, TrainConfig(steps_per_epoch=1, fused_blocks=True))
        s1 = t1.init(jax.random.PRNGKey(1), x[:1])

        s0, l0 = t0.train_step(s0, (x, y))
        s1, l1 = t1.train_step(s1, (x, y))
        np.testing.assert_allclose(float(l0), float(l1), rtol=2e-2)
        # Params after one Adam step agree to bf16-grad tolerance (Adam
        # normalises by grad magnitude, so compare absolutely vs the lr).
        p0 = np.concatenate([np.ravel(v) for v in jax.tree.leaves(s0.params)])
        p1 = np.concatenate([np.ravel(v) for v in jax.tree.leaves(s1.params)])
        np.testing.assert_allclose(p0, p1, atol=5e-4)
