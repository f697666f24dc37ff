"""Tensor-parallel (Megatron-style) tests on the 8-virtual-device mesh.

The reference has no TP (SURVEY.md §2.4); correctness oracle is therefore the
framework's own single-device path: GSPMD partitioning must be semantics-
preserving, so a TP-sharded forward/train step must match the unsharded one
to fp32 reduction-order tolerance.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bayer_low_light_image_enhancement_tpu.core.mesh import AXES, create_mesh
from bayer_low_light_image_enhancement_tpu.models.rawformer import (
    RawFormer,
    RawFormerConfig,
)
from bayer_low_light_image_enhancement_tpu.parallel.tensor import (
    shard_tensor_parallel,
    tensor_specs,
)
from bayer_low_light_image_enhancement_tpu.train.trainer import TrainConfig, Trainer

RNG = np.random.default_rng(7)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def small_model():
    return RawFormer(RawFormerConfig(dim=16, num_heads=(2, 2, 2, 2)))


class TestSpecs:
    def test_column_row_rules(self):
        model = small_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
        )["params"]
        specs = tensor_specs({"params": params}, tp=4)["params"]
        blk = specs["conv_tran1"]["transformer"]
        assert blk["attn"]["qkv"]["kernel"] == P(None, None, None, AXES.tensor)
        assert blk["attn"]["qkv"]["bias"] == P(AXES.tensor)
        assert blk["attn"]["project_out"]["kernel"] == P(None, None, AXES.tensor, None)
        assert blk["attn"]["project_out"]["bias"] == P()
        assert blk["ffn"]["pointwise1"]["kernel"] == P(None, None, None, AXES.tensor)
        assert blk["ffn"]["depthwise"]["kernel"] == P(None, None, None, AXES.tensor)
        assert blk["ffn"]["pointwise2"]["kernel"] == P(None, None, AXES.tensor, None)
        # Spatial convs / norms / temperature replicated.
        assert specs["embedding"]["kernel"] == P()
        assert blk["norm1"]["weight"] == P()
        assert blk["attn"]["temperature"] == P()

    def test_indivisible_dims_fall_back_to_replicated(self):
        model = small_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
        )["params"]
        # tp=7 divides none of the channel counts -> everything replicated.
        specs = tensor_specs(params, tp=7)
        flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
        assert all(s == P() for s in flat)


class TestForwardEquivalence:
    def test_tp_forward_matches_unsharded(self):
        mesh = create_mesh(data=1, tensor=8)
        model = small_model()
        x = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), x)

        expected = jax.jit(lambda v, x: model.apply(v, x))(variables, x)

        tp_vars = shard_tensor_parallel(variables, mesh)
        out = jax.jit(lambda v, x: model.apply(v, x))(tp_vars, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5
        )


@pytest.mark.slow
class TestTrainEquivalence:
    def test_dp_tp_train_matches_single_device(self):
        model = small_model()
        cfg = TrainConfig(steps_per_epoch=4, total_epochs=10, warmup_epochs=2)
        x = jnp.asarray(RNG.uniform(0, 1, (4, 32, 32, 1)), jnp.float32)
        y = jnp.asarray(RNG.uniform(0, 1, (4, 32, 32, 3)), jnp.float32)

        # Single-device ground truth.
        t0 = Trainer(model, cfg)
        s0 = t0.init(jax.random.PRNGKey(2), x[:1])
        losses0 = []
        for _ in range(2):
            s0, l0 = t0.train_step(s0, (x, y))
            losses0.append(float(l0))

        # 2-way data x 4-way tensor.
        mesh = create_mesh(data=2, tensor=4)
        t1 = Trainer(model, cfg, mesh=mesh)
        assert t1._tp
        s1 = t1.init(jax.random.PRNGKey(2), x[:1])
        losses1 = []
        for _ in range(2):
            s1, l1 = t1.train_step(s1, t1.shard_batch((x, y)))
            losses1.append(float(l1))

        np.testing.assert_allclose(losses0, losses1, rtol=1e-5, atol=1e-6)
        p0 = jax.tree.map(np.asarray, s0.params)
        p1 = jax.tree.map(np.asarray, s1.params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
            p0,
            p1,
        )

    def test_tp_eval_step(self):
        model = small_model()
        mesh = create_mesh(data=2, tensor=4)
        t = Trainer(model, TrainConfig(steps_per_epoch=1), mesh=mesh)
        x = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
        y = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
        s = t.init(jax.random.PRNGKey(3), x[:1])
        pred, psnr = t.eval_step(t.eval_variables(s), t.shard_batch((x, y)))
        assert pred.shape == (2, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(psnr)))
