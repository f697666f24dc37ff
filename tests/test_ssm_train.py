"""Custom-VJP Pallas selective scan (kernels/ssm_scan.py training path):
grad parity vs jax.grad through the XLA associative-scan in fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels, minutes on CPU

from bayer_low_light_image_enhancement_tpu.kernels.ssm_scan import (
    selective_scan_pallas_train,
)
from bayer_low_light_image_enhancement_tpu.ops.ssm import selective_scan

RNG = np.random.default_rng(7)


def _mk(bsz, L, d, n):
    u = jnp.asarray(RNG.standard_normal((bsz, L, d)) * 0.5, jnp.float32)
    dt = jnp.asarray(RNG.uniform(0.05, 0.6, (bsz, L, d)), jnp.float32)
    A = jnp.asarray(-RNG.uniform(0.2, 2.0, (d, n)), jnp.float32)
    B = jnp.asarray(RNG.standard_normal((bsz, L, n)) * 0.5, jnp.float32)
    C = jnp.asarray(RNG.standard_normal((bsz, L, n)) * 0.5, jnp.float32)
    D = jnp.asarray(RNG.standard_normal((d,)) * 0.3, jnp.float32)
    return u, dt, A, B, C, D


def _grad_parity(bsz, L, d, n, chunk, block_d, atol=2e-4):
    args = _mk(bsz, L, d, n)

    def loss_ref(*a):
        return jnp.sum(selective_scan(*a) ** 2)

    def loss_k(*a):
        return jnp.sum(
            selective_scan_pallas_train(*a, chunk, block_d, True) ** 2
        )

    # primal parity first
    y_ref = selective_scan(*args)
    y_k = selective_scan_pallas_train(*args, chunk, block_d, True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=atol)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_k = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    names = ["du", "ddt", "dA", "dB", "dC", "dD"]
    for nm, a, b in zip(names, g_ref, g_k):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.abs(a).max() + 1e-6
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, f"{nm}: rel err {err:.2e}"


class TestScanVJP:
    def test_single_chunk(self):
        _grad_parity(2, 16, 8, 4, chunk=16, block_d=8)

    def test_multi_chunk_carry(self):
        # 4 chunks: exercises the h entry states and the reverse mu carry.
        _grad_parity(2, 64, 8, 4, chunk=16, block_d=8)

    def test_ragged_padding(self):
        # L and D not multiples of chunk/block: padded lanes and dt=0 steps
        # must contribute zero gradient.
        _grad_parity(1, 37, 10, 4, chunk=16, block_d=8)

    def test_multi_dblock(self):
        _grad_parity(1, 32, 24, 4, chunk=16, block_d=8)

    def test_bf16_inputs(self):
        u, dt, A, B, C, D = _mk(2, 32, 8, 4)
        u16, dt16, B16, C16 = (t.astype(jnp.bfloat16) for t in (u, dt, B, C))

        def loss_k(u_, dt_, B_, C_):
            return jnp.sum(
                selective_scan_pallas_train(
                    u_, dt_, A, B_, C_, D, 16, 8, True
                ).astype(jnp.float32)
                ** 2
            )

        g = jax.grad(loss_k, argnums=(0, 1, 2, 3))(u16, dt16, B16, C16)
        assert all(gg.dtype == jnp.bfloat16 for gg in g)
        assert all(bool(jnp.all(jnp.isfinite(gg.astype(jnp.float32)))) for gg in g)


def test_mamba_block_grad_parity():
    """Whole MambaBlock: jax.grad through the pallas path matches the XLA
    path (fp32, same params)."""
    from bayer_low_light_image_enhancement_tpu.ops.ssm import MambaBlock

    x = jnp.asarray(RNG.standard_normal((2, 48, 16)) * 0.5, jnp.float32)
    blk_x = MambaBlock(d_model=16, d_state=4, expand=2, use_pallas=False)
    blk_p = MambaBlock(d_model=16, d_state=4, expand=2, use_pallas=True)
    params = blk_x.init(jax.random.PRNGKey(0), x)["params"]

    loss_x = lambda p, xx: jnp.sum(blk_x.apply({"params": p}, xx) ** 2)
    loss_p = lambda p, xx: jnp.sum(blk_p.apply({"params": p}, xx) ** 2)

    gx, gxx = jax.grad(loss_x, argnums=(0, 1))(params, x)
    gp, gpx = jax.grad(loss_p, argnums=(0, 1))(params, x)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gx)[0],
        jax.tree_util.tree_flatten_with_path(gp)[0],
    ):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.abs(a).max() + 1e-6
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        assert np.abs(a - b).max() / scale < 1e-3, name
    np.testing.assert_allclose(np.asarray(gpx), np.asarray(gxx), atol=1e-3)
