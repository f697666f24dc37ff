"""Pallas selective-scan kernel vs the sequential reference (interpret mode).

Covers the CUDA mamba_ssm replacement (SURVEY.md §2.4 N1; reference use at
``/root/reference/RawFomer_WFB_FFAB/model.py:146-172``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.kernels.ssm_scan import (
    selective_scan_pallas,
)
from bayer_low_light_image_enhancement_tpu.ops.ssm import (
    MambaBlock,
    selective_scan_ref,
)

RNG = np.random.default_rng(11)


def _random_case(b, L, d, n):
    u = jnp.asarray(RNG.standard_normal((b, L, d)), jnp.float32)
    dt = jax.nn.softplus(jnp.asarray(RNG.standard_normal((b, L, d)), jnp.float32))
    A = -jnp.exp(jnp.asarray(RNG.standard_normal((d, n)), jnp.float32) * 0.3)
    B = jnp.asarray(RNG.standard_normal((b, L, n)), jnp.float32)
    C = jnp.asarray(RNG.standard_normal((b, L, n)), jnp.float32)
    D = jnp.asarray(RNG.standard_normal((d,)), jnp.float32)
    return u, dt, A, B, C, D


@pytest.mark.parametrize(
    "b,L,d,n,chunk",
    [
        (2, 64, 24, 8, 16),     # multi-chunk carry
        (1, 200, 96, 32, 128),  # L padding (200 -> 256)
        (2, 96, 130, 32, 64),   # D padding (130 -> 2 blocks of 128)
    ],
)
def test_matches_sequential_reference(b, L, d, n, chunk):
    u, dt, A, B, C, D = _random_case(b, L, d, n)
    ref = selective_scan_ref(u, dt, A, B, C, D)
    got = selective_scan_pallas(u, dt, A, B, C, D, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_causality():
    u, dt, A, B, C, _ = _random_case(1, 64, 16, 8)
    u2 = u.at[:, 40:].add(100.0)
    y1 = np.asarray(selective_scan_pallas(u, dt, A, B, C, chunk=16))
    y2 = np.asarray(selective_scan_pallas(u2, dt, A, B, C, chunk=16))
    np.testing.assert_allclose(y1[:, :40], y2[:, :40], rtol=1e-5, atol=1e-5)
    assert np.abs(y1[:, 40:] - y2[:, 40:]).max() > 1e-3


def test_mamba_block_use_pallas_flag():
    """MambaBlock(use_pallas=True) dispatches to the kernel and agrees with
    the XLA path (the VERDICT-flagged dead import is now real)."""
    x = jnp.asarray(RNG.standard_normal((2, 64, 24)), jnp.float32)
    m_x = MambaBlock(d_model=24)
    m_p = MambaBlock(d_model=24, use_pallas=True)
    params = m_x.init(jax.random.PRNGKey(0), x)
    y_x = m_x.apply(params, x)
    y_p = m_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=2e-5, atol=2e-5)
