"""Fused channel-attention kernel vs the module path (interpreter mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.kernels.fused_attention import (
    fused_channel_attention,
)
from bayer_low_light_image_enhancement_tpu.models.common import ChannelAttention

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(43)


# The kernel computes its conv math in bf16 (like the bf16 module config);
# compare against the fp32 module at bf16-level tolerances.
TOL = dict(rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("b,h,w,c,heads,th", [(1, 16, 32, 8, 2, 8), (2, 32, 16, 16, 4, 8)])
def test_matches_module_path(b, h, w, c, heads, th):
    module = ChannelAttention(num_heads=heads)
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    expected = module.apply(variables, x)

    p = variables["params"]
    got = fused_channel_attention(
        x,
        p["qkv"]["kernel"], p["qkv"]["bias"],
        p["qkv_dwconv"]["kernel"], p["qkv_dwconv"]["bias"],
        p["project_out"]["kernel"], p["project_out"]["bias"],
        p["temperature"], heads, tile_rows=th,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), **TOL)


def test_uneven_tile_fallback():
    # h=24 with tile_rows=32 -> th reduces to a divisor of 24.
    module = ChannelAttention(num_heads=2)
    x = jnp.asarray(RNG.standard_normal((1, 24, 16, 8)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    expected = module.apply(variables, x)
    p = variables["params"]
    got = fused_channel_attention(
        x,
        p["qkv"]["kernel"], p["qkv"]["bias"],
        p["qkv_dwconv"]["kernel"], p["qkv_dwconv"]["bias"],
        p["project_out"]["kernel"], p["project_out"]["bias"],
        p["temperature"], 2, tile_rows=32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), **TOL)
