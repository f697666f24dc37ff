"""Fused TransformerBlock kernel vs the module path (interpreter mode).

The kernel fuses reference semantics from
``/root/reference/RawFomer_WFB_FFAB/model.py:319-391`` (ConvFFN, channel
attention, TransformerBlock); here we compare against this repo's flax
module, which is itself parity-tested against the torch reference.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.kernels.fused_block import (
    fused_transformer_block,
)
from bayer_low_light_image_enhancement_tpu.models.common import TransformerBlock

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(43)

# Kernel computes in bf16 like the bf16 module config; the module here runs
# bf16 too, but association orders differ (folded projection) -> bf16-level
# tolerances on unit-scale activations.
TOL = dict(rtol=2.5e-2, atol=2.5e-2)


@pytest.mark.parametrize(
    "b,h,w,c,heads,th",
    [
        (1, 16, 32, 8, 2, 8),
        (2, 24, 20, 16, 4, 8),
        (1, 19, 13, 8, 2, 8),  # H not divisible by th, odd W -> masked tail
        (1, 8, 16, 8, 2, 16),  # tile taller than the image
        (1, 16, 272, 8, 2, 8),  # wide single frame -> spatial lane packing
        (1, 16, 260, 8, 2, 8),  # spatial packing with a masked W tail
        (1, 16, 272, 32, 4, 8),  # spatial packing AND merged qk (cg=128)
    ],
)
def test_matches_module_path(b, h, w, c, heads, th):
    module = TransformerBlock(num_heads=heads, dtype=jnp.bfloat16)
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32) * 0.5)
    variables = module.init(jax.random.PRNGKey(0), x)
    expected = module.apply(variables, x.astype(jnp.bfloat16))

    got = fused_transformer_block(
        x.astype(jnp.bfloat16), variables["params"], heads, tile_rows=th
    )
    assert got.shape == expected.shape
    assert got.dtype == expected.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), **TOL
    )


def test_merged_qk_geometry_matches_module():
    """The merged-qk kernel (taken when cg % 128 == 0: one [Cg, 2Cg] matmul
    + one depthwise pass with tile-aligned q/k lane halves) matches the
    module path; b=16, c=16 packs g=16 images -> cg=256 -> merged.
    (Replaces the retired `chunked` path's test — that 128-lane sub-matmul
    split measured 0.87x dense and was removed in round 3.)"""
    module = TransformerBlock(num_heads=4, dtype=jnp.bfloat16)
    x = jnp.asarray(RNG.standard_normal((16, 16, 16, 16)).astype(np.float32) * 0.5)
    variables = module.init(jax.random.PRNGKey(0), x)
    xb = x.astype(jnp.bfloat16)
    expected = module.apply(variables, xb)
    got = fused_transformer_block(xb, variables["params"], 4, tile_rows=8)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), **TOL
    )


def test_w_tiling_matches_whole_w():
    """Explicit tile_cols (the wide-frame VMEM guard) is numerically
    identical to whole-W tiles."""
    module = TransformerBlock(num_heads=2, dtype=jnp.bfloat16)
    x = jnp.asarray(RNG.standard_normal((2, 16, 40, 8)).astype(np.float32) * 0.5)
    variables = module.init(jax.random.PRNGKey(0), x)
    whole = fused_transformer_block(x.astype(jnp.bfloat16), variables["params"], 2)
    tiled = fused_transformer_block(
        x.astype(jnp.bfloat16), variables["params"], 2, tile_cols=16
    )
    np.testing.assert_allclose(
        np.asarray(tiled, np.float32), np.asarray(whole, np.float32), **TOL
    )


def test_fused_apply_interceptor():
    """fused_apply routes every TransformerBlock through the kernel and
    matches plain apply on the full canonical model."""
    from bayer_low_light_image_enhancement_tpu.models.fused_apply import fused_apply
    from bayer_low_light_image_enhancement_tpu.models.rawformer import (
        RawFormer,
        RawFormerConfig,
    )

    cfg = RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2), dtype=jnp.bfloat16)
    model = RawFormer(cfg)
    x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    expected = model.apply(variables, x)
    got = fused_apply(model, variables, x, tile_rows=4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), **TOL
    )


@pytest.mark.parametrize("bands", [4, 8])
def test_banded_forward_matches_monolithic(bands):
    """H-band streaming (the single-chip full-res path, round 5) is
    numerically identical to the monolithic forward: H-bands ride the
    batch axis, spatial convs see neighbour-band halo rows, and the
    attention kernel fills its windows from neighbour bands and sums each
    frame's gram across its bands. Full fp32 canonical model, band
    heights down to 1 row at the bottleneck."""
    from bayer_low_light_image_enhancement_tpu.models.fused_apply import (
        make_banded_forward,
    )
    from bayer_low_light_image_enhancement_tpu.models.rawformer import (
        RawFormer,
        RawFormerConfig,
    )

    model = RawFormer(RawFormerConfig(dim=32, dtype=jnp.float32))
    x = jnp.asarray(RNG.uniform(0, 1, (1, 128, 48, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    expected = model.apply(variables, x)
    got = make_banded_forward(model, bands=bands)(variables, x)
    # The banded path's only deviation is the fused kernel's bf16 compute
    # (the XLA pieces are bit-identical): bf16-level tolerance.
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), **TOL
    )


def test_kernel_auto_band_matches_gsp(monkeypatch):
    """BAYER_TPU_BAND=1 (kernel-internal H-band lane packing at batch 1)
    matches the default W-segment spatial packing, including a frame
    height that does not divide the band count."""
    monkeypatch.setenv("BAYER_TPU_BAND", "1")
    module = TransformerBlock(num_heads=4, dtype=jnp.bfloat16)
    x = jnp.asarray(RNG.standard_normal((1, 90, 72, 32)).astype(np.float32) * 0.5)
    variables = module.init(jax.random.PRNGKey(0), x)
    xb = x.astype(jnp.bfloat16)
    banded = fused_transformer_block(xb, variables["params"], 4)
    monkeypatch.setenv("BAYER_TPU_BAND", "0")
    gsp = fused_transformer_block(xb, variables["params"], 4)
    np.testing.assert_allclose(
        np.asarray(banded, np.float32), np.asarray(gsp, np.float32), **TOL
    )
