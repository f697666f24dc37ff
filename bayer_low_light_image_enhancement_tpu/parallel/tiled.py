"""Spatially-sharded full-resolution inference (halo-exchange tiling).

The reference feeds whole 4240x2832 Sony frames through the model
monolithically at batch 1 (``/root/reference/test.py:72,107-116``). The TPU
answer — SURVEY.md §5 "long-context" analogue — shards the image H axis
across chips with ``jax.shard_map``:

* stride-1 convs exchange boundary rows with mesh neighbours
  (``lax.ppermute`` halos, ops/conv.py);
* channel attention's token-global reductions (q/k L2 norms and the [c,c]
  gram) become local partials + ``psum`` (ops/attention.py);
* per-image global reductions (SE pools, luma max, color anchors) become
  ``pmean``/``pmax`` (ops/conv.py, ops/luma.py).

Because halo rows at the global edges arrive as zeros (ppermute semantics ==
SAME zero padding), the sharded forward is numerically identical to the
monolithic one in fp32 — verified by tests/test_sharding.py.

Constraints: per-shard H must be divisible by 16 (one space_to_depth + three
downsamples); use :func:`pad_to_tile` for arbitrary frames.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayer_low_light_image_enhancement_tpu.core.mesh import AXES


def pad_to_tile(x: np.ndarray, n_shards: int, multiple: int = 16) -> Tuple[np.ndarray, int]:
    """Pad H so that it divides into n_shards shards of size % multiple == 0.

    Returns (padded, original_h).
    """
    h = x.shape[1]
    tile = n_shards * multiple
    pad = (-h) % tile
    if pad:
        x = np.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return x, h


def make_tiled_forward(
    model,
    mesh: Mesh,
    spatial_axis: str = AXES.spatial,
    spatial_w_axis: str = None,
    clip01: bool = True,
):
    """Build a jitted H-sharded (optionally HxW-sharded) forward for a model
    constructed with ``spatial_axis=<axis>`` (or ``(h_axis, w_axis)``) in
    its config.

    Returns ``fn(variables, x)`` where x is [B, H, W, C] with per-shard H
    (and W, if sharded) divisible by 16; the result is fully replicated
    [B, H, W, 3].
    """
    xspec = (
        P(None, spatial_axis, spatial_w_axis) if spatial_w_axis
        else P(None, spatial_axis)
    )
    in_specs = (P(), xspec)
    out_specs = xspec

    def local_forward(variables, x_local):
        y = model.apply(variables, x_local, train=False)
        if clip01:
            y = jnp.clip(y, 0.0, 1.0)
        return y

    sharded = jax.shard_map(
        local_forward, mesh=mesh, in_specs=in_specs, out_specs=out_specs
    )

    @jax.jit
    def fn(variables, x):
        return sharded(variables, x)

    return fn


def shard_image(x, mesh: Mesh, spatial_axis: str = AXES.spatial,
                spatial_w_axis: str = None):
    """Place [B, H, W, C] with H (and optionally W) sharded over the
    spatial mesh axes."""
    spec = (
        P(None, spatial_axis, spatial_w_axis) if spatial_w_axis
        else P(None, spatial_axis)
    )
    return jax.device_put(x, NamedSharding(mesh, spec))
