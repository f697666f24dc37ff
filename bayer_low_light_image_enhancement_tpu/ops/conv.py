"""NHWC convolution primitives with optional cross-chip halo exchange.

Single-chip path: ``lax.conv_general_dilated`` with SAME padding — XLA maps
this onto the MXU and fuses the surrounding elementwise ops.

Spatially-sharded path (full-resolution tiled inference over a ``spatial``
mesh axis, the TPU answer to the reference's monolithic 4240x2832 frames at
``/root/reference/test.py:107-116``): images are sharded along H inside
``shard_map``; each stride-1 conv exchanges its ``(kh-1)//2`` boundary rows
with mesh neighbours via ``lax.ppermute``. Devices at the global image edge
receive zeros from ppermute, which is exactly SAME zero padding, so sharded
and unsharded results are bit-identical in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def halo_pad(x: jnp.ndarray, halo: int, spatial_axis: str) -> jnp.ndarray:
    """Exchange ``halo`` boundary rows with spatial-mesh neighbours.

    Must be called inside ``shard_map`` with ``spatial_axis`` a mesh axis.
    Returns x with ``halo`` received rows stacked above and below (zeros at
    the global top/bottom edges — ppermute semantics).
    """
    if halo <= 0:
        return x
    n = lax.axis_size(spatial_axis)
    down = [(i, i + 1) for i in range(n - 1)]  # my bottom rows -> next dev's top
    up = [(i + 1, i) for i in range(n - 1)]    # my top rows -> prev dev's bottom
    top_halo = lax.ppermute(x[:, -halo:], spatial_axis, down)
    bot_halo = lax.ppermute(x[:, :halo], spatial_axis, up)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    groups: int = 1,
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """2D conv, NHWC x HWIO -> NHWC, SAME padding.

    ``spatial_axis`` switches on halo exchange for H-sharded execution
    (stride must be 1 in that mode; the model family only uses stride-1
    spatial convs — down/upsampling is space<->depth, which stays local).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if spatial_axis is not None:
        if stride != 1:
            raise ValueError("halo conv only supports stride 1")
        halo = (kh - 1) // 2
        x = halo_pad(x, halo, spatial_axis)
        padding = ((0, 0), ((kw - 1) // 2, kw // 2))
    else:
        padding = "SAME"
    # Output dtype == operand dtype: the MXU accumulates bf16 convs in fp32
    # internally, and keeping the primitive homogeneous keeps its transpose
    # (backward) rule homogeneous too.
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def global_mean(
    x: jnp.ndarray,
    axes: Tuple[int, ...],
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Mean over ``axes``; if H (axis 1) is sharded, reduce across chips too."""
    m = jnp.mean(x, axis=axes, keepdims=True)
    if spatial_axis is not None and 1 in axes:
        m = lax.pmean(m, spatial_axis)
    return m


def global_max(
    x: jnp.ndarray,
    axes: Tuple[int, ...],
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    m = jnp.max(x, axis=axes, keepdims=True)
    if spatial_axis is not None and 1 in axes:
        m = lax.pmax(m, spatial_axis)
    return m
