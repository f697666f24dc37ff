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


def spatial_axes(spatial_axis) -> tuple:
    """Normalise a spatial-sharding spec to (h_axis, w_axis).

    Accepts None, a single H mesh-axis name, or an (h_axis, w_axis) tuple
    (either entry may be None) for 2D spatial meshes.
    """
    if spatial_axis is None:
        return None, None
    if isinstance(spatial_axis, (tuple, list)):
        h_ax = spatial_axis[0] if len(spatial_axis) > 0 else None
        w_ax = spatial_axis[1] if len(spatial_axis) > 1 else None
        return h_ax, w_ax
    return spatial_axis, None


def reduce_axis_names(spatial_axis, axes: Tuple[int, ...]) -> tuple:
    """Mesh-axis names a reduction over tensor ``axes`` must also cross."""
    h_ax, w_ax = spatial_axes(spatial_axis)
    return tuple(
        a for a, d in ((h_ax, 1), (w_ax, 2)) if a is not None and d in axes
    )


def gather_spatial(t: jnp.ndarray, spatial_axis, axis: int) -> jnp.ndarray:
    """All-gather ``t`` along every sharded spatial mesh axis, stacking into
    tensor dim ``axis`` (the token dim for gather-kv attention — which is
    permutation-invariant in keys, so gathered token order is irrelevant)."""
    for ax in spatial_axes(spatial_axis):
        if ax is not None:
            t = lax.all_gather(t, ax, axis=axis, tiled=True)
    return t


def halo_pad(x: jnp.ndarray, halo: int, spatial_axis: str, dim: int = 1) -> jnp.ndarray:
    """Exchange ``halo`` boundary rows (``dim=1``) or columns (``dim=2``)
    with spatial-mesh neighbours.

    Must be called inside ``shard_map`` with ``spatial_axis`` a mesh axis.
    Returns x with ``halo`` received rows/cols stacked before and after
    (zeros at the global edges — ppermute semantics).
    """
    if halo <= 0:
        return x
    n = lax.axis_size(spatial_axis)
    down = [(i, i + 1) for i in range(n - 1)]  # my bottom rows -> next dev's top
    up = [(i + 1, i) for i in range(n - 1)]    # my top rows -> prev dev's bottom
    size = x.shape[dim]
    top_halo = lax.ppermute(
        lax.slice_in_dim(x, size - halo, size, axis=dim), spatial_axis, down
    )
    bot_halo = lax.ppermute(lax.slice_in_dim(x, 0, halo, axis=dim), spatial_axis, up)
    return jnp.concatenate([top_halo, x, bot_halo], axis=dim)


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    groups: int = 1,
    spatial_axis: Optional[str] = None,
    dilation: int = 1,
) -> jnp.ndarray:
    """2D conv, NHWC x HWIO -> NHWC, torch ``padding=(eff_k-1)//2`` semantics
    (symmetric zero pad; identical to XLA SAME at stride 1 for the odd
    kernels used throughout, and matching torch — not SAME's asymmetric
    (0, 1) split — for strided convs). ``eff_k = dilation*(k-1)+1``.

    ``spatial_axis`` switches on halo exchange for sharded execution: we
    exchange the full ``(eff_k-1)//2`` halo, trim it to the (pt, pb) rows the
    local outputs actually consume (global-edge halos arrive as ppermute
    zeros == the pad zeros), and run VALID.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    eff_kh = dilation * (kh - 1) + 1
    eff_kw = dilation * (kw - 1) + 1
    h_ax, w_ax = spatial_axes(spatial_axis)
    slice_back = []  # (dim, mesh_axis, local_size) for gathered axes

    def _shard_axis(x, dim, ax, eff_k):
        """Returns (x, pad_pair) for one sharded axis."""
        size = x.shape[dim]
        halo = (eff_k - 1) // 2
        if halo >= size:
            # Halo exceeds the local extent (tiny bottleneck maps):
            # single-hop ppermute can't supply it; gather the whole axis,
            # conv SAME there, slice own part back out.
            slice_back.append((dim, ax, size // stride if stride > 1 else size))
            return lax.all_gather(x, ax, axis=dim, tiled=True), None
        if size % stride:
            raise ValueError(
                f"sharded conv needs local extent {size} divisible by "
                f"stride {stride}"
            )
        # torch padding=(eff_k-1)//2 semantics (see conv2d docstring): output
        # o consumes rows [o*s - pt, o*s - pt + eff_k); the last local output
        # extends pb = eff_k - stride - pt rows past the shard (negative pb
        # trims unused bottom rows).
        pt = (eff_k - 1) // 2
        pb = eff_k - stride - pt
        x = halo_pad(x, halo, ax, dim=dim)
        x = lax.slice_in_dim(x, halo - pt, halo + size + pb, axis=dim)
        return x, (0, 0)

    if h_ax is not None or w_ax is not None:
        pad_h = None
        pad_w = None
        if h_ax is not None:
            x, pad_h = _shard_axis(x, 1, h_ax, eff_kh)
        if w_ax is not None:
            x, pad_w = _shard_axis(x, 2, w_ax, eff_kw)

        if pad_h is None:
            pad_h = ((eff_kh - 1) // 2,) * 2
        if pad_w is None:
            pad_w = ((eff_kw - 1) // 2,) * 2
        padding = (pad_h, pad_w)
    elif stride == 1:
        # SAME == torch's symmetric padding=(eff_k-1)//2 for the odd kernels
        # used throughout.
        padding = "SAME"
    else:
        # Strided convs: XLA SAME splits the (eff_k - stride) pad as
        # (total//2 floor, ceil) = (0, 1) for k=3/s=2, while torch
        # Conv2d(padding=1) pads symmetrically — a one-pixel tap shift.
        # Use torch semantics (reference parity); output sizes agree.
        padding = (((eff_kh - 1) // 2,) * 2, ((eff_kw - 1) // 2,) * 2)
    # Output dtype == operand dtype: the MXU accumulates bf16 convs in fp32
    # internally, and keeping the primitive homogeneous keeps its transpose
    # (backward) rule homogeneous too.
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if slice_back:
        for dim, ax, size in slice_back:
            y = lax.dynamic_slice_in_dim(
                y, lax.axis_index(ax) * size, size, axis=dim
            )
    return y


def global_mean(
    x: jnp.ndarray,
    axes: Tuple[int, ...],
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Mean over ``axes``; if H/W (axes 1/2) are sharded, reduce across
    chips too."""
    m = jnp.mean(x, axis=axes, keepdims=True)
    names = reduce_axis_names(spatial_axis, axes)
    if names:
        m = lax.pmean(m, names)
    return m


def global_max(
    x: jnp.ndarray,
    axes: Tuple[int, ...],
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    m = jnp.max(x, axis=axes, keepdims=True)
    names = reduce_axis_names(spatial_axis, axes)
    if names:
        m = lax.pmax(m, names)
    return m


def global_min(
    x: jnp.ndarray,
    axes: Tuple[int, ...],
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    m = jnp.min(x, axis=axes, keepdims=True)
    names = reduce_axis_names(spatial_axis, axes)
    if names:
        m = lax.pmin(m, names)
    return m
