"""Restormer-style transposed (channel) attention — the RawFormer hot op.

Reference: ``/root/reference/RawFomer_WFB_FFAB/model.py:338-370`` and
``/root/reference/model.py:56-79``. Attention is computed over the *channel*
axis: q,k,v are reshaped to [B, heads, c, N] (N = H*W tokens, c = C/heads),
q and k are L2-normalised along tokens, and the attention map ``q @ k^T`` is
only [c, c] — O(C^2 * N) total, never O(N^2). The two matmuls are long
contractions over N, which map well onto the MXU as batched dots.

TPU optimisation: the per-row L2 normalisation is separable out of the gram,
    normalize(q) @ normalize(k)^T == (q @ k^T) / (|q_i| |k_j|),
so we compute the raw gram plus two cheap sum-of-squares reductions over the
same q/k reads and never materialise normalised q/k to HBM — one fused pass
instead of two elementwise round-trips. This matches torch F.normalize
(eps 1e-12) exactly in fp32.

Spatial sharding: every reduction over tokens (the sum-of-squares and the
gram) is global over the image, so under an H-sharded ``shard_map`` they are
local partials + one fused ``psum`` over the spatial axis. ``attn @ v`` and
the softmax are then purely local. This makes tiled full-resolution inference
numerically identical to the monolithic reference path.

All token-reductions accumulate in fp32 even in bf16 compute.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def channel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    num_heads: int,
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """q, k, v: [B, H, W, C] (post qkv+depthwise convs). Returns [B, H, W, C].

    ``temperature``: per-head scale, shape [heads] (reference keeps it as
    [heads,1,1]; broadcast is identical).
    """
    b, h, w, c = q.shape
    ch = c // num_heads
    n = h * w

    def heads_first(t):
        # [B,H,W,C] -> [B, heads, c_per_head, N]; channel splits head-major to
        # match torch's  'b (head c) h w -> b head c (h w)'.
        return t.reshape(b, n, num_heads, ch).transpose(0, 2, 3, 1)

    qh, kh, vh = heads_first(q), heads_first(k), heads_first(v)
    qf = qh.astype(jnp.float32)
    kf = kh.astype(jnp.float32)

    # Raw gram over all tokens + row sum-of-squares, one pass over q/k.
    gram = lax.dot_general(
        qf, kf, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1)))
    )  # [B, heads, c, c]
    q_ss = jnp.sum(qf * qf, axis=-1)  # [B, heads, c]
    k_ss = jnp.sum(kf * kf, axis=-1)

    if spatial_axis is not None:
        from bayer_low_light_image_enhancement_tpu.ops.conv import reduce_axis_names

        names = reduce_axis_names(spatial_axis, (1, 2))
        if names:
            gram, q_ss, k_ss = lax.psum((gram, q_ss, k_ss), names)

    # torch F.normalize: x / max(|x|, eps), eps=1e-12.
    q_inv = 1.0 / jnp.maximum(jnp.sqrt(q_ss), 1e-12)
    k_inv = 1.0 / jnp.maximum(jnp.sqrt(k_ss), 1e-12)
    attn = gram * q_inv[..., :, None] * k_inv[..., None, :]
    attn = attn * temperature.reshape(1, num_heads, 1, 1).astype(jnp.float32)
    attn = _softmax_f32(attn)

    out = lax.dot_general(
        attn.astype(vh.dtype),
        vh,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
    ).astype(v.dtype)
    # [B, heads, c, N] -> [B, H, W, C]
    out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
    return out


def _softmax_f32(x: jnp.ndarray) -> jnp.ndarray:
    x = x - lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=-1, keepdims=True)
