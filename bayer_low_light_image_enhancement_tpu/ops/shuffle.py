"""Space<->depth rearrangements (NHWC).

TPU-native replacement for ``nn.PixelUnshuffle``/``nn.PixelShuffle`` and the
reference's ``downshuffle`` (``/root/reference/RawFomer_WFB_FFAB/model.py:287-298``).
Pure reshape/transpose — XLA fuses these into neighbouring convs, so they are
free on TPU (no gather, no copy in HBM when fused).

Channel ordering matches torch so that ported ``.pth`` weights line up:
``space_to_depth`` output channel index is ``c * r*r + i * r + j`` for input
channel ``c`` and intra-block offset ``(i, j)`` (row-major); ``depth_to_space``
is its exact inverse.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/r, W/r, C*r*r] with torch PixelUnshuffle order."""
    b, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f"space_to_depth: spatial dims {(h, w)} not divisible by {r}")
    x = x.reshape(b, h // r, r, w // r, r, c)
    # -> [B, H/r, W/r, C, r_i, r_j] so channel-major (c, i, j) like torch.
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C] with torch PixelShuffle order."""
    b, h, w, crr = x.shape
    if crr % (r * r):
        raise ValueError(f"depth_to_space: channels {crr} not divisible by {r * r}")
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H, r_i, W, r_j, C]
    return x.reshape(b, h * r, w * r, c)
