"""Haar discrete wavelet transforms (NHWC), in the reference's two flavours.

1. **Batch-stacked** (``haar_dwt_stack``/``haar_iwt_stack``): semantics of
   ``/root/reference/RawFomer_WFB_FFAB/blocks.py:102-154`` (``dwt_init`` /
   ``iwt_init``) — the four subbands are concatenated along the *batch* axis
   as [LL; HL; LH; HH], each [B, H/2, W/2, C], so downstream blocks can slice
   LL vs high-frequency parts by batch. Implemented as strided slicing +
   adds; XLA fuses these into the neighbouring ops — no conv needed for a
   fixed Haar kernel.

2. **Filter-bank** (``haar_dwt_fb``/``haar_iwt_fb``): semantics of the
   orthogonal HaarDWT used by the FLCA variants
   (``/root/reference/FrequencyawareLumaChromaAttentionRAWFormer.py:39-73``):
   orthonormal 2x2 Haar (coefficients 0.5), returning (LL, (LH, HL, HH))
   stacked on a new subband axis, with reflect padding for odd sizes.

Both satisfy exact round-trip reconstruction (the reference README's one
stated correctness oracle, ``README.md:148-170``): iwt(dwt(x)) == x to fp32
rounding.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _quad_split(x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Return the 4 polyphase components /2 following dwt_init's naming:
    x1=(even rows, even cols), x2=(odd rows, even cols),
    x3=(even rows, odd cols), x4=(odd rows, odd cols)."""
    x = x * 0.5
    x1 = x[:, 0::2, 0::2, :]
    x2 = x[:, 1::2, 0::2, :]
    x3 = x[:, 0::2, 1::2, :]
    x4 = x[:, 1::2, 1::2, :]
    return x1, x2, x3, x4


def haar_dwt_stack(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [4B, H/2, W/2, C] stacked [LL; HL; LH; HH] on batch."""
    x1, x2, x3, x4 = _quad_split(x)
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=0)


def haar_iwt_stack(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`haar_dwt_stack`: [4B, h, w, C] -> [B, 2h, 2w, C]."""
    b4, h, w, c = x.shape
    if b4 % 4:
        raise ValueError(f"batch {b4} not divisible by 4")
    b = b4 // 4
    x1 = x[0 * b : 1 * b] * 0.5
    x2 = x[1 * b : 2 * b] * 0.5
    x3 = x[2 * b : 3 * b] * 0.5
    x4 = x[3 * b : 4 * b] * 0.5
    ee = x1 - x2 - x3 + x4  # even rows, even cols
    oe = x1 - x2 + x3 - x4  # odd rows,  even cols
    eo = x1 + x2 - x3 - x4  # even rows, odd cols
    oo = x1 + x2 + x3 + x4  # odd rows,  odd cols
    # Interleave: [B,h,w,C] quadruple -> [B,2h,2w,C].
    rows_e = jnp.stack([ee, eo], axis=3).reshape(b, h, 2 * w, c)
    rows_o = jnp.stack([oe, oo], axis=3).reshape(b, h, 2 * w, c)
    return jnp.stack([rows_e, rows_o], axis=2).reshape(b, 2 * h, 2 * w, c)


def haar_dwt_fb(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal Haar: [B,H,W,C] -> (LL, highs) with highs [B,h,w,C,3]
    ordered (LH, HL, HH). Odd H/W are reflect-padded by one (reference
    ``HaarDWT`` :63-66)."""
    b, h, w, c = x.shape
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    x1, x2, x3, x4 = _quad_split(x)  # already scaled by 0.5 => orthonormal
    # Signs follow the reference filter bank (LL=outer(h,h), LH=outer(h,g),
    # HL=outer(g,h), HH=outer(g,g) with h=[1,1]/sqrt2, g=[1,-1]/sqrt2).
    ll = x1 + x2 + x3 + x4
    lh = x1 + x2 - x3 - x4  # horizontal detail (column diff)
    hl = x1 - x2 + x3 - x4  # vertical detail (row diff)
    hh = x1 - x2 - x3 + x4
    highs = jnp.stack([lh, hl, hh], axis=-1)
    return ll, highs


def haar_iwt_fb(ll: jnp.ndarray, highs: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`haar_dwt_fb` (even-sized output)."""
    lh, hl, hh = highs[..., 0], highs[..., 1], highs[..., 2]
    x1 = (ll + lh + hl + hh) * 0.5  # even, even
    x2 = (ll + lh - hl - hh) * 0.5  # odd, even
    x3 = (ll - lh + hl - hh) * 0.5  # even, odd
    x4 = (ll - lh - hl + hh) * 0.5  # odd, odd
    b, h, w, c = ll.shape
    rows_e = jnp.stack([x1, x3], axis=3).reshape(b, h, 2 * w, c)
    rows_o = jnp.stack([x2, x4], axis=3).reshape(b, h, 2 * w, c)
    return jnp.stack([rows_e, rows_o], axis=2).reshape(b, 2 * h, 2 * w, c)
