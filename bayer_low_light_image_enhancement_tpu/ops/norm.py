"""Channel LayerNorm for NHWC feature maps.

The reference normalises over the channel axis of [B,C,H,W] by rearranging to
[B,HW,C] and back (``/root/reference/RawFomer_WFB_FFAB/model.py:125-135``,
``to_3d``/``to_4d``). In NHWC the channel axis is already innermost, so this
is a plain last-axis LayerNorm — no data movement at all, and the reduction
vectorises over the 128-lane axis on the VPU.

Matches torch semantics: biased variance, eps=1e-5. Statistics always
accumulate in fp32 regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def channel_layernorm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    bias_free: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last (channel) axis.

    ``bias_free=True`` reproduces the reference's BiasFree_LayerNorm
    (``model.py:89-103``): divide by sqrt(var + eps) without mean-centering.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if bias_free:
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None and not bias_free:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)
