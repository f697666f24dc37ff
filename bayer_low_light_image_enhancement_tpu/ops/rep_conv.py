"""Re-parameterisable conv blocks and the WFB gated FeedForward.

Reference: ``/root/reference/RawFomer_WFB_FFAB/model.py:17-87``.

* ``Conv2dBN``: conv (bias-free) + BatchNorm, with a ``fuse()`` that folds
  BN into a single conv for inference — the reference's deploy-time
  reparameterisation trick (``model.py:27-40``).
* ``GatedFeedForward``: project_in -> x1 = x + rep3x3(x) + rep1x1(x),
  x2 = dw3x3(x); out = gelu(x2)*x1 + gelu(x1)*x2 -> project_out + identity
  (``model.py:42-65``). Depthwise-grouped rep convs, expansion 2.66 default.

BatchNorm uses flax's running-stats collection (``batch_stats``); the Trainer
threads ``train``/mutable through.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.models.common import Conv2d

Dtype = Any


class Conv2dBN(nn.Module):
    features: int
    kernel_size: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = Conv2d(
            self.features,
            self.kernel_size,
            groups=self.groups,
            use_bias=False,
            name="c",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            spatial_axis=self.spatial_axis,
        )(x)
        # BatchNorm stats are per-channel; under a spatially-sharded mesh the
        # batch statistics would need a psum — BN models are currently only
        # supported unsharded (axis_name=None), like the reference.
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="bn",
        )(y)


class GatedFeedForward(nn.Module):
    """WFB FeedForward with structural re-param branches (model.py:42-65)."""

    ffn_expansion: float = 2.66
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dim = x.shape[-1]
        hidden = int(dim * self.ffn_expansion)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=self.spatial_axis)

        identity = x
        x = Conv2d(hidden, 1, use_bias=self.use_bias, name="project_in", **kw)(x)
        x1 = (
            x
            + Conv2dBN(hidden, 3, groups=hidden, name="rep_conv1", **kw)(x, train)
            + Conv2dBN(hidden, 1, groups=hidden, name="rep_conv2", **kw)(x, train)
        )
        x2 = Conv2d(hidden, 3, groups=hidden, use_bias=self.use_bias, name="dwconv", **kw)(x)
        g1 = jax.nn.gelu(x2.astype(jnp.float32), approximate=False).astype(x2.dtype)
        g2 = jax.nn.gelu(x1.astype(jnp.float32), approximate=False).astype(x1.dtype)
        x = g1 * x1 + g2 * x2
        x = Conv2d(dim, 1, use_bias=self.use_bias, name="project_out", **kw)(x)
        return x + identity


def fuse_conv_bn(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold BN into conv weights (reference Conv2d_BN.fuse, model.py:27-40).

    conv_kernel: HWIO. Returns (fused_kernel, fused_bias).
    """
    w = bn_scale / jnp.sqrt(bn_var + eps)
    fused_kernel = conv_kernel * w[None, None, None, :]
    fused_bias = bn_bias - bn_mean * w
    return fused_kernel, fused_bias
