"""Shared flax modules for the RawFormer model family (NHWC).

These are the building blocks inventoried in SURVEY.md §2.2: channel
LayerNorm, Restormer channel attention, ConvFFN, the dual-branch
ConvTransformer, and the space<->depth down/up-sampling stages. Reference
semantics come from ``/root/reference/RawFomer_WFB_FFAB/model.py`` (the
runnable canonical copy); citations on each class.

Parameter init reproduces torch ``nn.Conv2d`` defaults (kaiming-uniform with
a=sqrt(5) == U(+-1/sqrt(fan_in)) for kernel and bias) so training dynamics
match the reference.

Every module takes:
  * ``dtype``       — compute dtype (bf16 on TPU).
  * ``param_dtype`` — parameter storage dtype (fp32).
  * ``spatial_axis``— optional mesh-axis name; when set, convs halo-exchange
                      and attention psums across H-sharded chips.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.ops import conv as conv_ops
from bayer_low_light_image_enhancement_tpu.ops.attention import channel_attention
from bayer_low_light_image_enhancement_tpu.ops.norm import channel_layernorm
from bayer_low_light_image_enhancement_tpu.ops.shuffle import depth_to_space, space_to_depth

Dtype = Any


def torch_uniform_init(fan_in: int) -> Callable:
    """torch nn.Conv2d default: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """NHWC conv with HWIO kernel, SAME padding, optional halo exchange."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    dilation: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = (in_ch // self.groups) * k * k
        kernel = self.param(
            "kernel",
            torch_uniform_init(fan_in),
            (k, k, in_ch // self.groups, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", torch_uniform_init(fan_in), (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        return conv_ops.conv2d(
            x,
            kernel,
            bias,
            stride=self.stride,
            groups=self.groups,
            spatial_axis=self.spatial_axis,
            dilation=self.dilation,
        )


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NHWC maps (torch nn.LayerNorm semantics, eps 1e-5).

    ``bias_free=True`` gives the Restormer BiasFree variant
    (``RawFomer_WFB_FFAB/model.py:89-103``).
    """

    bias_free: bool = False
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        bias = (
            None
            if self.bias_free
            else self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        )
        return channel_layernorm(x, weight, bias, eps=self.eps, bias_free=self.bias_free)


class ChannelAttention(nn.Module):
    """Transposed (channel) attention, ``RawFomer_WFB_FFAB/model.py:338-370``:
    qkv 1x1 conv -> 3x3 depthwise -> per-head L2-normalised [c,c] gram ->
    softmax * learnable temperature -> apply to v -> 1x1 projection."""

    num_heads: int = 8
    use_bias: bool = True
    # BayerTORGBColorMultiLvl.py:328-352 stores log(T) (zero-init) and
    # exponentiates; the canonical Attention stores T directly (ones-init).
    log_temperature: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=self.spatial_axis)
        qkv = Conv2d(dim * 3, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv2d(
            dim * 3, 3, groups=dim * 3, use_bias=self.use_bias, name="qkv_dwconv", **kw
        )(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.log_temperature:
            temperature = jnp.exp(
                self.param(
                    "log_temperature",
                    nn.initializers.zeros,
                    (self.num_heads,),
                    self.param_dtype,
                )
            )
        else:
            temperature = self.param(
                "temperature", nn.initializers.ones, (self.num_heads,), self.param_dtype
            )
        out = channel_attention(q, k, v, temperature, self.num_heads, self.spatial_axis)
        return Conv2d(dim, 1, use_bias=self.use_bias, name="project_out", **kw)(out)


class ConvFFN(nn.Module):
    """Feed-forward with depthwise conv (``RawFomer_WFB_FFAB/model.py:319-336``):
    1x1 expand -> 3x3 depthwise -> GELU (exact, torch default) -> 1x1 project."""

    hidden_features: int
    out_features: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_features = self.out_features or x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=self.spatial_axis)
        x = Conv2d(self.hidden_features, 1, name="pointwise1", **kw)(x)
        x = Conv2d(
            self.hidden_features, 3, groups=self.hidden_features, name="depthwise", **kw
        )(x)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(self.dtype)
        return Conv2d(out_features, 1, name="pointwise2", **kw)(x)


class TransformerBlock(nn.Module):
    """Pre-LN residual block (``RawFomer_WFB_FFAB/model.py:372-391``)."""

    num_heads: int = 8
    ffn_expansion: int = 2
    log_temperature: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=self.spatial_axis)
        x = x + ChannelAttention(num_heads=self.num_heads,
                                 log_temperature=self.log_temperature,
                                 name="attn", **kw)(
            LayerNorm2d(name="norm1", param_dtype=self.param_dtype)(x).astype(self.dtype)
        )
        x = x + ConvFFN(hidden_features=dim * self.ffn_expansion, name="ffn", **kw)(
            LayerNorm2d(name="norm2", param_dtype=self.param_dtype)(x).astype(self.dtype)
        )
        return x


class ConvTransformer(nn.Module):
    """Dual-branch stage (``RawFomer_WFB_FFAB/model.py:394-412``, the
    channel-attention original): 3x3 conv + LeakyReLU branch in parallel with
    a transformer branch -> concat -> 1x1 reduce -> 3x3 + LeakyReLU.

    ``inner`` lets variants swap the transformer branch (WMB, FLCA, ...)."""

    num_heads: int = 8
    ffn_expansion: int = 2
    inner: Optional[Callable[[], nn.Module]] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *inner_args) -> jnp.ndarray:
        dim = x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, spatial_axis=self.spatial_axis)
        conv = conv_ops.leaky_relu(Conv2d(dim, 3, name="conv", **kw)(x), 0.2)
        if self.inner is not None:
            trans = self.inner()(x, *inner_args)
        else:
            trans = TransformerBlock(
                num_heads=self.num_heads,
                ffn_expansion=self.ffn_expansion,
                name="transformer",
                **kw,
            )(x)
        y = jnp.concatenate([conv, trans], axis=-1)
        y = Conv2d(dim, 1, name="channel_reduce", **kw)(y)
        return conv_ops.leaky_relu(Conv2d(dim, 3, name="conv_out", **kw)(y), 0.2)


class Downsample(nn.Module):
    """3x3 conv dim->dim/2 then space_to_depth(2) => net 2x channels at H/2
    (``RawFomer_WFB_FFAB/model.py:300-307``; conv bias-free as in reference)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        x = Conv2d(
            dim // 2,
            3,
            use_bias=False,
            name="conv",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            spatial_axis=self.spatial_axis,
        )(x)
        return space_to_depth(x, 2)


class Upsample2x(nn.Module):
    """2x upsampling, equivalent to torch ConvTranspose2d(k=2, s=2) but
    expressed as a 1x1 conv to 4x channels + depth_to_space — a single dense
    MXU matmul instead of a strided scatter conv.

    Weight mapping from a torch transposed kernel W_t[C_in, C_out, di, dj]:
    our 1x1 kernel column index is ``o * 4 + di * 2 + dj``.
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        # torch ConvTranspose2d init: U(+-1/sqrt(fan_in)), fan_in = C_in * k * k
        # per output-channel group (k=2).
        fan_in = in_ch * 4
        kernel = self.param(
            "kernel",
            torch_uniform_init(fan_in),
            (1, 1, in_ch, self.features * 4),
            self.param_dtype,
        )
        bias_full = self.param(
            "bias", torch_uniform_init(fan_in), (self.features,), self.param_dtype
        )
        y = conv_ops.conv2d(
            x.astype(self.dtype), kernel, None, spatial_axis=self.spatial_axis
        )
        y = depth_to_space(y, 2)
        return y + bias_full.astype(y.dtype)
