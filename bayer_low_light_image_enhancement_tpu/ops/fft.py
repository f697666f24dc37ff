"""Frequency-domain enhancement blocks (FEB / ProcessBlock / FFAB).

Reference: ``/root/reference/RawFomer_WFB_FFAB/blocks.py:11-92``. FEB runs an
rfft2 (ortho) over the spatial axes, processes magnitude and phase through
separate 1x1-conv stacks, recomposes the complex spectrum and inverse
transforms, with the reference's stabilisation clamps (+-10 on the signal,
[0, 1e4] on magnitude). FFAB is six ProcessBlocks in a dense topology with
channel-doubling concats.

TPU notes: XLA's TPU FFT computes in fp32; the mag/phase nonlinearity breaks
fusion anyway (SURVEY.md §7 hard parts), so this block is an explicit fp32
island — inputs are upcast once, processed, and cast back.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from typing import Optional

from bayer_low_light_image_enhancement_tpu.models.common import Conv2d
from bayer_low_light_image_enhancement_tpu.ops.conv import leaky_relu, spatial_axes

Dtype = Any


class FEB(nn.Module):
    """Frequency Enhancement Block (blocks.py:11-39), NHWC.

    ``spatial_axis``: under spatially-sharded inference the FFT needs the
    whole image; the block all-gathers its (small, LL-band-resolution) input
    along the sharded axes, runs the spectrum pipeline replicated, and
    slices its own shard of the inverse transform back out. The 1x1 convs
    before/after stay local. A transpose-based distributed FFT would avoid
    the replicated compute; at LL-band sizes the gather is the simpler
    exact answer.
    """

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kw = dict(dtype=jnp.float32, param_dtype=self.param_dtype)

        x = jnp.clip(x.astype(jnp.float32), -10.0, 10.0)
        pre = Conv2d(c, 1, name="fpre", **kw)(x)

        h_ax, w_ax = spatial_axes(self.spatial_axis)
        h_local, w_local = pre.shape[1], pre.shape[2]
        if h_ax is not None:
            pre = jax.lax.all_gather(pre, h_ax, axis=1, tiled=True)
        if w_ax is not None:
            pre = jax.lax.all_gather(pre, w_ax, axis=2, tiled=True)
        h, w = pre.shape[1], pre.shape[2]
        # norm="ortho" applied manually with Python-float constants:
        # jnp's norm= path eagerly dispatches an integer reduce-prod at trace
        # time, which this TPU backend doesn't implement as a
        # standalone op.
        ortho = 1.0 / float(np.sqrt(h * w))
        freq = jnp.fft.rfft2(pre, axes=(1, 2)) * ortho
        # The DC/Nyquist bins of a real signal are structurally real, but FFT
        # backends emit tiny +-eps imaginary parts there, flipping angle()
        # between ~+-pi nondeterministically (and making its gradient blow
        # up). Snap near-real bins to exactly real with +0 imaginary so the
        # branch-cut phase is deterministically +pi.
        re = jnp.real(freq)
        im = jnp.imag(freq)
        im = jnp.where(jnp.abs(im) <= 1e-6 * (jnp.abs(re) + 1e-12), 0.0, im)
        freq = jax.lax.complex(re, im)
        mag = jnp.abs(freq) + 1e-6
        pha = jnp.angle(freq)

        mag = Conv2d(c, 1, name="process1_0", **kw)(mag)
        mag = leaky_relu(mag, 0.1)
        mag = Conv2d(c, 1, name="process1_1", **kw)(mag)
        mag = jnp.clip(mag, 0.0, 1e4)

        pha = Conv2d(c, 1, name="process2_0", **kw)(pha)
        pha = leaky_relu(pha, 0.1)
        pha = Conv2d(c, 1, name="process2_1", **kw)(pha)

        # Recompose via cos/sin (reference blocks.py:32-34; also avoids
        # complex exp, which this TPU backend doesn't implement).
        spec = jax.lax.complex(mag * jnp.cos(pha), mag * jnp.sin(pha))
        # ortho inverse == backward inverse (1/N) scaled by sqrt(N).
        out = jnp.fft.irfft2(spec, s=(h, w), axes=(1, 2)) * float(np.sqrt(h * w))
        if h_ax is not None:
            out = jax.lax.dynamic_slice_in_dim(
                out, jax.lax.axis_index(h_ax) * h_local, h_local, axis=1
            )
        if w_ax is not None:
            out = jax.lax.dynamic_slice_in_dim(
                out, jax.lax.axis_index(w_ax) * w_local, w_local, axis=2
            )
        out = jnp.clip(out + x, -10.0, 10.0)
        return out.astype(self.dtype)


class ProcessBlock(nn.Module):
    """FEB + 1x1 + residual (blocks.py:41-55)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = FEB(dtype=self.dtype, param_dtype=self.param_dtype,
                spatial_axis=self.spatial_axis, name="frequency_process")(x)
        y = Conv2d(c, 1, name="cat", dtype=self.dtype, param_dtype=self.param_dtype)(y)
        return y + x


class FFAB(nn.Module):
    """Frequency-domain dense block (blocks.py:59-92)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    spatial_axis: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  spatial_axis=self.spatial_axis)

        x = Conv2d(c, 1, name="conv0_pre", **kw)(x)
        x = ProcessBlock(name="conv0", **kw)(x)
        x1 = ProcessBlock(name="conv1", **kw)(x)
        x2 = ProcessBlock(name="conv2", **kw)(x1)
        x3 = ProcessBlock(name="conv3", **kw)(x2)
        x4 = ProcessBlock(name="conv4_pb", **kw)(jnp.concatenate([x2, x3], axis=-1))
        x4 = Conv2d(c, 1, name="conv4_reduce", **kw)(x4)
        x5 = ProcessBlock(name="conv5_pb", **kw)(jnp.concatenate([x1, x4], axis=-1))
        x5 = Conv2d(c, 1, name="conv5_reduce", **kw)(x5)
        out = ProcessBlock(name="convout_pb", **kw)(jnp.concatenate([x, x5], axis=-1))
        return Conv2d(c, 1, name="convout_reduce", **kw)(out)
