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

import functools
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from typing import Optional

from bayer_low_light_image_enhancement_tpu.models.common import Conv2d
from bayer_low_light_image_enhancement_tpu.ops.conv import leaky_relu, spatial_axes

Dtype = Any


def _dft_mats(n: int):
    """Real/imag DFT matrices [n, n] (full) built in float64 with EXACT
    zeros at the structurally-zero entries (the v=0 and v=n/2 sine
    columns), so the real-signal DC/Nyquist bins come out exactly real —
    the fft-path's eps-snap becomes unnecessary by construction."""
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    c = np.cos(ang)
    s = np.sin(ang)
    s[:, 0] = 0.0
    if n % 2 == 0:
        s[:, n // 2] = 0.0
    return c.astype(np.float32), s.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _rfft2_consts_np(h: int, w: int):
    ch, sh = _dft_mats(h)
    cw, sw = _dft_mats(w)
    v = w // 2 + 1
    return ch, sh, cw[:, :v], sw[:, :v]


def _rfft2_consts(h: int, w: int):
    # numpy lives in the lru_cache; the jnp conversion happens per trace
    # (device constants are cached by jit itself; caching tracers here
    # would leak them across traces).
    return tuple(jnp.asarray(m) for m in _rfft2_consts_np(h, w))


def _rfft2_dft(x, ortho):
    """norm='ortho' rfft2 over axes (1, 2) of NHWC x, as four fp32 MXU
    matmuls returning separate (re, im) planes — no complex dtype.

    The WFB FEB islands dispatch ~44 small rfft2/irfft2 round trips per
    forward; XLA's TPU FFT runs them at ~0.24 ms each IN-GRAPH (round-4
    marginal ablation, benchmarks/ablate_wfb.py) while the equivalent
    matmul FLOPs are ~2 orders cheaper at FEB's <=128^2 extents. (The
    round-2 isolated A/B that measured DFT 'neutral' was sitting on the
    standalone dispatch floor.) Matmuls contract the H/W axes directly via
    dot_general; channels stay in the lane dimension throughout.
    """
    ch, sh, cw, sw = _rfft2_consts(x.shape[1], x.shape[2])
    # Precision pinned to HIGHEST: at DEFAULT, TPU fp32 dots may lower to
    # reduced-precision bf16 passes, which would degrade the 256-length DFT
    # sums far past the measured 5e-7 FFT-path agreement.
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST)
    dn_w = (((2,), (0,)), ((), ()))   # [b,h,W,c] x [W,v] -> [b,h,c,v]
    re1 = dot(x, cw, dn_w)
    im1 = -dot(x, sw, dn_w)
    dn_h = (((1,), (0,)), ((), ()))   # [b,H,c,v] x [H,u] -> [b,c,v,u]
    yre = dot(re1, ch, dn_h) + dot(im1, sh, dn_h)
    yim = dot(im1, ch, dn_h) - dot(re1, sh, dn_h)
    # [b,c,v,u] -> [b,u,v,c]
    perm = (0, 3, 2, 1)
    return jnp.transpose(yre, perm) * ortho, jnp.transpose(yim, perm) * ortho


def _irfft2_dft(re, im, h, w, scale):
    """Inverse of ``_rfft2_dft`` (times ``scale``): expand the rfft half
    spectrum to full W via Hermitian symmetry weights folded into the
    inverse DFT matrices, then two inverse transforms as matmuls."""
    ch, sh, cw, sw = _rfft2_consts(h, w)
    v = w // 2 + 1
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST)
    # Inverse along H (full complex): z[h] = (1/H) sum_u y[u] e^{+2pi i uh/H}
    dn_h = (((1,), (1,)), ((), ()))   # [b,U,v,c] x [H,U] -> [b,v,c,H]
    zre = dot(re, ch, dn_h) - dot(im, sh, dn_h)
    zim = dot(im, ch, dn_h) + dot(re, sh, dn_h)
    # Inverse along W with Hermitian fold: x[w'] = (1/W) sum_{v'} wgt[v']
    # (zre[v'] cos - zim[v'] sin), wgt = 1 at DC/Nyquist else 2.
    wgt = np.full((v,), 2.0, np.float32)
    wgt[0] = 1.0
    if w % 2 == 0:
        wgt[-1] = 1.0
    cwt = jnp.asarray((_dft_mats(w)[0][:, :v] * wgt).T)  # [v, W]
    swt = jnp.asarray((_dft_mats(w)[1][:, :v] * wgt).T)
    dn_w = (((1,), (0,)), ((), ()))   # [b,v,c,H] x [v,W] -> [b,c,H,W]
    out = dot(zre, cwt, dn_w) - dot(zim, swt, dn_w)
    # [b,c,H,W] -> [b,H,W,c]
    return jnp.transpose(out, (0, 2, 3, 1)) * (scale / (h * w))


def _use_dft(h: int, w: int) -> bool:
    """DFT-matmul backend gate: on by default on TPU at FEB's small
    extents, where the O(HW(H+W)) matmuls beat XLA's FFT dispatches;
    classic FFT wins asymptotically. ``BAYER_TPU_FFT_DFT`` overrides."""
    mode = os.environ.get("BAYER_TPU_FFT_DFT", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu" and h <= 256 and w <= 256


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
        use_dft = _use_dft(h, w)
        if use_dft:
            # DFT-matmul backend (see _rfft2_dft): exact zeros at the
            # structurally-real bins by construction, so no eps-snap needed.
            fre, fim = _rfft2_dft(pre, ortho)
        else:
            freq = jnp.fft.rfft2(pre, axes=(1, 2)) * ortho
            # The DC/Nyquist bins of a real signal are structurally real,
            # but FFT backends emit tiny +-eps imaginary parts there,
            # flipping angle() between ~+-pi nondeterministically (and
            # making its gradient blow up). Snap near-real bins to exactly
            # real with +0 imaginary so the branch-cut phase is
            # deterministically +pi.
            fre = jnp.real(freq)
            fim = jnp.imag(freq)
            fim = jnp.where(jnp.abs(fim) <= 1e-6 * (jnp.abs(fre) + 1e-12), 0.0, fim)
        mag = jnp.sqrt(fre * fre + fim * fim) + 1e-6
        pha = jnp.arctan2(fim, fre)

        mag = Conv2d(c, 1, name="process1_0", **kw)(mag)
        mag = leaky_relu(mag, 0.1)
        mag = Conv2d(c, 1, name="process1_1", **kw)(mag)
        mag = jnp.clip(mag, 0.0, 1e4)

        pha = Conv2d(c, 1, name="process2_0", **kw)(pha)
        pha = leaky_relu(pha, 0.1)
        pha = Conv2d(c, 1, name="process2_1", **kw)(pha)

        # Recompose via cos/sin (reference blocks.py:32-34; also avoids
        # complex exp, which this TPU backend doesn't implement).
        spec_re = mag * jnp.cos(pha)
        spec_im = mag * jnp.sin(pha)
        # ortho inverse == backward inverse (1/N) scaled by sqrt(N).
        if use_dft:
            out = _irfft2_dft(spec_re, spec_im, h, w, float(np.sqrt(h * w)))
        else:
            spec = jax.lax.complex(spec_re, spec_im)
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
