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


# Precision pinned: at DEFAULT, TPU fp32 dots may lower to single-pass
# bf16 matmuls, which would degrade the 256-length DFT sums far past the
# measured 5e-7 FFT-path agreement (ADVICE r4). HIGHEST (6-pass) measured
# +~2 ms on the WFB forward vs HIGH (3-pass bf16, ~fp32-accurate window
# for these unit-magnitude trig constants); HIGH keeps the FFT-path
# agreement at <=2e-6 through a full FFAB (tests/test_wfb.py) at half the
# MXU passes. ``BAYER_TPU_DFT_PRECISION`` overrides (default/high/highest).
_dot = functools.partial(
    jax.lax.dot_general,
    precision={
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[os.environ.get("BAYER_TPU_DFT_PRECISION", "high")],
)


def _rfft2_dft_cvu(x, ortho):
    """norm='ortho' rfft2 over axes (1, 2) of NHWC x, as four fp32 MXU
    matmuls returning separate (re, im) planes in the transform's NATIVE
    ``[b, c, v, u]`` layout — no complex dtype, no relayout.

    The WFB FEB islands dispatch ~44 small rfft2/irfft2 round trips per
    forward; XLA's TPU FFT runs them at ~0.24 ms each IN-GRAPH (round-4
    marginal ablation, benchmarks/ablate_wfb.py) while the equivalent
    matmul FLOPs are ~2 orders cheaper at FEB's <=128^2 extents. (The
    round-2 isolated A/B that measured DFT 'neutral' was sitting on the
    standalone dispatch floor.) Matmuls contract the H/W axes directly via
    dot_general; the mag/phase 1x1 stacks downstream contract the c axis
    in place (round 5), so nothing between the forward and inverse
    transforms pays an HBM relayout.
    """
    ch, sh, cw, sw = _rfft2_consts(x.shape[1], x.shape[2])
    dn_w = (((2,), (0,)), ((), ()))   # [b,h,W,c] x [W,v] -> [b,h,c,v]
    re1 = _dot(x, cw, dn_w)
    im1 = -_dot(x, sw, dn_w)
    dn_h = (((1,), (0,)), ((), ()))   # [b,H,c,v] x [H,u] -> [b,c,v,u]
    yre = _dot(re1, ch, dn_h) + _dot(im1, sh, dn_h)
    yim = _dot(im1, ch, dn_h) - _dot(re1, sh, dn_h)
    return yre * ortho, yim * ortho


def _rfft2_dft(x, ortho):
    """[b,u,v,c]-layout wrapper of :func:`_rfft2_dft_cvu` (unit tests /
    external callers; FEB itself stays in the native layout)."""
    yre, yim = _rfft2_dft_cvu(x, ortho)
    perm = (0, 3, 2, 1)
    return jnp.transpose(yre, perm), jnp.transpose(yim, perm)


def _ihermitian_consts(w: int):
    """Inverse-W DFT matrices [v, W] with the rfft Hermitian fold weights
    (1 at DC/Nyquist, else 2) baked in."""
    v = w // 2 + 1
    wgt = np.full((v,), 2.0, np.float32)
    wgt[0] = 1.0
    if w % 2 == 0:
        wgt[-1] = 1.0
    cwt = jnp.asarray((_dft_mats(w)[0][:, :v] * wgt).T)  # [v, W]
    swt = jnp.asarray((_dft_mats(w)[1][:, :v] * wgt).T)
    return cwt, swt


def _irfft2_dft_vuc(re, im, h, w, scale):
    """Inverse rfft2 (times ``scale``) from ``[b, v, u, c]`` spectrum
    planes — the layout the in-place mag/phase stacks produce — to NHWC.
    Expands the half spectrum to full W via Hermitian symmetry weights
    folded into the inverse DFT matrices."""
    ch, sh, _, _ = _rfft2_consts(h, w)
    cwt, swt = _ihermitian_consts(w)
    # Inverse along H (full complex): z[h] = (1/H) sum_u y[u] e^{+2pi i uh/H}
    dn_h = (((2,), (1,)), ((), ()))   # [b,v,U,c] x [H,U] -> [b,v,c,H]
    zre = _dot(re, ch, dn_h) - _dot(im, sh, dn_h)
    zim = _dot(im, ch, dn_h) + _dot(re, sh, dn_h)
    # Inverse along W with the Hermitian fold: x[w'] = (1/W) sum_{v'}
    # wgt[v'] (zre[v'] cos - zim[v'] sin).
    dn_w = (((1,), (0,)), ((), ()))   # [b,v,c,H] x [v,W] -> [b,c,H,W]
    out = _dot(zre, cwt, dn_w) - _dot(zim, swt, dn_w)
    # [b,c,H,W] -> [b,H,W,c]: the single relayout of the whole island.
    return jnp.transpose(out, (0, 2, 3, 1)) * (scale / (h * w))


def _irfft2_dft(re, im, h, w, scale):
    """[b,u,v,c]-layout wrapper of :func:`_irfft2_dft_vuc` (unit tests)."""
    return _irfft2_dft_vuc(jnp.transpose(re, (0, 2, 1, 3)),
                           jnp.transpose(im, (0, 2, 1, 3)), h, w, scale)


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


class _Spectral1x1(nn.Module):
    """1x1-conv-equivalent channel matmul over an ARBITRARY tensor axis.

    Parameter tree mirrors ``Conv2d`` exactly (``kernel`` [1,1,ci,co] +
    ``bias`` [co], torch kaiming-uniform init), so checkpoints round-trip
    byte-for-byte with the reference's ``nn.Conv2d(c, c, 1)`` stacks
    (``/root/reference/RawFomer_WFB_FFAB/blocks.py:13-22``); but applying
    it as a ``dot_general`` over a caller-chosen axis lets the FEB
    spectrum pipeline stay in the DFT matmuls' native ``[b,c,v,u]`` /
    ``[b,v,u,c]`` layouts — no transposes between the forward transform,
    the mag/phase stacks, and the inverse transform (round 5; the two
    [b,c,v,u]->[b,u,v,c] relayouts were pure HBM traffic)."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        from bayer_low_light_image_enhancement_tpu.models.common import (
            torch_uniform_init,
        )

        axis = axis % x.ndim
        ci = x.shape[axis]
        kernel = self.param(
            "kernel", torch_uniform_init(ci), (1, 1, ci, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", torch_uniform_init(ci), (self.features,), self.param_dtype
        )
        y = jax.lax.dot_general(x, kernel.reshape(ci, self.features).astype(x.dtype),
                                (((axis,), (0,)), ((), ())))
        return y + bias.astype(y.dtype)


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
        p10 = _Spectral1x1(c, param_dtype=self.param_dtype, name="process1_0")
        p11 = _Spectral1x1(c, param_dtype=self.param_dtype, name="process1_1")
        p20 = _Spectral1x1(c, param_dtype=self.param_dtype, name="process2_0")
        p21 = _Spectral1x1(c, param_dtype=self.param_dtype, name="process2_1")
        if use_dft:
            # DFT-matmul backend (see _rfft2_dft_cvu): exact zeros at the
            # structurally-real bins by construction (no eps-snap needed),
            # and the whole island — forward DFT, mag/phase stacks, inverse
            # DFT — runs as one fused fp32 matmul chain with the 1x1 convs
            # contracting the channel axis in place.
            fre, fim = _rfft2_dft_cvu(pre, ortho)          # [b,c,v,u]
            mag = jnp.sqrt(fre * fre + fim * fim) + 1e-6
            pha = jnp.arctan2(fim, fre)

            mag = leaky_relu(p10(mag, axis=1), 0.1)        # -> [b,v,u,c]
            mag = jnp.clip(p11(mag, axis=3), 0.0, 1e4)
            pha = leaky_relu(p20(pha, axis=1), 0.1)
            pha = p21(pha, axis=3)

            spec_re = mag * jnp.cos(pha)                   # [b,v,u,c]
            spec_im = mag * jnp.sin(pha)
            out = _irfft2_dft_vuc(spec_re, spec_im, h, w, float(np.sqrt(h * w)))
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

            mag = leaky_relu(p10(mag), 0.1)    # axis=-1 == the 1x1 conv
            mag = jnp.clip(p11(mag), 0.0, 1e4)
            pha = leaky_relu(p20(pha), 0.1)
            pha = p21(pha)

            # Recompose via cos/sin (reference blocks.py:32-34; also avoids
            # complex exp, which this TPU backend doesn't implement).
            # ortho inverse == backward inverse (1/N) scaled by sqrt(N).
            spec = jax.lax.complex(mag * jnp.cos(pha), mag * jnp.sin(pha))
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
