"""Fully-fused channel attention Pallas kernel — EXPERIMENTAL.

STATUS (measured on TPU v5e, level-1 RawFormer-S shapes [8,256,256,32]):
correct (bf16-level agreement with the module path, tests in
tests/test_fused_attention.py) but 0.60x the XLA lowering (7.9 ms vs
4.75 ms). Two costs dominate: (a) Mosaic materialises a relayout copy for
every lane-shifted slice of the in-kernel depthwise conv (9 taps; the
column shifts move data across the 128-lane dimension), and (b) the
two-phase schedule recomputes qkv for the apply pass. A production version
needs an im2col-style DMA formulation of the depthwise conv and a
v-stashing single-pass schedule; until then the models keep the XLA path,
and this kernel stands as the measured baseline for that work.

Motivation (BENCHMARKS.md breakdown): at RawFormer's level-1 scale the
XLA-lowered ChannelAttention moves ~600 MB through HBM per block — the
[B,H,W,3C] qkv and depthwise intermediates — running at ~17% of bandwidth
roofline while its math is negligible. This kernel computes

    qkv = dwconv3x3(conv1x1(x));  q,k,v = split(qkv)
    attn = softmax(head_mask( (q^T k) / (|q_i||k_j|) * temperature ))
    out  = proj1x1(attn @ v)

with the 3C tensors living only in VMEM. Two passes over the (zero-padded)
input: phase 0 accumulates the channel gram and the q/k sums-of-squares per
tile; phase 1 recomputes v per tile (compute is free here) and applies the
folded (attn^T @ Wproj) matrix. HBM traffic: read x twice + write out once.

Mosaic constraints honoured: only leading-dim reshapes, static contiguous
slices, MXU dots via dot_general; per-head structure is realised as a full
[C, C] gram plus an additive head mask (per-head c = C/heads can be < the
8-sublane tile, a blocked layout Mosaic can't express directly).

Grid: (B, 2, n_tiles) — phase-major per batch element; VMEM scratch carries
the gram/sumsq accumulators and the folded apply matrix across grid steps.
The input is pre-padded by 1 pixel (zeros == SAME padding) so every tile
reads a uniform (th+2, W+2) window with a static-size dynamic-offset DMA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw3x3_into(acc_ref, x, w):
    """Depthwise 3x3 'VALID' conv via 9 shifted multiply-adds, accumulated
    in-place into a VMEM scratch so Mosaic doesn't keep all taps live.

    x: [th+2, W+2, C3]; w: [3, 3, C3]; acc_ref: [th, W, C3]."""
    th = x.shape[0] - 2
    wd = x.shape[1] - 2
    for di in range(3):
        for dj in range(3):
            term = x[di : di + th, dj : dj + wd, :] * w[di, dj]
            if di == 0 and dj == 0:
                acc_ref[...] = term
            else:
                acc_ref[...] += term


def _fused_attention_kernel(
    # scalar prefetch
    nt_ref,
    # inputs
    xpad_ref,      # [1, 1, th+2, W+2, C]   (current overlapping tile)
    wqkv_ref,      # [C, 3C]
    bqkv_ref,      # [1, 3C]
    wdw_ref,       # [3, 3, 3C]
    bdw_ref,       # [1, 3C]
    wproj_ref,     # [C, C]
    bproj_ref,     # [1, C]
    tmask_ref,     # [C, C]  head mask: 0 within head, -inf across heads
    trow_ref,      # [1, C]  per-row temperature (head-expanded)
    # output
    out_ref,       # [1, th, W, C]
    # scratch
    gram_ref,      # [C, C] f32
    qss_ref,       # [1, C] f32
    kss_ref,       # [1, C] f32
    apply_ref,     # [C, C] f32  folded attn^T @ Wproj
    dw_ref,        # [th, W, 3C] f32 — in-place dwconv accumulator
    *,
    th: int,
    heads: int,
):
    phase = pl.program_id(1)
    tile = pl.program_id(2)
    c = wqkv_ref.shape[0]

    @pl.when(jnp.logical_and(phase == 0, tile == 0))
    def _init():
        gram_ref[...] = jnp.zeros_like(gram_ref)
        qss_ref[...] = jnp.zeros_like(qss_ref)
        kss_ref[...] = jnp.zeros_like(kss_ref)

    # Conv math in bf16 (matching the module path's compute dtype);
    # reductions in fp32.
    x = xpad_ref[0, 0].astype(jnp.bfloat16)      # [th+2, W+2, C]
    hp, wp = x.shape[0], x.shape[1]
    # 1x1 conv == matmul over channels. The padded ring must hold qkv == 0
    # (the module path zero-pads the qkv tensor for the SAME dwconv), so the
    # bias is added only on real pixels: x is 0 on the ring, making x@W = 0
    # there already.
    xf = x.reshape(hp * wp, c)
    qkv = jax.lax.dot_general(
        xf, wqkv_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(hp, wp, 3 * c)
    nt = pl.num_programs(2)
    # 3D iotas directly (Mosaic rejects reshapes of i1 vectors).
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 1)
    valid = (cols > 0) & (cols < wp - 1)
    valid &= ~((tile == 0) & (rows == 0))
    valid &= ~((tile == nt - 1) & (rows == hp - 1))
    qkv = qkv + bqkv_ref[0].astype(jnp.bfloat16) * valid.astype(jnp.bfloat16)
    _dw3x3_into(dw_ref, qkv, wdw_ref[...].astype(jnp.bfloat16))
    qkv = dw_ref[...] + bdw_ref[0].astype(jnp.bfloat16)  # [th, W, 3C]

    n = th * (wp - 2)
    qkv2 = qkv.reshape(n, 3 * c)
    q = qkv2[:, :c]
    k = qkv2[:, c : 2 * c]
    v = qkv2[:, 2 * c :]

    @pl.when(phase == 0)
    def _accumulate():
        gram_ref[...] += jax.lax.dot_general(
            q, k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qss_ref[...] += jnp.sum(qf * qf, axis=0, keepdims=True)
        kss_ref[...] += jnp.sum(kf * kf, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(phase == 1, tile == 0))
    def _finalize():
        qinv = jax.lax.rsqrt(jnp.maximum(qss_ref[...], 1e-24))  # [1, C]
        kinv = jax.lax.rsqrt(jnp.maximum(kss_ref[...], 1e-24))
        # torch F.normalize uses max(|x|, eps) with eps=1e-12.
        attn = gram_ref[...] * qinv.reshape(c, 1) * kinv.reshape(1, c)
        attn = attn * trow_ref[0].reshape(c, 1) + tmask_ref[...]
        attn = attn - jnp.max(attn, axis=1, keepdims=True)
        e = jnp.exp(attn)
        attn = e / jnp.sum(e, axis=1, keepdims=True)
        # Fold projection: out = (attn @ v^T)^T ... per token: y = attn @ v_tok
        # => Y[n, :] = v[n, :] @ attn^T; then proj: Y @ Wproj.
        apply_ref[...] = jax.lax.dot_general(
            attn, wproj_ref[...].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),  # attn^T @ Wproj
            preferred_element_type=jnp.float32,
        )

    @pl.when(phase == 1)
    def _apply():
        y = jax.lax.dot_general(
            v, apply_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[0]
        out_ref[0] = y.reshape(th, wp - 2, c).astype(out_ref.dtype)


def fused_channel_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,   # [1, 1, C, 3C] (flax kernel) or [C, 3C]
    bqkv: jnp.ndarray,   # [3C]
    wdw: jnp.ndarray,    # [3, 3, 1, 3C] (flax depthwise kernel) or [3, 3, 3C]
    bdw: jnp.ndarray,    # [3C]
    wproj: jnp.ndarray,  # [1, 1, C, C] or [C, C]
    bproj: jnp.ndarray,  # [C]
    temperature: jnp.ndarray,  # [heads]
    num_heads: int,
    tile_rows: int = 32,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in for ChannelAttention's forward: x [B, H, W, C] -> [B, H, W, C]."""
    b, h, w, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th = min(tile_rows, h)
    while h % th:
        th //= 2
    nt = h // th

    wqkv2 = wqkv.reshape(c, 3 * c)
    wdw3 = wdw.reshape(3, 3, 3 * c)
    wproj2 = wproj.reshape(c, c)

    ch = c // num_heads
    head_id = np.repeat(np.arange(num_heads), ch)
    mask = np.where(head_id[:, None] == head_id[None, :], 0.0, -np.inf).astype(np.float32)
    trow = jnp.repeat(temperature.astype(jnp.float32), ch).reshape(1, c)

    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Overlapping (th+2)-row windows aren't expressible as a BlockSpec
    # (index units are whole blocks), so materialise the window stack once —
    # +2/th duplication (~6% at th=32), dwarfed by the traffic saved.
    xtiles = jnp.stack(
        [xpad[:, i * th : i * th + th + 2] for i in range(nt)], axis=1
    )  # [B, nt, th+2, W+2, C]

    kernel = functools.partial(_fused_attention_kernel, th=th, heads=num_heads)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, 2, nt),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, th + 2, w + 2, c),
                    lambda bb, p, i, *_: (bb, i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((c, 3 * c), lambda *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * c), lambda *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, 3 * c), lambda *_: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * c), lambda *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, th, w, c), lambda bb, p, i, *_: (bb, i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((c, c), jnp.float32),
                pltpu.VMEM((1, c), jnp.float32),
                pltpu.VMEM((1, c), jnp.float32),
                pltpu.VMEM((c, c), jnp.float32),
                pltpu.VMEM((th, w, 3 * c), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(jnp.zeros((1,), jnp.int32), xtiles, wqkv2, bqkv.reshape(1, -1), wdw3,
      bdw.reshape(1, -1), wproj2, bproj.reshape(1, -1),
      jnp.asarray(mask), trow)
    return out
