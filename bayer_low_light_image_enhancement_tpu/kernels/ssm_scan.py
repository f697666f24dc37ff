"""Pallas selective-scan (Mamba-style SSM) kernel for TPU.

Replaces the reference's CUDA ``mamba_ssm`` selective-scan
(``/root/reference/RawFomer_WFB_FFAB/model.py:8,146-172``; SURVEY.md §2.4 N1)
with a TPU-native kernel.

Why a kernel: the recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * u_t      (h: [D, N])
    y_t = C_t . h_t + D_skip * u_t

expands every timestep into a [D, N] state (N = d_state = 32). The XLA path
(``ops/ssm.py``) chunks a ``lax.scan`` around ``associative_scan``, but each
log-depth pass still materialises [B, chunk, D, N] fp32 operands to HBM —
at WFB bottleneck sizes that is GBs of traffic per step. Here the [L_c, N, D]
expansion lives only in VMEM; HBM sees just u/dt/B/C once in and y once out.

Schedule: grid (B, D-blocks, L-chunks), L innermost; the [N, D_blk] carry
state persists in VMEM scratch across chunks of the same (b, d-block) and
resets at chunk 0. Inside a chunk, an inclusive Hillis-Steele scan over the
leading (time) axis — log2(L_c) passes of leading-dim concats and
multiply-adds, no strided slices, no reshapes of tiled dims (Mosaic-safe).
Lanes hold D (blocked to 128), sublanes hold N — the [L_c, N, D_blk] f32
working set is ~2 MB per tensor at L_c=128.

All recurrence math in fp32 regardless of input dtype (matches
``ops.ssm.selective_scan``). Inference-only (no VJP); training and tests can
keep the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _ssm_kernel(
    u_ref,    # [1, Lc, Db]
    dt_ref,   # [1, Lc, Db]
    b_ref,    # [1, Lc, N]
    c_ref,    # [1, Lc, N]
    a_ref,    # [N, Db]  (A transposed; zero in padded D lanes)
    dsk_ref,  # [1, Db]
    y_ref,    # out [1, Lc, Db]
    h_ref,    # scratch [N, Db] f32 — carry across L-chunks
    *,
    lc: int,
):
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    u = u_ref[0].astype(_F32)      # [Lc, Db]
    dt = dt_ref[0].astype(_F32)
    bsel = b_ref[0].astype(_F32)   # [Lc, N]
    csel = c_ref[0].astype(_F32)

    # Discretise: a = exp(dt * A), b = (dt * u) * B_t  -> [Lc, N, Db].
    a = jnp.exp(dt[:, None, :] * a_ref[...][None, :, :])
    b = (dt * u)[:, None, :] * bsel[:, :, None]

    # Inclusive Hillis-Steele scan over time (axis 0) of the composition
    # monoid (a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2).
    k = 1
    while k < lc:
        a_prev = jnp.concatenate(
            [jnp.ones((k,) + a.shape[1:], _F32), a[: lc - k]], axis=0
        )
        b_prev = jnp.concatenate(
            [jnp.zeros((k,) + b.shape[1:], _F32), b[: lc - k]], axis=0
        )
        b = a * b_prev + b
        a = a * a_prev
        k *= 2

    # Fold the carried state: h_t = b_scan_t + a_scan_t * h_in.
    h = b + a * h_ref[...][None, :, :]
    h_ref[...] = h[lc - 1]

    y = jnp.sum(csel[:, :, None] * h, axis=1)  # [Lc, Db]
    y = y + u * dsk_ref[0].astype(_F32)
    y_ref[0] = y.astype(y_ref.dtype)


def selective_scan_pallas(
    u: jnp.ndarray,      # [B, L, D]
    delta: jnp.ndarray,  # [B, L, D] (post-softplus)
    A: jnp.ndarray,      # [D, N]
    B: jnp.ndarray,      # [B, L, N]
    C: jnp.ndarray,      # [B, L, N]
    D: Optional[jnp.ndarray] = None,  # [D]
    chunk: int = 128,
    block_d: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused selective scan; same contract as ``ops.ssm.selective_scan``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, L, d = u.shape
    n = A.shape[1]

    lp = -(-L // chunk) * chunk
    dp = -(-d // block_d) * block_d
    nl, nd = lp // chunk, dp // block_d

    # Pad L with dt=0 steps (a=1, b=0: carry passes through) and D with dead
    # lanes (A=0, u=0 -> y=0), both sliced off on return.
    def padx(t, rows, cols):
        return jnp.pad(t, ((0, 0), (0, rows - t.shape[1]), (0, cols - t.shape[2])))

    up = padx(u, lp, dp)
    dtp = padx(delta, lp, dp)
    bp = padx(B, lp, n)
    cp = padx(C, lp, n)
    at = jnp.pad(A.T.astype(_F32), ((0, 0), (0, dp - d)))  # [N, Dp]
    dsk = jnp.pad(
        (D if D is not None else jnp.zeros((d,), _F32)).astype(_F32),
        (0, dp - d),
    ).reshape(1, dp)

    y = pl.pallas_call(
        functools.partial(_ssm_kernel, lc=chunk),
        grid=(bsz, nd, nl),
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, l, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, l, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), lambda b, jd, l: (b, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), lambda b, jd, l: (b, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_d), lambda b, jd, l: (0, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, jd, l: (0, jd), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, block_d), lambda b, jd, l: (b, l, jd), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, lp, dp), u.dtype),
        scratch_shapes=[pltpu.VMEM((n, block_d), _F32)],
        interpret=interpret,
    )(up, dtp, bp, cp, at, dsk)
    return y[:, :L, :d]
