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
``ops.ssm.selective_scan``).

Training: ``selective_scan_pallas_train`` adds a custom VJP whose backward
is itself a Pallas kernel. The scan's adjoint is a *reverse* scan

    lam_t = C_t (x) dy_t + a_{t+1} * lam_{t+1}        (lam: [N, D])

so the backward mirrors the forward's schedule with the L-chunk grid
reversed: the forward saves each chunk's [N, D_blk] *entry* state (nl tiny
slabs, not the [L, N, D] trajectory — remat-grade memory), the backward
recomputes h inside the chunk, runs the reverse Hillis-Steele for lam with
a mu = a_first*lam_first carry in scratch between chunks, and emits all six
input grads with fp32 VMEM accumulators.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _blelloch_fwd(a, b, lc):
    """Inclusive scan of the composition monoid (a2,b2) o (a1,b1) =
    (a1*a2, a2*b1 + b2) over the leading (time) axis, as a Blelloch
    up/down sweep built ONLY from leading-dim reshapes/slices (free on
    TPU) and a stack per down-sweep level.

    Work: ~12 full-tensor op-passes total vs Hillis-Steele's ~35 (7 shift
    levels x [2 concat copies + 3 multiply-adds] at FULL width each) —
    the scan is the WFB forward's largest single cost (12.0 ms marginal,
    benchmarks/ablate_wfb.py round 4), and it is VPU-work-bound, so the
    op-pass count is the time. Requires lc to be a power of two.
    """
    evens = []
    ca, cb = a, b
    m = lc
    while m > 1:
        ca2 = ca.reshape(m // 2, 2, *ca.shape[1:])
        cb2 = cb.reshape(m // 2, 2, *cb.shape[1:])
        e_a, o_a = ca2[:, 0], ca2[:, 1]
        e_b, o_b = cb2[:, 0], cb2[:, 1]
        evens.append((e_a, e_b))
        ca = e_a * o_a
        cb = o_a * e_b + o_b
        m //= 2
    # Down sweep: exclusive prefixes per level (identity at the root).
    ea = jnp.ones_like(ca)
    eb = jnp.zeros_like(cb)
    for e_a, e_b in reversed(evens):
        m2 = ea.shape[0]
        oa = ea * e_a
        ob = e_a * eb + e_b
        ea = jnp.stack([ea, oa], axis=1).reshape(2 * m2, *ea.shape[1:])
        eb = jnp.stack([eb, ob], axis=1).reshape(2 * m2, *eb.shape[1:])
    # Inclusive = element composed after its exclusive prefix.
    return ea * a, a * eb + b


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

    if lc & (lc - 1) == 0:
        a, b = _blelloch_fwd(a, b, lc)
    else:
        # Inclusive Hillis-Steele fallback for non-pow2 chunks.
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
    chunk: int = 256,
    block_d: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused selective scan; same contract as ``ops.ssm.selective_scan``.

    ``chunk`` default 256 (round-4 A/B at WFB geometry: 33.78 ms full
    model vs 34.35 at 128 / 33.88 at 64; 512 exceeds the 16 MB scoped-vmem
    stack). ``BAYER_TPU_SSM_CHUNK`` overrides."""
    import os

    chunk = int(os.environ.get("BAYER_TPU_SSM_CHUNK", str(chunk)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, L, d = u.shape
    n = A.shape[1]
    chunk, block_d = _interp_tiles(L, d, chunk, block_d, interpret)

    # Pad L with dt=0 steps (a=1, b=0: carry passes through) and D with dead
    # lanes (A=0, u=0 -> y=0), both sliced off on return.
    up, dtp, bp, cp, at, dsk, lp, dp = _pad_args(u, delta, B, C, A, D, chunk, block_d)
    nl, nd = lp // chunk, dp // block_d

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


# ---------------------------------------------------------------------------
# Training path: custom-VJP with a Pallas backward.
# ---------------------------------------------------------------------------


def _discretize(u, dt, bsel, a_t):
    """a_t = exp(dt*A), b_t = (dt*u)*B_t  -> [Lc, N, Db] fp32 pair."""
    a = jnp.exp(dt[:, None, :] * a_t[None, :, :])
    b = (dt * u)[:, None, :] * bsel[:, :, None]
    return a, b


def _hs_fwd(a, b, lc):
    """Inclusive forward Hillis-Steele scan of the composition monoid."""
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
    return a, b


def _hs_rev(alpha, c, lc):
    """Reverse inclusive scan: lam_t = c_t + alpha_t * lam_{t+1}."""
    k = 1
    while k < lc:
        lam_next = jnp.concatenate(
            [c[k:], jnp.zeros((k,) + c.shape[1:], _F32)], axis=0
        )
        al_next = jnp.concatenate(
            [alpha[k:], jnp.ones((k,) + alpha.shape[1:], _F32)], axis=0
        )
        c = c + alpha * lam_next
        alpha = alpha * al_next
        k *= 2
    return c


def _blelloch_rev(alpha, c, lc):
    """Reverse inclusive scan ``lam_t = c_t + alpha_t * lam_{t+1}`` as a
    Blelloch up/down sweep — the mirror image of :func:`_blelloch_fwd`
    (round-4 landed the forward sweep only; the backward kept the ~35-pass
    Hillis-Steele, VERDICT r4 #4). Span composition for the reverse monoid
    is ``left o right = (aL*aR, bL + aL*bR)``; the up-sweep saves the ODD
    (later-in-time) element of each pair, and the down-sweep propagates
    exclusive SUFFIXES: S_odd = S, S_even = odd o S. Same ~12 leading-dim
    op passes as the forward sweep. Requires pow2 lc."""
    odds = []
    ca, cb = alpha, c
    m = lc
    while m > 1:
        ca2 = ca.reshape(m // 2, 2, *ca.shape[1:])
        cb2 = cb.reshape(m // 2, 2, *cb.shape[1:])
        e_a, o_a = ca2[:, 0], ca2[:, 1]
        e_b, o_b = cb2[:, 0], cb2[:, 1]
        odds.append((o_a, o_b))
        ca = e_a * o_a
        cb = e_b + e_a * o_b
        m //= 2
    sa = jnp.ones_like(ca)
    sb = jnp.zeros_like(cb)
    for o_a, o_b in reversed(odds):
        m2 = sa.shape[0]
        ea = o_a * sa
        eb = o_b + o_a * sb
        sa = jnp.stack([ea, sa], axis=1).reshape(2 * m2, *sa.shape[1:])
        sb = jnp.stack([eb, sb], axis=1).reshape(2 * m2, *sb.shape[1:])
    # Inclusive = element composed before its exclusive suffix.
    return c + alpha * sb


def _ssm_fwd_states_kernel(
    u_ref, dt_ref, b_ref, c_ref, a_ref, dsk_ref,
    y_ref, st_ref,
    h_ref,
    *, lc: int,
):
    """Forward kernel that also dumps each chunk's ENTRY state."""
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    st_ref[0, 0, 0] = h_ref[...]

    u = u_ref[0].astype(_F32)
    dt = dt_ref[0].astype(_F32)
    a, b = _discretize(u, dt, b_ref[0].astype(_F32), a_ref[...])
    scan = _blelloch_fwd if lc & (lc - 1) == 0 else _hs_fwd
    a, b = scan(a, b, lc)
    h = b + a * h_ref[...][None, :, :]
    h_ref[...] = h[lc - 1]
    y = jnp.sum(c_ref[0].astype(_F32)[:, :, None] * h, axis=1)
    y = y + u * dsk_ref[0].astype(_F32)
    y_ref[0] = y.astype(y_ref.dtype)


def _ssm_bwd_kernel(
    u_ref, dt_ref, b_ref, c_ref, a_ref, dsk_ref, dy_ref, hin_ref,
    du_ref, ddt_ref, db_ref, dc_ref, da_ref, dd_ref,
    mu_ref,
    *, lc: int,
):
    """One reverse-ordered chunk of the scan adjoint (see module docstring).

    mu carries a_first*lam_first of the chunk just processed (the term the
    previous-in-time chunk's last element needs); da/dd accumulate across
    the (b, jd) block's chunk visits in their resident output blocks.
    """
    l = pl.program_id(2)  # 0 == LAST time chunk (index maps reverse l)

    @pl.when(l == 0)
    def _init():
        mu_ref[...] = jnp.zeros_like(mu_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        dd_ref[...] = jnp.zeros_like(dd_ref)

    u = u_ref[0].astype(_F32)        # [Lc, Db]
    dt = dt_ref[0].astype(_F32)
    bsel = b_ref[0].astype(_F32)     # [Lc, N]
    csel = c_ref[0].astype(_F32)
    dy = dy_ref[0].astype(_F32)      # [Lc, Db]
    a_t = a_ref[...]                 # [N, Db] (A transposed)
    hin = hin_ref[0, 0, 0]           # [N, Db] chunk entry state

    pow2 = lc & (lc - 1) == 0
    a, b = _discretize(u, dt, bsel, a_t)                  # [Lc, N, Db]
    a_scan, b_scan = (_blelloch_fwd if pow2 else _hs_fwd)(a, b, lc)
    h = b_scan + a_scan * hin[None, :, :]
    h_prev = jnp.concatenate([hin[None], h[: lc - 1]], axis=0)

    # lam_t = C_t (x) dy_t + a_{t+1} lam_{t+1}; the cross-chunk tail enters
    # as mu added to the last element's source term.
    c_src = csel[:, :, None] * dy[:, None, :]             # [Lc, N, Db]
    c_src = jnp.concatenate(
        [c_src[: lc - 1], (c_src[lc - 1] + mu_ref[...])[None]], axis=0
    )
    alpha = jnp.concatenate(
        [a[1:], jnp.ones((1,) + a.shape[1:], _F32)], axis=0
    )
    lam = (_blelloch_rev if pow2 else _hs_rev)(alpha, c_src, lc)
    mu_ref[...] = a[0] * lam[0]

    # b_t-term: d(dt*u) and dB.
    ddtu = jnp.sum(lam * bsel[:, :, None], axis=1)        # [Lc, Db]
    db_ref[0, 0] = jnp.sum(lam * (dt * u)[:, None, :], axis=2).astype(
        db_ref.dtype
    )
    # a_t-term: da = lam*h_prev, through exp: *a, then split dt/A factors.
    g = lam * h_prev * a                                  # [Lc, N, Db]
    ddt_a = jnp.sum(g * a_t[None], axis=1)                # [Lc, Db]
    da_ref[0] = da_ref[0] + jnp.sum(g * dt[:, None, :], axis=0)
    # y-terms.
    dc_ref[0, 0] = jnp.sum(h * dy[:, None, :], axis=2).astype(dc_ref.dtype)
    dd_ref[0] = dd_ref[0] + jnp.sum(dy * u, axis=0)[None]
    du_ref[0] = (ddtu * dt + dy * dsk_ref[0].astype(_F32)).astype(du_ref.dtype)
    ddt_ref[0] = (ddtu * u + ddt_a).astype(ddt_ref.dtype)


def _interp_tiles(L: int, d: int, chunk: int, block_d: int, interpret: bool):
    """Interpret-mode tile clamp: off-TPU there is no 128-lane / pow2-chunk
    hardware reason to pad, and the default tiles (chunk 256, block_d 128)
    cost up to 32x redundant interpreted work at unit-test sizes (L=64,
    d_inner=16 pads 4x in L and 8x in D). Clamp both to the next pow2 of
    the actual extent; on TPU return the tiles untouched. Forward and
    backward both derive the clamp from the same (L, d), so the
    chunk-indexed saved states stay consistent across the VJP pair."""
    if not interpret:
        return chunk, block_d
    p = 1
    while p < L:
        p *= 2
    bd = 1
    while bd < d:
        bd *= 2
    return min(chunk, p), min(block_d, bd)


def _pad_args(u, delta, B, C, A, D, chunk, block_d):
    bsz, L, d = u.shape
    n = A.shape[1]
    lp = -(-L // chunk) * chunk
    dp = -(-d // block_d) * block_d

    def padx(t, rows, cols):
        return jnp.pad(t, ((0, 0), (0, rows - t.shape[1]), (0, cols - t.shape[2])))

    up = padx(u, lp, dp)
    dtp = padx(delta, lp, dp)
    bp = padx(B, lp, n)
    cp = padx(C, lp, n)
    at = jnp.pad(A.T.astype(_F32), ((0, 0), (0, dp - d)))
    dsk = jnp.pad(
        (D if D is not None else jnp.zeros((d,), _F32)).astype(_F32), (0, dp - d)
    ).reshape(1, dp)
    return up, dtp, bp, cp, at, dsk, lp, dp


def _fwd_with_states(u, delta, A, B, C, D, chunk, block_d, interpret):
    bsz, L, d = u.shape
    n = A.shape[1]
    chunk, block_d = _interp_tiles(L, d, chunk, block_d, interpret)
    up, dtp, bp, cp, at, dsk, lp, dp = _pad_args(u, delta, B, C, A, D, chunk, block_d)
    nl, nd = lp // chunk, dp // block_d
    y, states = pl.pallas_call(
        functools.partial(_ssm_fwd_states_kernel, lc=chunk),
        grid=(bsz, nd, nl),
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, l, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, l, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), lambda b, jd, l: (b, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), lambda b, jd, l: (b, l, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_d), lambda b, jd, l: (0, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, jd, l: (0, jd), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, l, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n, block_d), lambda b, jd, l: (b, jd, l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, dp), u.dtype),
            jax.ShapeDtypeStruct((bsz, nd, nl, n, block_d), _F32),
        ],
        scratch_shapes=[pltpu.VMEM((n, block_d), _F32)],
        interpret=interpret,
    )(up, dtp, bp, cp, at, dsk)
    return y[:, :L, :d], states


def _bwd_pallas(res, dy, chunk, block_d, interpret):
    u, delta, A, B, C, D, states = res
    bsz, L, d = u.shape
    n = A.shape[1]
    chunk, block_d = _interp_tiles(L, d, chunk, block_d, interpret)
    up, dtp, bp, cp, at, dsk, lp, dp = _pad_args(u, delta, B, C, A, D, chunk, block_d)
    dyp = jnp.pad(
        dy.astype(_F32), ((0, 0), (0, lp - L), (0, dp - d))
    )
    nl, nd = lp // chunk, dp // block_d

    rev = lambda l: nl - 1 - l
    du, ddt, db, dc, da, dd = pl.pallas_call(
        functools.partial(_ssm_bwd_kernel, lc=chunk),
        grid=(bsz, nd, nl),
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, rev(l), jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, rev(l), jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), lambda b, jd, l: (b, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, n), lambda b, jd, l: (b, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_d), lambda b, jd, l: (0, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, jd, l: (0, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, rev(l), jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n, block_d), lambda b, jd, l: (b, jd, rev(l), 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, rev(l), jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, block_d), lambda b, jd, l: (b, rev(l), jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, n), lambda b, jd, l: (b, jd, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, n), lambda b, jd, l: (b, jd, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_d), lambda b, jd, l: (b, 0, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_d), lambda b, jd, l: (b, 0, jd), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, dp), _F32),
            jax.ShapeDtypeStruct((bsz, lp, dp), _F32),
            jax.ShapeDtypeStruct((bsz, nd, lp, n), _F32),
            jax.ShapeDtypeStruct((bsz, nd, lp, n), _F32),
            jax.ShapeDtypeStruct((bsz, n, dp), _F32),
            jax.ShapeDtypeStruct((bsz, 1, dp), _F32),
        ],
        scratch_shapes=[pltpu.VMEM((n, block_d), _F32)],
        interpret=interpret,
    )(up, dtp, bp, cp, at, dsk, dyp, states)

    du_o = du[:, :L, :d].astype(u.dtype)
    ddt_o = ddt[:, :L, :d].astype(delta.dtype)
    db_o = jnp.sum(db, axis=1)[:, :L].astype(B.dtype)
    dc_o = jnp.sum(dc, axis=1)[:, :L].astype(C.dtype)
    da_o = jnp.sum(da, axis=0).T[:d].astype(A.dtype)  # [D, N]
    dd_o = None if D is None else jnp.sum(dd, axis=(0, 1))[:d].astype(D.dtype)
    return du_o, ddt_o, da_o, db_o, dc_o, dd_o


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def selective_scan_pallas_train(
    u, delta, A, B, C, D, chunk=64, fwd_chunk=256, block_d=128, interpret=None
):
    """``selective_scan_pallas`` with a Pallas backward (training path).

    ``chunk`` (default 64) is the TRAINING chunk, used by both the
    grad-traced forward and the backward — they must agree because the
    forward saves one [N, D_blk] entry state per chunk that the backward's
    BlockSpecs index by chunk number; 64 because the backward holds ~2x
    the [Lc, N, D_blk] fp32 working set (h, h_prev, lam, a) in VMEM.

    ``fwd_chunk`` (default 256) is the chunk for the UNDIFFERENTIATED
    primal (inference through the training-capable wrapper — the
    production WFB path, ops/ssm.py): it saves no states, so it takes the
    larger round-4-measured-optimal chunk. ``BAYER_TPU_SSM_CHUNK``
    (resolved inside ``selective_scan_pallas``) overrides the inference
    chunk only; the training chunks are env-independent by design so a
    measurement override can never silently change training numerics.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return selective_scan_pallas(
        u, delta, A, B, C, D, chunk=fwd_chunk, block_d=block_d,
        interpret=interpret,
    )


def _train_fwd(u, delta, A, B, C, D, chunk, fwd_chunk, block_d, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    y, states = _fwd_with_states(u, delta, A, B, C, D, chunk, block_d, interpret)
    return y, (u, delta, A, B, C, D, states)


def _train_bwd(chunk, fwd_chunk, block_d, interpret, res, dy):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _bwd_pallas(res, dy, chunk, block_d, interpret)


selective_scan_pallas_train.defvjp(_train_fwd, _train_bwd)
