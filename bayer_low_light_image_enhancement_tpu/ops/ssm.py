"""Selective state-space (Mamba-style) sequence op, TPU-native.

The reference's WM block wraps two ``mamba_ssm.Mamba`` modules whose selective
scan is a custom CUDA kernel (``/root/reference/RawFomer_WFB_FFAB/model.py:
146-172``; SURVEY.md §2.4 N1). On TPU the recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t + D * x_t

is evaluated with ``jax.lax.associative_scan`` over the composition monoid
(a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2) — log-depth, fully parallel, maps
onto the VPU; a fused Pallas kernel lives in ``kernels/ssm_scan.py``.

The surrounding Mamba block (in_proj -> causal depthwise conv1d -> SiLU ->
(dt, B, C) projections -> scan -> gate -> out_proj) reproduces mamba_ssm's
architecture (d_state=32, d_conv=4, expand) so reference configurations carry
over; token order is the row-major pixel order the reference uses
(``model.py:168`` reshapes [B,C,H,W] -> [B, H*W, C]).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _scan_chunk(uf, delta, Af, Bf, Cf, h0):
    """Associative scan of one chunk given incoming state h0 [B, D, N].
    Returns (y [B, L, D], h_out [B, D, N])."""
    dA = jnp.einsum("bld,dn->bldn", delta, Af)
    a = jnp.exp(dA)
    b = (delta * uf)[..., None] * Bf[:, :, None, :]
    # Fold the carried state into the first step: h_1 = a_1*h0 + b_1.
    b = b.at[:, 0].add(a[:, 0] * h0)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, Cf)
    return y, h[:, -1]


def selective_scan(
    u: jnp.ndarray,      # [B, L, D]  input sequence
    delta: jnp.ndarray,  # [B, L, D]  positive step sizes
    A: jnp.ndarray,      # [D, N]     state matrix (negative real)
    B: jnp.ndarray,      # [B, L, N]  input->state projection (selective)
    C: jnp.ndarray,      # [B, L, N]  state->output projection (selective)
    D: Optional[jnp.ndarray] = None,  # [D] skip connection
    chunk_size: int = 256,
    h0: Optional[jnp.ndarray] = None,  # [B, D, N] incoming state
    return_state: bool = False,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Parallel selective scan, chunked for memory. Returns y [B, L, D]
    (or ``(y, h_final)`` with ``return_state``).

    A monolithic associative scan materialises the [B, L, D, N] discretised
    operands (1 GB-scale at WFB bottleneck sizes). Chunking runs a
    ``lax.scan`` over L/chunk sequential chunks carrying only the [B, D, N]
    state, with the log-depth associative scan *inside* each chunk — HBM
    holds one chunk of [B, chunk, D, N] at a time while u/dt/B/C stream
    through once. All recurrence math in fp32 (exp of dt*A) regardless of
    compute dtype.

    ``axis_name``: mesh axis carrying contiguous sequence chunks (spatial
    H-sharding turns the raster token order into exactly this layout —
    SURVEY.md §2.4 sequence parallelism). The in-chip chunk-carry algebra
    lifts one level: every shard scans locally from zero state, shard
    summaries ``(A_s = exp(sum_t dt_t A), h_out_s)`` are all-gathered (tiny
    [B, D, N] each), the exclusive prefix composition
    ``h -> A_s h + h_out_s`` gives each shard its true incoming state, and
    a second local scan with that ``h0`` yields exact sequence-global
    outputs. Costs one extra local scan pass + one all_gather; no
    sequential cross-device dependency chain.
    """
    dtype_in = u.dtype
    bsz, L, d = u.shape
    n = A.shape[1]
    uf = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    if axis_name is not None:
        assert h0 is None and not return_state
        # Pass 1: local scan from zero state -> this shard's summary.
        # (pvary: a replicated-zeros carry must be typed as shard-varying
        # under shard_map's manual-axes checking.)
        zero_h = jax.lax.pcast(
            jnp.zeros((bsz, d, n), jnp.float32), (axis_name,), to="varying"
        )
        _, h_local = _run_chunked(uf, delta, Af, Bf, Cf, zero_h, chunk_size)
        # prod_t exp(dt_t A) == exp(sum_t dt_t A): the shard's state decay.
        A_shard = jnp.exp(jnp.einsum("bd,dn->bdn", jnp.sum(delta, axis=1), Af))
        As = jax.lax.all_gather(A_shard, axis_name)  # [P, B, D, N]
        Hs = jax.lax.all_gather(h_local, axis_name)
        idx = jax.lax.axis_index(axis_name)
        h_in = jax.lax.pcast(
            jnp.zeros((bsz, d, n), jnp.float32), (axis_name,), to="varying"
        )
        for s in range(As.shape[0]):
            h_in = jnp.where(jnp.asarray(s) < idx, As[s] * h_in + Hs[s], h_in)
        y, _ = _run_chunked(uf, delta, Af, Bf, Cf, h_in, chunk_size)
    else:
        if h0 is None:
            h0 = jnp.zeros((bsz, d, n), jnp.float32)
        y, h_fin = _run_chunked(uf, delta, Af, Bf, Cf, h0.astype(jnp.float32),
                                chunk_size)

    if D is not None:
        y = y + uf * D.astype(jnp.float32)
    y = y.astype(dtype_in)
    if return_state:
        return y, h_fin
    return y


def _run_chunked(uf, delta, Af, Bf, Cf, h0, chunk_size):
    """Chunked scan core: returns (y [B, L, D] fp32, h_final [B, D, N])."""
    bsz, L, _ = uf.shape
    if L <= chunk_size or L % chunk_size:
        return _scan_chunk(uf, delta, Af, Bf, Cf, h0)
    k = L // chunk_size

    def to_chunks(t):
        return jnp.moveaxis(t.reshape(bsz, k, chunk_size, *t.shape[2:]), 1, 0)

    xs = (to_chunks(uf), to_chunks(delta), to_chunks(Bf), to_chunks(Cf))

    def body(h, chunk):
        uc, dc, bc, cc = chunk
        yc, h_next = _scan_chunk(uc, dc, Af, bc, cc, h)
        return h_next, yc

    h_fin, ys = jax.lax.scan(body, h0, xs)
    return jnp.moveaxis(ys, 0, 1).reshape(bsz, L, -1), h_fin


def selective_scan_ref(u, delta, A, B, C, D=None):
    """Sequential reference (lax.scan) for correctness tests."""
    uf = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)

    def step(h, inputs):
        u_t, dt_t, B_t, C_t = inputs
        a = jnp.exp(jnp.einsum("bd,dn->bdn", dt_t, A.astype(jnp.float32)))
        h = a * h + (dt_t * u_t)[..., None] * B_t[:, None, :]
        y = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y

    bsz, L, d = u.shape
    n = A.shape[1]
    h0 = jnp.zeros((bsz, d, n), jnp.float32)
    xs = (
        jnp.moveaxis(uf, 1, 0),
        jnp.moveaxis(delta, 1, 0),
        jnp.moveaxis(B.astype(jnp.float32), 1, 0),
        jnp.moveaxis(C.astype(jnp.float32), 1, 0),
    )
    _, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 1)
    if D is not None:
        y = y + uf * D.astype(jnp.float32)
    return y.astype(u.dtype)


class MambaBlock(nn.Module):
    """Mamba layer matching mamba_ssm's architecture hyperparameters.

    d_model: feature dim; d_state: SSM state size; d_conv: causal conv width;
    expand: inner expansion factor.
    """

    d_model: int
    d_state: int = 32
    d_conv: int = 4
    expand: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False
    # Mesh axis carrying contiguous sequence chunks (H-sharded raster
    # tokens): the causal depthwise conv fetches its d_conv-1 warm-up
    # tokens from the previous shard via ppermute, and the selective scan
    # runs the cross-device chunk-carry algebra (see selective_scan).
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, L, D] -> [B, L, D]."""
        d_inner = self.expand * self.d_model
        # mamba_ssm default dt_rank = ceil(d_model/16); matters whenever
        # d_model % 16 != 0 (e.g. WFB stage dims 24/48 packed bands) for
        # checkpoint-port compatibility.
        dt_rank = -(-self.d_model // 16)

        xz = nn.Dense(
            2 * d_inner, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name="in_proj",
        )(x.astype(self.dtype))
        xi, z = jnp.split(xz, 2, axis=-1)

        # Causal depthwise conv over the token axis (width d_conv).
        conv_kernel = self.param(
            "conv1d_kernel",
            nn.initializers.lecun_normal(),
            (self.d_conv, 1, d_inner),
            self.param_dtype,
        )
        conv_bias = self.param(
            "conv1d_bias", nn.initializers.zeros, (d_inner,), self.param_dtype
        )
        if self.axis_name is not None:
            # Warm-up context: the last d_conv-1 tokens PRECEDING this shard
            # in the global sequence. A shard may hold fewer than d_conv-1
            # tokens (bottleneck stages go down to 1 token/shard), so the
            # warm-up can span several shards: all-gather every shard's
            # (tiny) tail and fold the ones before this shard, newest last.
            # Zeros reach shard 0 — identical to the monolithic zero pad.
            wu = self.d_conv - 1
            t = min(xi.shape[1], wu)
            tails = jax.lax.all_gather(xi[:, -t:], self.axis_name)  # [P,B,t,D]
            idx = jax.lax.axis_index(self.axis_name)
            buf = jax.lax.pcast(
                jnp.zeros((xi.shape[0], wu, xi.shape[2]), xi.dtype),
                (self.axis_name,), to="varying",
            )
            for s in range(tails.shape[0]):
                cand = jnp.concatenate([buf, tails[s]], axis=1)[:, -wu:]
                buf = jnp.where(jnp.asarray(s) < idx, cand, buf)
            xpad = jnp.concatenate([buf, xi], axis=1)
        else:
            xpad = jnp.pad(xi, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        xc = jax.lax.conv_general_dilated(
            xpad,
            conv_kernel.astype(xi.dtype),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NLC", "LIO", "NLC"),
            feature_group_count=d_inner,
        ) + conv_bias.astype(xi.dtype)
        xc = jax.nn.silu(xc)

        # Selective projections.
        x_dbl = nn.Dense(
            dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="x_proj",
        )(xc)
        dt, B, C = jnp.split(x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt = nn.Dense(
            d_inner, dtype=self.dtype, param_dtype=self.param_dtype, name="dt_proj"
        )(dt)
        dt = jax.nn.softplus(dt)

        # A: negative-real init log-spaced 1..d_state (mamba's S4D-real init).
        A_log = self.param(
            "A_log",
            lambda key, shape, dtype: jnp.log(
                jnp.tile(jnp.arange(1, self.d_state + 1, dtype=dtype)[None], (d_inner, 1))
            ),
            (d_inner, self.d_state),
            jnp.float32,
        )
        A = -jnp.exp(A_log)
        Dskip = self.param("D", nn.initializers.ones, (d_inner,), jnp.float32)

        if self.use_pallas and self.axis_name is None:
            # Custom-VJP wrapper: the primal IS the fused kernel, and under
            # jax.grad the backward is a Pallas reverse scan
            # (kernels/ssm_scan.py training path) — so the flag is safe in
            # both inference and training.
            from bayer_low_light_image_enhancement_tpu.kernels.ssm_scan import (
                selective_scan_pallas_train,
            )

            y = selective_scan_pallas_train(xc, dt, A, B, C, Dskip)
        else:
            # Sharded sequences use the XLA path: the Pallas kernel is
            # per-device and takes no incoming state.
            y = selective_scan(xc, dt, A, B, C, Dskip, axis_name=self.axis_name)
        y = y * jax.nn.silu(z)
        return nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name="out_proj",
        )(y)
