"""Bisect the v5 apply+FFN kernel's pathological Mosaic compile.

Rebuilds _apply_ffn_kernel_v5's body incrementally (dummy weights, the
production DMA-window structure at [8,256,256,32] th=16) so the stage that
explodes compile time can be identified. Levels:

  1  window + _ln_fast + v-matmul + masked-bias add + rowmask mult
  2  + depthwise v + bias + apply matmul + bproj
  3  + first residual + cm1/rmy cleanup
  4  + LN2 + FFN expand matmul + masked bias + rowmask
  5  + FFN depthwise + GELU + project + second residual   (full v5 B)

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bisect_b5.py --level N
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bayer_low_light_image_enhancement_tpu.kernels.fused_block import (
        _BF16,
        _F32,
        _dma_window,
        _dw3x3,
        _gelu_exact,
        _ln_fast,
        _matmul,
        _rowmask,
        _replicated,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=5)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--mask_mode", default="input", choices=["input", "iota"],
                   help="input: rank-2 [wp,C] masked-bias/colmask inputs; "
                        "iota: rank-1 biases + combined [rows,wp,1] masks")
    p.add_argument("--th", type=int, default=16)
    p.add_argument("--dw_dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--ln", default="fast", choices=["fast", "core"])
    args = p.parse_args()

    b, h, w, c = 8, 256, 256, 32
    g = 8
    b2, cg = b // g, g * c
    ch = 2 * c
    chg = g * ch
    th = args.th
    hp = h
    nt = hp // th
    tw = w
    nw = 1
    extra = (-(tw + 4)) % 8
    r, wp = th + 4, tw + 4 + extra
    level = args.level

    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.uniform(-1, 1, (b2, nw, hp + 4, wp, cg)), _BF16)
    msum = jnp.asarray(np.kron(np.eye(g), np.full((c, c), 1.0 / c)), _BF16)
    wv = jnp.asarray(rng.uniform(-0.1, 0.1, (cg, cg)), _BF16)
    bvm = jnp.asarray(rng.uniform(-0.1, 0.1, (nw, wp, cg)), _BF16)
    dw_t = _BF16 if args.dw_dtype == "bf16" else _F32
    dwv = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, cg)), dw_t)
    bdwv = jnp.asarray(rng.uniform(-0.1, 0.1, (1, cg)), _BF16)
    apply_m = jnp.asarray(rng.uniform(-0.1, 0.1, (b2, cg, cg)), _BF16)
    bproj = jnp.asarray(rng.uniform(-0.1, 0.1, (1, cg)), _BF16)
    wp1 = jnp.asarray(rng.uniform(-0.1, 0.1, (cg, chg)), _BF16)
    bp1m = jnp.asarray(rng.uniform(-0.1, 0.1, (nw, wp, chg)), _BF16)
    dwf = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, chg)), dw_t)
    bdwf = jnp.asarray(rng.uniform(-0.1, 0.1, (1, chg)), _BF16)
    wp2 = jnp.asarray(rng.uniform(-0.1, 0.1, (chg, cg)), _BF16)
    bp2 = jnp.asarray(rng.uniform(-0.1, 0.1, (1, cg)), _BF16)
    cm1 = jnp.asarray(rng.uniform(0, 1, (nw, wp, cg)) > 0.1, _BF16)

    iota_mode = args.mask_mode == "iota"
    if args.ln == "fast":
        _ln = _ln_fast
    else:
        # _ln_fast structure but fp32 post-matmul arithmetic (tests whether
        # the bf16 subtract/scale are, like the bf16 depthwise taps, slower
        # than fp32 on this backend).
        def _ln(x, m_ref):
            mu = _matmul(x, m_ref, _F32)
            d = x.astype(_F32) - mu
            db = d.astype(_BF16)
            var = _matmul(db * db, m_ref, _F32)
            return (d * jax.lax.rsqrt(var + 1e-5)).astype(_BF16)

    def _mask2(i, rows, off_r, off_c):
        # Combined row+col validity [rows, wp, 1] (lane-independent cols).
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 0) + (i * th + off_r)
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 1) + off_c
        return ((ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)).astype(_BF16)

    def kern(x_ref, msum_ref, apply_ref, wv_ref, bvm_ref, dwv_ref, bdwv_ref,
             bproj_ref, wp1_ref, bp1m_ref, dwf_ref, bdwf_ref, wp2_ref,
             bp2_ref, cm1_ref, out_ref, buf, sems):
        bb = pl.program_id(0)
        j = pl.program_id(1)
        i = pl.program_id(2)
        x = _dma_window(x_ref, buf, sems, bb, j, i, nw=nw, nt=nt, th=th)
        xn = _ln(x, msum_ref)
        if iota_mode:
            z = (_matmul(xn, wv_ref) + bvm_ref[0, 0]) * _mask2(i, r, -2, -2)
        else:
            z = (_matmul(xn, wv_ref) + bvm_ref[0]) * _rowmask(i, th, r, wp, h)
        if level == 1:
            out_ref[0] = z[2 : th + 2, :tw].astype(out_ref.dtype)
            return
        v = _dw3x3(z, dwv_ref) + bdwv_ref[0]
        att = _matmul(v, apply_ref[0]) + bproj_ref[0]
        if level == 2:
            out_ref[0] = att[1 : th + 1, :tw].astype(out_ref.dtype)
            return
        if iota_mode:
            my = _mask2(i, th + 2, -1, -1)
            y = (jnp.roll(x[1 : r - 1], -1, axis=1) + att) * my
        else:
            my = _rowmask(i, th, th + 2, wp, h, -1)
            y = (jnp.roll(x[1 : r - 1], -1, axis=1) + att) * cm1_ref[0] * my
        if level == 3:
            out_ref[0] = y[1 : th + 1, :tw].astype(out_ref.dtype)
            return
        yn = _ln(y, msum_ref)
        if iota_mode:
            t = (_matmul(yn, wp1_ref) + bp1m_ref[0, 0]) * my
        else:
            t = (_matmul(yn, wp1_ref) + bp1m_ref[0]) * my
        if level == 4:
            out_ref[0] = t[1 : th + 1, :tw, :cg].astype(out_ref.dtype)
            return
        f = _gelu_exact(_dw3x3(t, dwf_ref) + bdwf_ref[0])
        f = _matmul(f, wp2_ref) + bp2_ref[0]
        out = jnp.roll(y[1 : th + 1], -1, axis=1) + f
        out_ref[0] = out[:, :tw].astype(out_ref.dtype)

    _jspec = lambda shape: pl.BlockSpec(
        shape, lambda bb, j, i: (j, 0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kern,
        grid=(b2, nw, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            _replicated((cg, cg)),
            pl.BlockSpec((1, cg, cg), lambda bb, j, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            _replicated((cg, cg)),
            _jspec((1, wp, cg)),
            _replicated((3, 3, cg)),
            _replicated((1, cg)),
            _replicated((1, cg)),
            _replicated((cg, chg)),
            _jspec((1, wp, chg)),
            _replicated((3, 3, chg)),
            _replicated((1, chg)),
            _replicated((chg, cg)),
            _replicated((1, cg)),
            _jspec((1, wp, cg)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, cg), lambda bb, j, i: (bb, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b2, hp, tw, cg), _BF16),
        scratch_shapes=[
            pltpu.VMEM((2, r, wp, cg), _BF16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",) * 3,
        ),
    )

    fn = lambda x: call(x, msum, apply_m, wv, bvm, dwv, bdwv, bproj, wp1,
                        bp1m, dwf, bdwf, wp2, bp2, cm1)

    @jax.jit
    def run(xw):
        def body(carry, _):
            y = fn(carry)
            bump = jnp.sum(y.astype(_F32)) * 1e-20
            return carry + bump.astype(carry.dtype), ()

        fin, _ = jax.lax.scan(body, xw, None, length=args.steps)
        return jnp.sum(fin.astype(_F32))

    t0 = time.perf_counter()
    float(run(xw))
    print(f"level {level}: compile+first {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(3):
        float(run(xw))
    dt = (time.perf_counter() - t0) / (3 * args.steps)
    print(f"level {level}: {dt * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
