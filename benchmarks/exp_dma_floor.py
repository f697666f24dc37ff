"""A/B the fused-block kernels' data-movement strategy.

probe_floor.py located the per-grid-step floor: at [8,256,256,32] th=16 the
EMPTY production structure (3-block halo specs + concat) costs 0.625 ms —
~4x the single-fetch traffic roofline — because every row is DMA'd three
times (prev/cur/nxt block specs) and then copied a fourth time by the
window concat. This experiment times three structures at each compute
level:

  blocked3  production: prev/cur/nxt blocked specs + jnp.concatenate
  blocked1  single cur spec, no halo (the blocked pipeline's lower bound;
            not semantically valid — movement cost yardstick only)
  dma       x stays in HBM (memory_space=ANY); the kernel double-buffers
            OVERLAPPING [th+4, wp, cg] windows into VMEM scratch with
            explicit make_async_copy. Input is H-padded by 4 rows so
            window i = rows [i*th, i*th+th+4) is static and in-bounds and
            the center rows sit at 2:th+2 exactly like the production
            window. Each row is fetched ~(th+4)/th times and never copied
            again.

Levels: c = copy center rows out; m = c + 6 matmuls; v = m + the VPU mix
(2 depthwise passes + exact GELU + rolls), i.e. probe_floor's p3.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_dma_floor.py
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
        _dw3x3,
        _gelu_exact,
        _matmul,
        _win,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="8,256,256,32")
    p.add_argument("--th", type=int, default=16)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--cases", default="blocked3,blocked1,dma")
    p.add_argument("--levels", default="c,m,v")
    args = p.parse_args()
    b, h, w, c = map(int, args.shape.split(","))
    g = max(1, 256 // c)
    g = next(gg for gg in range(min(g, b), 0, -1) if b % gg == 0)
    b2, cg = b // g, g * c
    th = args.th
    hp = -(-h // th) * th
    nt = hp // th
    tw = w
    wp = tw + 4

    # Explicit DMA slices must be tile-aligned in the sublane dim: round the
    # dma case's W up to a multiple of 8 (trailing columns are garbage the
    # center extraction never reads).
    wp_dma = -(-wp // 8) * 8

    rng = np.random.default_rng(0)
    # dma case: H padded by 4 (2 top + 2 bottom) so overlapping windows are
    # static; blocked cases consume the unpadded layout production uses.
    xw = jnp.asarray(rng.uniform(-1, 1, (b2, 1, hp + 4, wp_dma, cg)), jnp.bfloat16)
    xu = xw[:, :, 2 : hp + 2, :wp]
    wmat = jnp.asarray(rng.uniform(-0.1, 0.1, (cg, cg)), jnp.float32)
    wdw = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, cg)), jnp.float32)

    def compute(x, w_ref, dw_ref, level):
        """x: [th+4, wp, cg] window. Returns [th, tw, cg] center result."""
        if level == "c":
            return x[2 : th + 2, :tw]
        if level == "m":
            y = x
            for _ in range(6):
                y = _matmul(y, w_ref)
            return y[2 : th + 2, :tw]
        y = _matmul(x, w_ref)
        y = _dw3x3(y, dw_ref)
        y = _matmul(y, w_ref)
        y = _matmul(y, w_ref)
        y = jnp.roll(y, -1, axis=1) + _matmul(y, w_ref)
        y = _dw3x3(jnp.pad(y, ((1, 1), (0, 0), (0, 0))), dw_ref)
        y = _gelu_exact(y)
        y = _matmul(y, w_ref)
        y = _matmul(y, w_ref)
        return y[1 : th + 1, :tw]

    out_spec = pl.BlockSpec(
        (1, th, tw, cg), lambda bb, i: (bb, i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b2, hp, tw, cg), jnp.bfloat16)
    rep = lambda s: pl.BlockSpec(s, lambda bb, i: (0,) * len(s), memory_space=pltpu.VMEM)

    def build_blocked(level, nhalo):
        blk = lambda f: pl.BlockSpec(
            (1, 1, th, wp, cg),
            lambda bb, i, f=f: (bb, 0, f(i), 0, 0),
            memory_space=pltpu.VMEM,
        )

        if nhalo == 3:
            def kern(prev_ref, cur_ref, nxt_ref, w_ref, dw_ref, out_ref):
                x = _win(prev_ref, cur_ref, nxt_ref, th)
                out_ref[0] = compute(x, w_ref, dw_ref, level)

            in_specs = [
                blk(lambda i: jnp.maximum(i - 1, 0)),
                blk(lambda i: i),
                blk(lambda i: jnp.minimum(i + 1, nt - 1)),
                rep((cg, cg)),
                rep((3, 3, cg)),
            ]
        else:
            def kern(cur_ref, w_ref, dw_ref, out_ref):
                x = jnp.pad(cur_ref[0, 0], ((2, 2), (0, 0), (0, 0)))
                out_ref[0] = compute(x, w_ref, dw_ref, level)

            in_specs = [blk(lambda i: i), rep((cg, cg)), rep((3, 3, cg))]

        call = pl.pallas_call(
            kern,
            grid=(b2, nt),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel"),
            ),
        )
        if nhalo == 3:
            return lambda x: call(x, x, x, wmat, wdw)
        return lambda x: call(x, wmat, wdw)

    def build_dma(level):
        def kern(x_hbm, w_ref, dw_ref, out_ref, buf, sems):
            bb = pl.program_id(0)
            i = pl.program_id(1)
            step = bb * nt + i

            def start(s):
                # window for linear step s: batch s//nt, tile s%nt
                sb, si = s // nt, s % nt
                pltpu.make_async_copy(
                    x_hbm.at[sb, 0, pl.ds(si * th, th + 4)],
                    buf.at[s % 2],
                    sems.at[s % 2],
                ).start()

            @pl.when(step == 0)
            def _():
                start(0)

            @pl.when(step + 1 < b2 * nt)
            def _():
                start(step + 1)

            pltpu.make_async_copy(
                x_hbm.at[bb, 0, pl.ds(i * th, th + 4)],
                buf.at[step % 2],
                sems.at[step % 2],
            ).wait()
            x = buf[step % 2]
            out_ref[0] = compute(x, w_ref, dw_ref, level)

        call = pl.pallas_call(
            kern,
            grid=(b2, nt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                rep((cg, cg)),
                rep((3, 3, cg)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, th + 4, wp_dma, cg), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return lambda x: call(x, wmat, wdw)

    for case in args.cases.split(","):
        for level in args.levels.split(","):
            if case == "blocked3":
                fn, xin = build_blocked(level, 3), xu
            elif case == "blocked1":
                fn, xin = build_blocked(level, 1), xu
            else:
                fn, xin = build_dma(level), xw

            @jax.jit
            def run(xw, fn=fn):
                def body(carry, _):
                    y = fn(carry)
                    bump = jnp.sum(y.astype(jnp.float32)) * 1e-20
                    return carry + bump.astype(carry.dtype), ()

                f, _ = jax.lax.scan(body, xw, None, length=args.steps)
                return jnp.sum(f.astype(jnp.float32))

            try:
                float(run(xin))
            except Exception as e:
                print(f"{case}/{level} th={th}: FAILED {type(e).__name__}: {e}")
                continue
            t0 = time.perf_counter()
            for _ in range(3):
                float(run(xin))
            dt = (time.perf_counter() - t0) / (3 * args.steps)
            print(f"{case}/{level} th={th}: {dt * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
