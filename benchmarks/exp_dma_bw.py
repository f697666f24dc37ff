"""Locate the fused-block DMA floor's limiter and the knobs that move it.

exp_dma_floor.py established that at [8,256,256,32] th=16 BOTH window
structures (blocked specs and explicit double-buffered DMA) pay ~0.6 ms
just to move x in + out (~110 GB/s effective vs ~819 GB/s HBM peak), and
that matmuls added on top are nearly free (they hide under the copy). So
the fused block's remaining 2x over its compute is DMA *parallelism*, not
instruction count. This experiment sweeps, at the copy and VPU-mix levels:

  --nbuf N    scratch slots / outstanding window copies (2 = production)
  --split k   split each window copy into k parallel sub-copies along W,
              each with its own semaphore (engages multiple DMA queues)
  --th        window height (fewer, larger copies per kernel)

Usage: python benchmarks/exp_dma_bw.py --shape 8,256,256,32 \
          --th 16,32,64 --nbuf 2,4 --split 1,2 --levels c,v
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
    )

    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="8,256,256,32")
    p.add_argument("--th", default="16,32,64")
    p.add_argument("--nbuf", default="2,4")
    p.add_argument("--split", default="1,2")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--levels", default="c,v")
    args = p.parse_args()
    b, h, w, c = map(int, args.shape.split(","))
    g = max(1, 256 // c)
    g = next(gg for gg in range(min(g, b), 0, -1) if b % gg == 0)
    b2, cg = b // g, g * c

    rng = np.random.default_rng(0)
    wmat = jnp.asarray(rng.uniform(-0.1, 0.1, (cg, cg)), jnp.float32)
    wdw = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, cg)), jnp.float32)

    def build(th, nbuf, split, level):
        hp = -(-h // th) * th
        nt = hp // th
        tw = w
        wp = -(-(tw + 4) // (8 * split)) * 8 * split
        r = th + 4
        wsub = wp // split

        xw = jnp.asarray(
            rng.uniform(-1, 1, (b2, 1, hp + 4, wp, cg)), jnp.bfloat16
        )

        def compute(x, w_ref, dw_ref):
            if level == "c":
                return x[2 : th + 2, :tw]
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

        def kern(x_hbm, w_ref, dw_ref, out_ref, buf, sems):
            bb = pl.program_id(0)
            i = pl.program_id(1)
            step = bb * nt + i
            total = b2 * nt

            def start(s):
                sb, si = s // nt, s % nt
                slot = s % nbuf
                for kk in range(split):
                    pltpu.make_async_copy(
                        x_hbm.at[
                            sb, 0, pl.ds(si * th, th + 4),
                            pl.ds(kk * wsub, wsub),
                        ],
                        buf.at[slot, slice(None), pl.ds(kk * wsub, wsub)],
                        sems.at[slot, kk],
                    ).start()

            def wait(s):
                slot = s % nbuf
                for kk in range(split):
                    pltpu.make_async_copy(
                        x_hbm.at[
                            s // nt, 0, pl.ds((s % nt) * th, th + 4),
                            pl.ds(kk * wsub, wsub),
                        ],
                        buf.at[slot, slice(None), pl.ds(kk * wsub, wsub)],
                        sems.at[slot, kk],
                    ).wait()

            # Bootstrap: at step 0 start windows 0..nbuf-2; every step
            # starts window step+nbuf-1, keeping nbuf-1 copies in flight.
            @pl.when(step == 0)
            def _():
                for s0 in range(min(nbuf - 1, total)):
                    start(s0)

            @pl.when(step + nbuf - 1 < total)
            def _():
                start(step + nbuf - 1)

            wait(step)
            x = buf[step % nbuf]
            out_ref[0] = compute(x, w_ref, dw_ref)

        out_spec = pl.BlockSpec(
            (1, th, tw, cg), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        rep = lambda s: pl.BlockSpec(
            s, lambda bb, i: (0,) * len(s), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kern,
            grid=(b2, nt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                rep((cg, cg)),
                rep((3, 3, cg)),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b2, hp, tw, cg), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((nbuf, r, wp, cg), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((nbuf, split)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return (lambda x: call(x, wmat, wdw)), xw

    for th in map(int, args.th.split(",")):
        for nbuf in map(int, args.nbuf.split(",")):
            for split in map(int, args.split.split(",")):
                for level in args.levels.split(","):
                    try:
                        fn, xin = build(th, nbuf, split, level)

                        @jax.jit
                        def run(xw, fn=fn):
                            def body(carry, _):
                                y = fn(carry)
                                bump = jnp.sum(y.astype(jnp.float32)) * 1e-20
                                return carry + bump.astype(carry.dtype), ()

                            f, _ = jax.lax.scan(
                                body, xw, None, length=args.steps
                            )
                            return jnp.sum(f.astype(jnp.float32))

                        float(run(xin))
                        t0 = time.perf_counter()
                        for _ in range(3):
                            float(run(xin))
                        dt = (time.perf_counter() - t0) / (3 * args.steps)
                        print(
                            f"th={th:3d} nbuf={nbuf} split={split} {level}: "
                            f"{dt * 1e3:8.3f} ms",
                            flush=True,
                        )
                    except Exception as e:
                        print(
                            f"th={th:3d} nbuf={nbuf} split={split} {level}: "
                            f"FAILED {type(e).__name__}: {e}",
                            flush=True,
                        )


if __name__ == "__main__":
    main()
