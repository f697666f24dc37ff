"""Bisect the fused-block kernels' per-grid-step cost floor.

The v3 instruction-count cuts (merged qk, folded affines, bf16 GELU) moved
nothing (BENCHMARKS.md round-3), so the limiter is structural. This probe
times a ladder of stripped kernels sharing the production window structure
(3-block halo windows over [1, nw, hp, Wp, Cg] with the same BlockSpecs) to
locate the floor:

  p0: window assembly + write cur rows              (DMA/pipeline floor)
  p1: p0 + 1 matmul [.., Cg]@[Cg, Cg]
  p2: p0 + 6 matmuls (kernel B's MXU count)
  p3: p2 + 2 depthwise passes + GELU + rolls        (~kernel B's VPU mix)

Usage: python benchmarks/probe_floor.py [--th 16] [--shape 8,256,256,32]
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
    p.add_argument("--levels", default="p0,p1,p2,p3")
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

    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.uniform(-1, 1, (b2, 1, hp, wp, cg)), jnp.bfloat16)
    wmat = jnp.asarray(rng.uniform(-0.1, 0.1, (cg, cg)), jnp.float32)
    wdw = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, cg)), jnp.float32)

    def kern(prev_ref, cur_ref, nxt_ref, w_ref, dw_ref, out_ref, *, level):
        x = _win(prev_ref, cur_ref, nxt_ref, th)
        r = x.shape[0]
        if level == 0:
            out_ref[0] = x[2 : th + 2, :tw]
            return
        if level == 1:
            y = _matmul(x, w_ref)
            out_ref[0] = y[2 : th + 2, :tw]
            return
        if level == 2:
            y = x
            for _ in range(6):
                y = _matmul(y, w_ref)
            out_ref[0] = y[2 : th + 2, :tw]
            return
        # level 3: kernel-B-like mix: m1 -> dw -> m2 -> m3 -> m4 ->
        # dw -> gelu -> m5 -> m6 + rolls
        y = _matmul(x, w_ref)
        y = _dw3x3(y, dw_ref)
        y = _matmul(y, w_ref)
        y = _matmul(y, w_ref)
        y = jnp.roll(y, -1, axis=1) + _matmul(y, w_ref)
        y = _dw3x3(jnp.pad(y, ((1, 1), (0, 0), (0, 0))), dw_ref)
        y = _gelu_exact(y)
        y = _matmul(y, w_ref)
        y = _matmul(y, w_ref)
        out_ref[0] = y[1 : th + 1, :tw]

    blk = lambda f: pl.BlockSpec(
        (1, 1, th, wp, cg),
        lambda bb, j, i: (bb, j, f(i), 0, 0),
        memory_space=pltpu.VMEM,
    )
    rep = lambda s: pl.BlockSpec(s, lambda bb, j, i: (0,) * len(s), memory_space=pltpu.VMEM)

    def build(level):
        return pl.pallas_call(
            functools.partial(kern, level=level),
            grid=(b2, 1, nt),
            in_specs=[
                blk(lambda i: jnp.maximum(i - 1, 0)),
                blk(lambda i: i),
                blk(lambda i: jnp.minimum(i + 1, nt - 1)),
                rep((cg, cg)),
                rep((3, 3, cg)),
            ],
            out_specs=pl.BlockSpec(
                (1, th, tw, cg), lambda bb, j, i: (bb, i, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b2, hp, tw, cg), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
        )

    for name in args.levels.split(","):
        level = int(name[1:])
        call = build(level)

        @jax.jit
        def run(xw):
            def body(carry, _):
                y = call(carry, carry, carry, wmat, wdw)
                bump = jnp.sum(y.astype(jnp.float32)) * 1e-20
                return carry + bump.astype(carry.dtype), ()

            f, _ = jax.lax.scan(body, xw, None, length=args.steps)
            return jnp.sum(f.astype(jnp.float32))

        float(run(xw))
        t0 = time.perf_counter()
        for _ in range(3):
            float(run(xw))
        dt = (time.perf_counter() - t0) / (3 * args.steps)
        print(f"{name} th={th}: {dt * 1e3:8.3f} ms  ({nt} steps/kernel)")


if __name__ == "__main__":
    main()
