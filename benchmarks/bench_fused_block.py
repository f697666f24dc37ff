"""Microbench driver for the fused TransformerBlock kernel (BENCHMARKS.md).

Times the isolated block at the dominant level-1 geometry [8,256,256,32]
(and any --shape), with a carried-dependency device-side lax.scan (one
dispatch per measurement — host-side timing lies on this tunneled backend).

Variants let the kernel's stages be timed separately and A/B'd:
  xla        — the plain flax TransformerBlock (models/common.py)
  fused      — the production fused kernel (kernels/fused_block.py)
  gram       — kernel A (gram/sumsq accumulation) only
  apply      — kernel B (attention-apply + FFN) only, dummy apply matrix
  finalise   — the XLA [C,C] finalise only, on precomputed gram stats

Usage (ONE TPU process at a time on this box):
  python benchmarks/bench_fused_block.py --variants xla,fused,gram,apply
  python benchmarks/bench_fused_block.py --shape 8,64,64,128 --variants xla,fused
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def build_block_params(c: int, num_heads: int = 8, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.models.common import TransformerBlock

    block = TransformerBlock(num_heads=num_heads, dtype=jnp.bfloat16)
    params = block.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, c), jnp.bfloat16)
    )
    return block, params


def timed(fn, args, steps=100, reps=3):
    """Seconds per call via a carried-dependency scan in one dispatch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        x = a[-1]

        def body(carry, _):
            out = fn(*a[:-1], carry)
            leaves = jax.tree.leaves(out)
            bump = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-20
            return carry + bump.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.sum(final.astype(jnp.float32))

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(*args))
    return (time.perf_counter() - t0) / (steps * reps)


def main():
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.kernels import fused_block as fb

    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="8,256,256,32")
    p.add_argument("--variants", default="xla,fused")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--tile_rows", type=int, default=None)
    p.add_argument("--group", type=int, default=None)
    p.add_argument("--check", action="store_true", help="print fused-vs-xla max err")
    args = p.parse_args()

    b, h, w, c = map(int, args.shape.split(","))
    block, params = build_block_params(c, args.heads)
    bp = params["params"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), jnp.bfloat16)

    kw = {}
    if args.tile_rows is not None:
        kw["tile_rows"] = args.tile_rows
    if args.group is not None:
        kw["group"] = args.group

    def fused_fn(x):
        return fb.fused_transformer_block(x, bp, args.heads, **kw)

    if args.check:
        ref = block.apply(params, x)
        got = fused_fn(x)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"max_abs_err fused vs xla: {err:.3e}")

    for name in args.variants.split(","):
        name = name.strip()
        if name == "xla":
            fn = lambda x: block.apply(params, x)
            t = timed(fn, (x,), steps=args.steps)
        elif name == "fused":
            t = timed(fused_fn, (x,), steps=args.steps)
        elif name == "gram":
            fn = functools.partial(
                fb.gram_pass, params=bp, num_heads=args.heads, **kw
            )
            t = timed(fn, (x,), steps=args.steps)
        elif name == "apply":
            apply_dummy = jnp.zeros((b, c, c), jnp.float32)
            fn = lambda a, x: fb.apply_pass(
                x, a, params=bp, num_heads=args.heads, **kw
            )
            t = timed(fn, (apply_dummy, x), steps=args.steps)
        elif name == "finalise":
            gram = jnp.asarray(rng.uniform(0, 1, (b, c, c)), jnp.float32)
            qss = jnp.asarray(rng.uniform(0.5, 1, (b, c)), jnp.float32)
            kss = jnp.asarray(rng.uniform(0.5, 1, (b, c)), jnp.float32)
            wproj = jnp.reshape(bp["attn"]["project_out"]["kernel"], (c, c))
            temp = bp["attn"]["temperature"]

            def fn(gram, qss, kss, x):
                ap = fb.finalize_attention(gram, qss, kss, temp, wproj, args.heads)
                return ap.astype(jnp.bfloat16)

            t = timed(fn, (gram, qss, kss, x), steps=args.steps)
        else:
            raise SystemExit(f"unknown variant {name}")
        print(f"{name:10s} {t * 1e3:8.3f} ms  ({b}x{h}x{w}x{c})")


if __name__ == "__main__":
    main()
