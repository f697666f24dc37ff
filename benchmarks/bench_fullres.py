"""Full-resolution (batch-1 12MP Sony frame) operating-point bench.

The reference's eval protocol is full-frame batch-1
(``/root/reference/test.py:72,107-116``); this scripts the A/B rows for
BENCHMARKS.md "Full-resolution operating point": plain XLA vs the fused
pipeline (fused TransformerBlock with spatial lane packing + W-phase-packed
stage tails, models/fused_apply.py).

Usage: python benchmarks/bench_fullres.py [--shape 1,2832,4240,1] \
           [--variants xla,fused] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, x, steps, reps=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(carry, _):
            out = fn(carry)
            bump = jnp.sum(out.astype(jnp.float32)) * 1e-20
            return carry + bump.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.sum(final.astype(jnp.float32))

    float(run(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(x))
    return (time.perf_counter() - t0) / (steps * reps)


def main():
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.models.fused_apply import (
        make_banded_forward,
        make_fused_forward,
        pick_bands,
    )
    from bayer_low_light_image_enhancement_tpu.models.rawformer import (
        RawFormer,
        RawFormerConfig,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="1,2832,4240,1")
    p.add_argument("--variants", default="xla,fused")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dim", type=int, default=32)
    args = p.parse_args()

    b, h, w, c = (int(v) for v in args.shape.split(","))
    # The eval CLI pads to the /16 grid (cli/test_cli.py); do the same here.
    hp, wp = -(-h // 16) * 16, -(-w // 16) * 16
    mp = b * hp * wp / 1e6

    cfg = RawFormerConfig(dim=args.dim, dtype=jnp.bfloat16)
    model = RawFormer(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (b, hp, wp, c), jnp.float32)
    params = jax.jit(model.init)(key, x[:, :64, :64, :])

    for v in args.variants.split(","):
        hq, xq, mq = hp, x, mp
        if v == "banded":
            # The eval CLI's round-5 default: pad H into 8 equal
            # /16-divisible bands; rate reported on the padded pixels the
            # run actually processes (the driver metric divides by REAL
            # frame pixels separately).
            hq = -(-h // 128) * 128
            xq = jax.random.uniform(key, (b, hq, wp, c), jnp.float32)
            mq = b * hq * wp / 1e6
            fwd = make_banded_forward(model, pick_bands(hq))
        elif v == "fused":
            fwd = make_fused_forward(model)
        else:
            fwd = model.apply
        ms = timed(lambda t, f=fwd: f(params, t), xq, args.steps) * 1e3
        print(f"{v:6s} [{b},{hq},{wp}] dim={args.dim}: {ms:8.2f} ms  "
              f"{mq / ms * 1e3:7.2f} MP/s", flush=True)


if __name__ == "__main__":
    main()
