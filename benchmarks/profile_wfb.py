"""Attribution profile for RawFormer-WFB (VERDICT r2 #4: the dispatch floor).

Times each WMB submodule in isolation at its per-stage geometry (device-side
lax.scan, one dispatch per measurement) and sums against the full model:

  stage geometries at batch 2 @ 512^2 input (space_to_depth -> 256^2):
    c1/c7: x [2,256,256,48]  -> LL/high bands at 128^2
    c2/c6: x [2,128,128,96]  -> 64^2
    c3/c5: x [2,64,64,192]   -> 32^2
    c4:    x [2,32,32,384]   -> 16^2

Usage: python benchmarks/profile_wfb.py [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, x, steps=50, reps=2):
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

    from bayer_low_light_image_enhancement_tpu.models.wfb import (
        WM,
        WMB,
        IlluminationEstimator,
        RawFormerWFB,
        RawFormerWFBConfig,
    )
    from bayer_low_light_image_enhancement_tpu.ops.fft import FFAB, FEB

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--dim", type=int, default=48)
    p.add_argument("--ssm_pallas", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--full", action="store_true", help="also time the full model")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # Per-stage geometries: (stage x shape, count across the U-Net)
    stages = [
        ((2, 256, 256, args.dim), 2),
        ((2, 128, 128, args.dim * 2), 2),
        ((2, 64, 64, args.dim * 4), 2),
        ((2, 32, 32, args.dim * 8), 1),
    ]

    total_attr = 0.0
    for shape, count in stages:
        b, h, w, c = shape
        x = jax.random.normal(key, shape, dt)
        ll = jax.random.normal(key, (b, h // 2, w // 2, c), dt)
        high = jax.random.normal(key, (3 * b, h // 2, w // 2, c), dt)

        rows = {}
        for name, mod, inp in [
            ("WMB(whole)", WMB(dtype=dt), x),
            ("  FFAB", FFAB(dtype=dt), ll),
            ("  FEB(one)", FEB(dtype=dt), ll),
            ("  Illu", IlluminationEstimator(c, c, dtype=dt), ll),
            ("  WM(ssm)", WM(dtype=dt, ssm_pallas=args.ssm_pallas), high),
        ]:
            params = jax.jit(mod.init)(key, inp)
            if name == "  Illu":
                fn = lambda v, m=mod, p=params: m.apply(p, v)[0]
            else:
                fn = lambda v, m=mod, p=params: m.apply(p, v)
            ms = timed(fn, inp, args.steps) * 1e3
            rows[name] = ms
            print(f"[{h}x{w} C={c}] x{count} {name:12s} {ms:8.3f} ms", flush=True)
        total_attr += count * rows["WMB(whole)"]

    print(f"\nsum(WMB x count): {total_attr:.2f} ms", flush=True)
    if args.full:
        cfg = RawFormerWFBConfig(dim=args.dim, dtype=dt, ssm_pallas=args.ssm_pallas)
        model = RawFormerWFB(cfg)
        xin = jax.random.normal(key, (2, 512, 512, 1), jnp.float32)
        params = jax.jit(model.init)(key, xin)
        full = timed(lambda v: model.apply(params, v), xin, max(args.steps // 2, 10)) * 1e3
        print(f"full model: {full:.2f} ms/step", flush=True)
        print(f"non-WMB residue (convs/up/down/embed): {full - total_attr:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
