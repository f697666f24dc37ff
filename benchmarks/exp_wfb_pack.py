"""W-phase packing experiments for the WFB stage convs (VERDICT r4 #2a).

The round-4 marginal attribution left ~11 ms of lane-starved C=48..384
XLA stage convs/LN/DWT in RawFormer-WFB (BENCHMARKS.md round-4 table).
This measures, one interception rule at a time, which conv families win
from the ops/wpack.py W-phase-packed rewrite at WFB's dim=48 geometry
(C=48 fills 48/128 lanes; f=2 fills 96/128).

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_wfb_pack.py
"""

from __future__ import annotations

import argparse
import time


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.models.common import Conv2d
    from bayer_low_light_image_enhancement_tpu.models.wfb import (
        RawFormerWFB,
        RawFormerWFBConfig,
    )
    from bayer_low_light_image_enhancement_tpu.ops import wpack as wpack_ops

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--cases", default="base,s48,s48e,s48r,s48g")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    xin = jax.random.normal(key, (2, 512, 512, 1), jnp.float32)
    cfg = RawFormerWFBConfig(dim=48, dtype=jnp.bfloat16, ssm_pallas=True)
    model = RawFormerWFB(cfg)
    params = jax.jit(model.init)(key, xin)

    def plain_conv(m: Conv2d, x):
        return (
            isinstance(m, Conv2d)
            and m.spatial_axis is None
            and m.stride == 1
            and m.dilation == 1
            and m.groups == 1
            and getattr(x, "ndim", 0) == 4
            and wpack_ops.conv_fusable(x, 2)
        )

    # Interception rules, cumulative families:
    #   s48 : 3x3 C48 -> C48 (stage conv / conv_out / WM smooth), f=2
    #   s48e: + the 4->48 embedding 3x3 (f=2) and 48->12 head
    #   s48r: + the 1x1 96->48 reduces (channel_reduce, packed in = 192)
    #   s48g: + 3x3 48->96 (WM convb_0; packed out = 192)
    def rule(case):
        def should(m, x):
            if not plain_conv(m, x):
                return False
            cin, cout, k = x.shape[-1], m.features, m.kernel_size
            if k == 3 and cin == 48 and cout == 48:
                return True
            if case in ("s48e", "s48r", "s48g") and k == 3 and cin == 4:
                return True
            if case in ("s48e", "s48r", "s48g") and k == 3 and cin == 48 and cout == 12:
                return True
            if case in ("s48r", "s48g") and k == 1 and cin == 96 and cout == 48:
                return True
            if case == "s48g" and k == 3 and cin == 48 and cout == 96:
                return True
            return False

        return should

    def timed(should, steps=args.steps, reps=2):
        def interceptor(next_fn, iargs, ikwargs, context):
            m = context.module
            if context.method_name == "__call__" and should(m, iargs[0] if iargs else None):
                pr = m.variables["params"]
                x = iargs[0].astype(m.dtype)
                return wpack_ops.packed_conv(x, pr["kernel"], pr.get("bias"), f=2)
            return next_fn(*iargs, **ikwargs)

        @jax.jit
        def run(x):
            def body(carry, _):
                with nn.intercept_methods(interceptor):
                    out = model.apply(params, carry)
                bump = jnp.mean(out.astype(jnp.float32)) * 1e-20
                return carry + bump.astype(carry.dtype), ()

            final, _ = jax.lax.scan(body, x, None, length=steps)
            return jnp.sum(final.astype(jnp.float32))

        float(run(xin))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(run(xin))
        return (time.perf_counter() - t0) / (steps * reps) * 1e3

    for case in args.cases.split(","):
        should = (lambda m, x: False) if case == "base" else rule(case)
        ms = timed(should)
        print(f"{case:6s}: {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
