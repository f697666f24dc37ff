"""In-graph marginal attribution for the canonical RawFormer (fused path).

Same methodology as ablate_wfb.py (isolated component timings sit on
dispatch floors; marginal = full-model delta with one component ablated to
a shape-preserving near-no-op). Targets the FUSED inference path
(models/fused_apply.py) at the full-resolution batch-1 operating point,
where round-5 found the non-attention XLA glue costs ~2.3x more per pixel
than at crop geometry.

Cases (composable deltas):
  none   full fused model
  attn   fused TransformerBlock kernel -> identity (both packed-tail and
         plain interception routes)
  stage  attn + stage tails (packed_stage_tail -> transformer passthrough,
         unpacked ConvTransformer -> identity); tail marginal =
         stage - attn
  updown Downsample/Upsample2x -> broadcast stand-ins (right shape, ~free)
  pconv  packed 1x1/3x3 head convs (embedding / skip-reduce / conv_out)
         -> broadcast stand-ins

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/ablate_fullres.py \
           [--shape 1,2832,4240,1] [--steps 8]
"""

from __future__ import annotations

import argparse
import time


def main():
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.kernels import fused_block as fbk
    from bayer_low_light_image_enhancement_tpu.models import common as common_mod
    from bayer_low_light_image_enhancement_tpu.models import fused_apply as fa
    from bayer_low_light_image_enhancement_tpu.models.rawformer import (
        RawFormer,
        RawFormerConfig,
    )
    from bayer_low_light_image_enhancement_tpu.ops import wpack as wpack_mod

    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="1,2832,4240,1")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--cases", default="none,attn,stage,updown,pconv")
    p.add_argument("--bands", type=int, default=1)
    args = p.parse_args()

    b, h, w, c = (int(v) for v in args.shape.split(","))
    unit = 16 * args.bands
    hp, wp = -(-h // unit) * unit, -(-w // 16) * 16
    model = RawFormer(RawFormerConfig(dim=args.dim, dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    xin = jax.random.uniform(key, (b, hp, wp, c), jnp.float32)
    params = jax.jit(model.init)(key, xin[:, :64, :64, :])
    fwd = (fa.make_banded_forward(model, args.bands) if args.bands > 1
           else fa.make_fused_forward(model))

    def timed(steps=args.steps, reps=2):
        @jax.jit
        def run(x):
            def body(carry, _):
                out = fwd(params, carry)
                bump = jnp.sum(out.astype(jnp.float32)) * 1e-20
                return carry + bump.astype(carry.dtype), ()

            final, _ = jax.lax.scan(body, x, None, length=steps)
            return jnp.sum(final.astype(jnp.float32))

        float(run(xin))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(run(xin))
        return (time.perf_counter() - t0) / (steps * reps) * 1e3

    def cheap(x, shape, dtype):
        # Keeps a data dependency but costs ~nothing.
        return jnp.broadcast_to(
            (jnp.mean(x.astype(jnp.float32)) * 1e-20).astype(dtype), shape
        )

    def down_id(self, x):
        bb, hh, ww, cc = x.shape
        return cheap(x, (bb, hh // 2, ww // 2, 2 * cc), x.dtype)

    def up_id(self, x):
        bb, hh, ww, cc = x.shape
        return cheap(x, (bb, 2 * hh, 2 * ww, self.features), x.dtype)

    def pconv_id(x, kernel, bias, f=4):
        bb, hh, ww, cc = x.shape
        return cheap(x, (bb, hh, ww, kernel.shape[-1]), x.dtype)

    attn_patches = [
        (fbk, "fused_transformer_block", lambda x, *a, **k: x),
        (fa, "fused_transformer_block", lambda x, *a, **k: x),
        (common_mod.TransformerBlock, "__call__", lambda self, x, *a, **k: x),
    ]
    ablations = {
        "none": [],
        "attn": attn_patches,
        "stage": attn_patches
        + [
            (wpack_mod, "packed_stage_tail", lambda x, t, params, f=4: t),
            (fa.wpack_ops, "packed_stage_tail", lambda x, t, params, f=4: t),
            (common_mod.ConvTransformer, "__call__",
             lambda self, x, *a, **k: x),
        ],
        "updown": [
            (common_mod.Downsample, "__call__", down_id),
            (common_mod.Upsample2x, "__call__", up_id),
        ],
        "pconv": [
            (wpack_mod, "packed_conv", pconv_id),
            (fa.wpack_ops, "packed_conv", pconv_id),
        ],
    }

    base = None
    for case in args.cases.split(","):
        saved = []
        for obj, attr, repl in ablations[case]:
            saved.append((obj, attr, getattr(obj, attr)))
            setattr(obj, attr, repl)
        try:
            ms = timed()
        finally:
            for obj, attr, orig in saved:
                setattr(obj, attr, orig)
        if case == "none":
            base = ms
            print(f"full model: {ms:9.3f} ms", flush=True)
        else:
            print(
                f"minus {case:6s}: {ms:9.3f} ms  (marginal {base - ms:+8.3f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
