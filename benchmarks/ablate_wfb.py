"""In-graph marginal attribution for RawFormer-WFB.

profile_wfb.py's isolated component timings do not sum to the full model
(137 ms of isolated WMB pieces vs 42.75 ms full — small-tensor dispatch
floors dominate isolated runs), so this measures MARGINAL cost instead:
time the full model, then re-time it with one module class ablated to
identity (monkeypatched __call__), and attribute the difference. The
ablations change the math, not the graph structure around the module, so
the delta is the module's true in-graph cost (including what XLA could
not overlap).

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/ablate_wfb.py
"""

from __future__ import annotations

import argparse
import time


def main():
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.models import wfb as wfb_mod
    from bayer_low_light_image_enhancement_tpu.models.wfb import (
        RawFormerWFB,
        RawFormerWFBConfig,
    )
    from bayer_low_light_image_enhancement_tpu.ops import fft as fft_mod
    from bayer_low_light_image_enhancement_tpu.ops import rep_conv as rep_mod
    from bayer_low_light_image_enhancement_tpu.ops import ssm as ssm_mod

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--cases", default="none,feb,ffab,ssm,wm,gff,illu")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    xin = jax.random.normal(key, (2, 512, 512, 1), jnp.float32)
    cfg = RawFormerWFBConfig(dim=48, dtype=jnp.bfloat16, ssm_pallas=True)
    model = RawFormerWFB(cfg)
    params = jax.jit(model.init)(key, xin)

    def timed(steps=args.steps, reps=2):
        @jax.jit
        def run(x):
            def body(carry, _):
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

    # Ablations: (target class, attr, identity replacement)
    idem = lambda self, x, *a, **k: x
    first_arg_pair = lambda self, x, *a, **k: (x, x)
    from bayer_low_light_image_enhancement_tpu.kernels import ssm_scan as ssmk_mod
    from bayer_low_light_image_enhancement_tpu.models import common as common_mod
    from bayer_low_light_image_enhancement_tpu.ops import dwt as dwt_mod

    # DWT/IWT substitutes keeping the [4b, h/2, w/2, c] <-> [b, h, w, c]
    # shape contract at near-zero cost (one strided slice / one repeat), so
    # the marginal is the transform math + its memory traffic.
    def _fake_dwt(x):
        import jax.numpy as jnp2
        q = x[:, ::2, ::2]
        return jnp2.concatenate([q, q, q, q], axis=0)

    def _fake_iwt(b):
        import jax.numpy as jnp2
        q = b[: b.shape[0] // 4]
        return jnp2.repeat(jnp2.repeat(q, 2, axis=1), 2, axis=2)

    ablations = {
        "none": [],
        "feb": [(fft_mod.FEB, "__call__", idem)],
        # scan only: keep all MambaBlock projections, ablate just the
        # Pallas selective scan to a passthrough of u.
        "scan": [(ssmk_mod, "selective_scan_pallas_train",
                  lambda u, dt, A, B, C, D: u)],
        "ffab": [(fft_mod.FFAB, "__call__", idem)],
        "ssm": [(ssm_mod.MambaBlock, "__call__", idem)],
        "wm": [(wfb_mod.WM, "__call__", idem)],
        "gff": [(rep_mod.GatedFeedForward, "__call__",
                 lambda self, x, *a, **k: x)],
        "illu": [(wfb_mod.IlluminationEstimator, "__call__", first_arg_pair)],
        "ln": [(common_mod.LayerNorm2d, "__call__", idem)],
        "dwt": [(wfb_mod, "haar_dwt_stack", _fake_dwt),
                (wfb_mod, "haar_iwt_stack", _fake_iwt)],
    }

    base = None
    for case in args.cases.split(","):
        saved = []
        for cls, attr, repl in ablations[case]:
            saved.append((cls, attr, getattr(cls, attr)))
            setattr(cls, attr, repl)
        try:
            ms = timed()
        finally:
            for cls, attr, orig in saved:
                setattr(cls, attr, orig)
        if case == "none":
            base = ms
            print(f"full model: {ms:8.3f} ms")
        else:
            print(f"minus {case:5s}: {ms:8.3f} ms  (marginal {base - ms:+7.3f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
