"""Haar DWT/IWT layout experiments (VERDICT r5: DWT marginal = 12.8 ms of
the 35.6 ms WFB forward — the largest single slice).

The shipped haar_dwt_stack slices x[:, 0::2, 0::2] etc: four strided
gathers whose W-stride crosses the lane dimension. Candidates:

  v0: shipped strided-slice form
  v1: one 6-d transpose ([b,h2,2,w2,2,c] -> [2,2,b,h2,w2,c]) + dense
      combines + concat
  v2: W phases via free lane reshape ([b,h,w/2,2c]) + H phases via
      row-block slices; combines on lane-sliced halves

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_dwt.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.ops.dwt import (
    haar_dwt_stack,
    haar_iwt_stack,
)


def dwt_v1(x):
    b, h, w, c = x.shape
    x6 = (x * 0.5).reshape(b, h // 2, 2, w // 2, 2, c)
    p = jnp.transpose(x6, (2, 4, 0, 1, 3, 5))  # [di, dj, b, h2, w2, c]
    x1, x2, x3, x4 = p[0, 0], p[1, 0], p[0, 1], p[1, 1]
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=0)


def iwt_v1(x):
    b4, h, w, c = x.shape
    b = b4 // 4
    x1, x2, x3, x4 = (x[i * b:(i + 1) * b] * 0.5 for i in range(4))
    ee = x1 - x2 - x3 + x4
    oe = x1 - x2 + x3 - x4
    eo = x1 + x2 - x3 - x4
    oo = x1 + x2 + x3 + x4
    q = jnp.stack([jnp.stack([ee, eo]), jnp.stack([oe, oo])])  # [di,dj,b,h,w,c]
    y = jnp.transpose(q, (2, 3, 0, 4, 1, 5))  # [b,h,di,w,dj,c]
    return y.reshape(b, 2 * h, 2 * w, c)


def dwt_v2(x):
    b, h, w, c = x.shape
    xl = (x * 0.5).reshape(b, h // 2, 2, w // 2, 2 * c)
    re, ro = xl[:, :, 0], xl[:, :, 1]  # row phases, big contiguous chunks
    x1, x3 = re[..., :c], re[..., c:]  # (even row, even/odd col)
    x2, x4 = ro[..., :c], ro[..., c:]
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=0)


def iwt_v2(x):
    b4, h, w, c = x.shape
    b = b4 // 4
    x1, x2, x3, x4 = (x[i * b:(i + 1) * b] * 0.5 for i in range(4))
    ee = x1 - x2 - x3 + x4
    oe = x1 - x2 + x3 - x4
    eo = x1 + x2 - x3 - x4
    oo = x1 + x2 + x3 + x4
    re = jnp.concatenate([ee, eo], axis=-1)  # [b,h,w,2c] lanes = col pair
    ro = jnp.concatenate([oe, oo], axis=-1)
    y = jnp.stack([re, ro], axis=2)          # [b,h,2,w,2c]
    return y.reshape(b, 2 * h, 2 * w, c)


def main():
    key = jax.random.PRNGKey(0)
    for shape in [(2, 256, 256, 48), (2, 128, 128, 96), (6, 128, 128, 48)]:
        x = jax.random.normal(key, shape, jnp.bfloat16)
        ref = None
        for name, (f, g) in {
            "v0": (haar_dwt_stack, haar_iwt_stack),
            "v1": (dwt_v1, iwt_v1),
            "v2": (dwt_v2, iwt_v2),
        }.items():
            @jax.jit
            def run(x, f=f, g=g):
                def body(carry, _):
                    # relu between the transforms stops XLA from collapsing
                    # the exact roundtrip into a no-op.
                    y = g(jnp.maximum(f(carry), -3.0)) * 0.999
                    return y, ()
                out, _ = jax.lax.scan(body, x, None, length=50)
                return out

            r = run(x)
            r.block_until_ready()
            if ref is None:
                ref = r
            else:
                err = float(jnp.max(jnp.abs(r.astype(jnp.float32) - ref.astype(jnp.float32))))
                assert err < 1e-2, (name, err)
            t0 = time.perf_counter()
            for _ in range(3):
                run(x).block_until_ready()
            dt = (time.perf_counter() - t0) / (3 * 50) * 1e3
            print(f"{shape} {name}: {dt:7.4f} ms/roundtrip", flush=True)


if __name__ == "__main__":
    main()
