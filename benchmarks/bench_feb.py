"""Dissect the FEB (ops/fft.py) cost at WFB stage geometries.

Variants (all fp32, the production island dtype):
  feb        — the full FEB module
  fftonly    — rfft2 -> mag/pha (abs+atan2) -> recompose (cos/sin) -> irfft2
  fftpure    — rfft2 -> irfft2 (no transcendentals)
  convs      — the four 1x1 stack convs + fpre + residual, no FFT section
  trans      — abs/atan2/cos/sin on the spectrum alone

Usage: python benchmarks/bench_feb.py [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, x, steps, reps=3):
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
    import numpy as np

    from bayer_low_light_image_enhancement_tpu.ops.fft import FEB

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    shapes = [(2, 128, 128, 48), (2, 64, 64, 96), (2, 32, 32, 192), (2, 16, 16, 384)]

    for shape in shapes:
        b, h, w, c = shape
        x = jax.random.normal(key, shape, jnp.float32)
        feb = FEB()
        params = jax.jit(feb.init)(key, x)
        ortho = 1.0 / float(np.sqrt(h * w))

        def fftpure(v):
            f = jnp.fft.rfft2(v, axes=(1, 2)) * ortho
            return jnp.fft.irfft2(f, s=(h, w), axes=(1, 2))

        def fftonly(v):
            f = jnp.fft.rfft2(v, axes=(1, 2)) * ortho
            mag = jnp.abs(f) + 1e-6
            pha = jnp.angle(f)
            spec = jax.lax.complex(mag * jnp.cos(pha), mag * jnp.sin(pha))
            return jnp.fft.irfft2(spec, s=(h, w), axes=(1, 2))

        def trans(v):
            # transcendentals on a spectrum-sized REAL pair
            re, im = v, v * 0.5
            mag = jnp.sqrt(re * re + im * im) + 1e-6
            pha = jnp.arctan2(im, re)
            return mag * jnp.cos(pha) + mag * jnp.sin(pha)

        for name, fn in [
            ("feb", lambda v: feb.apply(params, v)),
            ("fftonly", fftonly),
            ("fftpure", fftpure),
            ("trans", trans),
        ]:
            ms = timed(fn, x, args.steps) * 1e3
            print(f"[{b},{h},{w},{c}] {name:8s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
