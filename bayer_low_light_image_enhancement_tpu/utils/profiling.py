"""Profiling / tracing utilities.

The reference's only timing is wall-clock epoch prints and per-item
AverageMeters (``/root/reference/train.py:130,174``,
``correctdataloader.py:13-24``); SURVEY.md §5 maps these to the TPU-native
equivalents here: ``jax.profiler`` traces viewable in TensorBoard/Perfetto,
block_until_ready-bracketed step timing, and XLA cost analysis in place of
ptflops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace (open in TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class AverageMeter:
    """Running mean/count (reference correctdataloader.py:13-24)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(1, self.count)


class StepTimer:
    """Wall-clock step timing with device synchronisation.

    Note: on tunneled/remote backends ``block_until_ready`` may acknowledge
    before execution completes; for trustworthy numbers time a device-side
    ``lax.scan`` loop (see bench.py) or use :func:`timed_scan`.
    """

    def __init__(self):
        self.meter = AverageMeter()
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.meter.update(dt)
        return dt


def timed_scan(fn: Callable, args, steps: int = 20, reps: int = 3) -> float:
    """Honest per-call wall time: run ``steps`` sequential calls inside one
    jitted lax.scan (immune to async-dispatch lies), return seconds/call."""
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(*a)
            leaves = jax.tree.leaves(out)
            acc = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves[:1])
            return carry + acc, ()

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=steps)
        return s

    float(run(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(*args))
    return (time.perf_counter() - t0) / (steps * reps)


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA's static cost analysis for a jitted callable (ptflops equivalent)."""
    compiled = jax.jit(fn).lower(*args).compile()
    return dict(compiled.cost_analysis() or {})
