"""Mixed-precision policy for TPU.

The reference trains with CUDA AMP (fp16 autocast + GradScaler,
``/root/reference/train.py:117,137-144``). On TPU the idiomatic equivalent is
bfloat16 compute with fp32 parameters and fp32 reductions — bf16 shares the
fp32 exponent range, so no loss scaler is needed.

A :class:`Policy` is threaded through every module as ``dtype`` (compute) and
``param_dtype`` (storage). Normalisation statistics, softmax and losses always
accumulate in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Precision policy: parameter storage / compute / output dtypes."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


def default_policy(bf16: bool = True) -> Policy:
    """bf16 compute policy by default; pass ``bf16=False`` for full fp32."""
    if bf16:
        return Policy()
    return Policy(compute_dtype=jnp.float32)


FP32_POLICY = Policy(compute_dtype=jnp.float32)
BF16_POLICY = Policy()
