"""Static cost reporting — the TPU-native ptflops equivalent.

The reference prints GFLOPs/params via ptflops in every model's __main__
(``/root/reference/RawFomer_WFB_FFAB/model.py:517-523``). Here the numbers
come from XLA itself: ``jit(...).lower(...).compile().cost_analysis()``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def model_complexity(model, input_shape=(1, 512, 512, 1)) -> Dict[str, Any]:
    """Returns {'params', 'flops', 'bytes_accessed'} for one forward pass."""
    x = jnp.zeros(input_shape, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    n_params = count_params(params)
    flops = None
    bytes_accessed = None
    try:
        compiled = jax.jit(model.apply).lower(params, x).compile()
        cost = compiled.cost_analysis()
        if cost:
            flops = cost.get("flops")
            bytes_accessed = cost.get("bytes accessed")
    except Exception:
        pass
    return {"params": n_params, "flops": flops, "bytes_accessed": bytes_accessed}
