"""Numerical-debugging subsystem.

Reference analogues (SURVEY.md §5 "race detection / sanitizers"): NaN/Inf
input skip + NaN-loss raise in the WFB training loop
(``/root/reference/RawFomer_WFB_FFAB/train.py:165-182``) and the per-param
gradient NaN printer (``model.py:510-515``). TPU-native versions:

* ``enable_debug_nans()`` — jax_debug_nans: XLA re-runs the offending op
  un-jitted and raises at the exact primitive.
* ``check_finite_tree`` — host-side audit of any pytree (params, grads).
* ``grad_stats`` — the gradient-hook printer, as a pure function.
* the Trainer's ``nan_guard`` (train/trainer.py) skips the optimizer update
  on a non-finite loss, jit-compatibly (no host sync in the step).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enable_debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def enable_leak_checking(enable: bool = True) -> None:
    jax.config.update("jax_check_tracer_leaks", enable)


def check_finite_tree(tree: Any, name: str = "tree") -> List[str]:
    """Return list of paths with non-finite values (empty == healthy)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            bad.append(f"{name}{jax.tree_util.keystr(path)}")
    return bad


def grad_stats(grads: Any) -> Dict[str, Tuple[float, float, bool]]:
    """{path: (max_abs, mean, has_nan)} — reference register_grad_hook."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        arr = np.asarray(leaf)
        out[jax.tree_util.keystr(path)] = (
            float(np.max(np.abs(arr))) if arr.size else 0.0,
            float(np.mean(arr)) if arr.size else 0.0,
            bool(np.any(np.isnan(arr))),
        )
    return out


def finite_or_zero(tree: Any) -> Any:
    """Replace non-finite leaves' values with zeros (jit-safe)."""
    return jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), tree)
