"""AOT serving artifacts via ``jax.export`` (StableHLO).

The reference deploys by shipping Python + ``.pth`` weights and re-running
the whole PyTorch stack (``/root/reference/test.py:85-93``). The TPU-native
serving story is ahead-of-time compilation: the jitted forward — weights
baked in as constants — is lowered to StableHLO once and serialized. A
serving process deserializes and calls it with NO model code, NO flax, and
NO Python-side weight loading; XLA recompiles the portable bytecode for
whatever attached accelerator platform it was exported for.

Artifact format: a zip containing
  * ``model.stablehlo`` — ``jax.export.Exported.serialize()`` bytes,
  * ``meta.json``       — input shape/dtype, platforms, framework version.

Use :func:`export_artifact` / :func:`load_artifact`; ``cli/export_cli.py``
is the command-line surface.
"""

from __future__ import annotations

import json
import zipfile
from typing import Any, Optional, Sequence, Tuple

import numpy as np

_META_NAME = "meta.json"
_BLOB_NAME = "model.stablehlo"
FORMAT_VERSION = 1


def export_artifact(
    model,
    variables: Any,
    path: str,
    batch: int = 1,
    height: int = 512,
    width: int = 512,
    platforms: Optional[Sequence[str]] = None,
    clip01: bool = True,
    meta_extra: Optional[dict] = None,
) -> dict:
    """Export ``model.apply(variables, .)`` as a self-contained artifact.

    Weights are closed over and become constants in the StableHLO module.
    ``platforms`` defaults to the current backend; pass e.g.
    ``("cpu", "tpu")`` for a multi-platform artifact. Returns the meta dict.
    """
    import jax
    import jax.numpy as jnp

    if platforms is None:
        platforms = (jax.default_backend(),)

    def fwd(x):
        y = model.apply(variables, x)
        return jnp.clip(y, 0.0, 1.0) if clip01 else y

    spec = jax.ShapeDtypeStruct((batch, height, width, 1), jnp.float32)
    exported = jax.export.export(jax.jit(fwd), platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    meta = {
        "format_version": FORMAT_VERSION,
        "input_shape": [batch, height, width, 1],
        "input_dtype": "float32",
        "platforms": list(platforms),
        "clip01": clip01,
        **(meta_extra or {}),
    }
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(meta, indent=2))
        zf.writestr(_BLOB_NAME, blob)
    return meta


def load_artifact(path: str) -> Tuple[Any, dict]:
    """Load an artifact -> (jitted callable taking [B,H,W,1] fp32, meta)."""
    import jax

    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read(_META_NAME))
        blob = zf.read(_BLOB_NAME)
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(f"artifact format {meta['format_version']} too new")
    exported = jax.export.deserialize(blob)
    fn = jax.jit(exported.call)

    expected = tuple(meta["input_shape"])

    def call(x):
        x = np.asarray(x, np.float32)
        if x.shape != expected:
            raise ValueError(f"artifact expects input {expected}, got {x.shape}")
        return np.asarray(fn(x))

    return call, meta
