"""Model-zoo registry.

The reference exposes its variants as loose files; here each model family
registers a named builder so the CLI (``--model_size S/B/L`` per
``/root/reference/README.md:44-65``) and tests address them uniformly.
"""

from __future__ import annotations

from typing import Callable, Dict, List

_REGISTRY: Dict[str, Callable] = {}
_RAW_DOMAIN: set = set()


def register_model(name: str, builder: Callable, raw_domain: bool = False) -> None:
    """``raw_domain=True`` marks models that map packed Bayer planes to
    enhanced planes ([B,H,W,4] -> [B,H,W,4]) rather than RAW -> RGB; the
    reference never wires these into its RGB eval either (they exist as
    ``__main__`` smoke tests, e.g. ``Transformer_FLCA_UNet.py:265-273``)."""
    if name in _REGISTRY:
        raise ValueError(f"model {name!r} already registered")
    _REGISTRY[name] = builder
    if raw_domain:
        _RAW_DOMAIN.add(name)


def is_raw_domain(name: str) -> bool:
    return name in _RAW_DOMAIN


def get_model(name: str, **kwargs):
    """Build a registered model by name, e.g. ``get_model('rawformer_s')``."""
    try:
        builder = _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}") from None
    return builder(**kwargs)


def list_models() -> List[str]:
    return sorted(_REGISTRY)
