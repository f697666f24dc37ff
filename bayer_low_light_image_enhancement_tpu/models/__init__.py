from bayer_low_light_image_enhancement_tpu.models.registry import (
    get_model,
    list_models,
    register_model,
)
from bayer_low_light_image_enhancement_tpu.models.rawformer import (
    RawFormer,
    RawFormerConfig,
    SIZE_DIMS,
)

__all__ = [
    "get_model",
    "list_models",
    "register_model",
    "RawFormer",
    "RawFormerConfig",
    "SIZE_DIMS",
]
