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

# Import variant modules for their registry side effects.
from bayer_low_light_image_enhancement_tpu.models import wfb as _wfb  # noqa: F401
from bayer_low_light_image_enhancement_tpu.models import (  # noqa: F401
    flca_rawformer as _flca,
)
from bayer_low_light_image_enhancement_tpu.models import (  # noqa: F401
    multilvl_flca as _multilvl,
)
from bayer_low_light_image_enhancement_tpu.models import truecolor as _truecolor  # noqa: F401
from bayer_low_light_image_enhancement_tpu.models import flca_unet as _flca_unet  # noqa: F401
from bayer_low_light_image_enhancement_tpu.models import wavkan as _wavkan  # noqa: F401
from bayer_low_light_image_enhancement_tpu.models import (  # noqa: F401
    luma_variants as _luma_variants,
)
from bayer_low_light_image_enhancement_tpu.models import (  # noqa: F401
    lumachroma_transformer as _lumachroma,
)

__all__ = [
    "get_model",
    "list_models",
    "register_model",
    "RawFormer",
    "RawFormerConfig",
    "SIZE_DIMS",
]
