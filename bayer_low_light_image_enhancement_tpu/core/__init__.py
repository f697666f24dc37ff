from bayer_low_light_image_enhancement_tpu.core.precision import Policy, default_policy
from bayer_low_light_image_enhancement_tpu.core.mesh import (
    AxisNames,
    create_mesh,
    data_sharding,
    replicated,
)

__all__ = [
    "Policy",
    "default_policy",
    "AxisNames",
    "create_mesh",
    "data_sharding",
    "replicated",
]
