from bayer_low_light_image_enhancement_tpu.ops.shuffle import (
    space_to_depth,
    depth_to_space,
)
from bayer_low_light_image_enhancement_tpu.ops.conv import (
    conv2d,
    halo_pad,
    leaky_relu,
)
from bayer_low_light_image_enhancement_tpu.ops.norm import channel_layernorm
from bayer_low_light_image_enhancement_tpu.ops.attention import channel_attention
from bayer_low_light_image_enhancement_tpu.ops.dwt import (
    haar_dwt_stack,
    haar_iwt_stack,
    haar_dwt_fb,
    haar_iwt_fb,
)
from bayer_low_light_image_enhancement_tpu.ops.bayer import (
    pack_bayer,
    normalize_sid,
    CFA_PATTERNS,
)
from bayer_low_light_image_enhancement_tpu.ops.luma import bayer_luma_chroma
from bayer_low_light_image_enhancement_tpu.ops.ssm import selective_scan, MambaBlock

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "conv2d",
    "halo_pad",
    "leaky_relu",
    "channel_layernorm",
    "channel_attention",
    "haar_dwt_stack",
    "haar_iwt_stack",
    "haar_dwt_fb",
    "haar_iwt_fb",
    "pack_bayer",
    "normalize_sid",
    "CFA_PATTERNS",
    "bayer_luma_chroma",
    "selective_scan",
    "MambaBlock",
]
