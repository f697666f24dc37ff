from bayer_low_light_image_enhancement_tpu.data.sid import (
    SIDDataset,
    discover_sid_pairs,
    parse_sid_list,
    sid_ratio_from_filename,
)
from bayer_low_light_image_enhancement_tpu.data.mcr import MCRDataset, mcr_amplification
from bayer_low_light_image_enhancement_tpu.data.pipeline import Loader, prefetch_to_device
from bayer_low_light_image_enhancement_tpu.data.synthetic import SyntheticBayerDataset

__all__ = [
    "SIDDataset",
    "discover_sid_pairs",
    "parse_sid_list",
    "sid_ratio_from_filename",
    "MCRDataset",
    "mcr_amplification",
    "Loader",
    "prefetch_to_device",
    "SyntheticBayerDataset",
]
