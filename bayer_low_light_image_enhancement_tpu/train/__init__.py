from bayer_low_light_image_enhancement_tpu.train.losses import (
    charbonnier_loss,
    l1_loss,
    get_loss,
)
from bayer_low_light_image_enhancement_tpu.train.schedule import warmup_cosine_schedule
from bayer_low_light_image_enhancement_tpu.train.metrics import psnr, ssim
from bayer_low_light_image_enhancement_tpu.train.trainer import (
    TrainState,
    Trainer,
    TrainConfig,
)

__all__ = [
    "charbonnier_loss",
    "l1_loss",
    "get_loss",
    "warmup_cosine_schedule",
    "psnr",
    "ssim",
    "TrainState",
    "Trainer",
    "TrainConfig",
]
