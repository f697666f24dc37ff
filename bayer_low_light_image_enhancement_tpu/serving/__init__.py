"""Production inference: the Predictor API and AOT-exported artifacts."""

from bayer_low_light_image_enhancement_tpu.serving.predictor import Predictor
from bayer_low_light_image_enhancement_tpu.serving.export import (
    export_artifact,
    load_artifact,
)

__all__ = ["Predictor", "export_artifact", "load_artifact"]
