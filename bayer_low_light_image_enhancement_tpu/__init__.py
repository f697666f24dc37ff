"""TPU-native framework for low-light Bayer RAW image enhancement.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
reference ``Gaurav14cs17/Bayer_Low_light_Image_Enhancement``: SID/MCR RAW data
pipelines, the RawFormer channel-attention U-Net model family (plus the
wavelet/FFT/SSM, FLCA-guided, TrueColor-ISP and WavKAN variants), a pjit
data-parallel training stack, and halo-exchange spatial tiling for
full-resolution inference.

Everything is NHWC, statically shaped, and jit-friendly. See SURVEY.md at the
repo root for the structural map of the reference this was built against.
"""

__version__ = "0.1.0"

from bayer_low_light_image_enhancement_tpu.core.precision import Policy, default_policy
from bayer_low_light_image_enhancement_tpu.models import get_model, list_models

__all__ = [
    "Policy",
    "default_policy",
    "get_model",
    "list_models",
    "__version__",
]
