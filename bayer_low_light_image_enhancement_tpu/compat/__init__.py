from bayer_low_light_image_enhancement_tpu.compat.torch_import import (
    load_torch_checkpoint,
    import_rawformer_state_dict,
)

__all__ = ["load_torch_checkpoint", "import_rawformer_state_dict"]
