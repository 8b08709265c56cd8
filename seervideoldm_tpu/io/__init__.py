from .convert import (
    load_torch_state_dict,
    convert_seer_unet,
    convert_fstext,
    convert_vae,
    convert_clip_text,
)
from .checkpoint import CheckpointManager
from .export import (
    export_reference_checkpoint,
    flax_to_torch,
    load_reference_manifests,
)

__all__ = [
    "export_reference_checkpoint",
    "flax_to_torch",
    "load_reference_manifests",
    "load_torch_state_dict",
    "convert_seer_unet",
    "convert_fstext",
    "convert_vae",
    "convert_clip_text",
    "CheckpointManager",
]
