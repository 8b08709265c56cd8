from .convert import (
    load_torch_state_dict,
    convert_seer_unet,
    convert_fstext,
    convert_vae,
    convert_clip_text,
)
from .checkpoint import CheckpointManager

__all__ = [
    "load_torch_state_dict",
    "convert_seer_unet",
    "convert_fstext",
    "convert_vae",
    "convert_clip_text",
    "CheckpointManager",
]
