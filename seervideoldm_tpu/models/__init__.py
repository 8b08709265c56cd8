from .unet3d import SeerUNet, SEER_UNET_SD15_CONFIG
from .fstext import FSTextTransformer
from .vae import AutoencoderKL, SD15_VAE_CONFIG
from .clip_text import CLIPTextModel, CLIP_VIT_L14_TEXT_CONFIG

__all__ = [
    "SeerUNet",
    "SEER_UNET_SD15_CONFIG",
    "FSTextTransformer",
    "AutoencoderKL",
    "SD15_VAE_CONFIG",
    "CLIPTextModel",
    "CLIP_VIT_L14_TEXT_CONFIG",
]
