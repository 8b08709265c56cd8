from .flash_attention import flash_attention, flash_attention_available

__all__ = ["flash_attention", "flash_attention_available"]
