from .layout import bcfhw_to_bfhwc, bfhwc_to_bcfhw

__all__ = ["bcfhw_to_bfhwc", "bfhwc_to_bcfhw"]
