from .norms import GroupNorm, LayerNorm
from .conv import InflatedConv
from .rotary import rotary_freqs, apply_rotary
from .windows import window_partition, window_reverse, select_window_size
from .attention import (
    dot_product_attention,
    causal_mask,
    CrossAttention,
    WindowTemporalAttention,
)

__all__ = [
    "GroupNorm",
    "LayerNorm",
    "InflatedConv",
    "rotary_freqs",
    "apply_rotary",
    "window_partition",
    "window_reverse",
    "select_window_size",
    "dot_product_attention",
    "causal_mask",
    "CrossAttention",
    "WindowTemporalAttention",
]
