"""FSText — the frame-sequential text decomposer.

Decomposes one CLIP text embedding ``(b, 77, 768)`` into per-frame
sub-instruction embeddings ``(b, num_frames, 77, 768)``.

Parity with reference ``seer/models/unet_3d_condition.py:379-484`` and
``seer/models/attention.py:153-179, 328-427``:

- learnable query ``(1, 1, 1, 768)`` expanded over frames/tokens;
- learned pos-embed ``(1, 16, MAX_LENGTH=1024, 768)`` sliced to the token
  count and **nearest-neighbor** interpolated along the frame axis when the
  runtime frame count differs from 16 (``F.interpolate`` default mode,
  ``unet_3d_condition.py:476-478``);
- 8 × ``LinearTransformer3D(depth=2, temporal=[False, True])`` blocks:
  inner block 0 = per-frame token self-attn then cross-attn of all ``f*l``
  tokens to the CLIP context; inner block 1 = **causal temporal self-attn
  with rotary** across frames per token position (context ``None``);
- final LayerNorm.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import CrossAttention
from ..ops.norms import LayerNorm
from .transformer3d import FeedForward

MAX_LENGTH = 1024


class BasicLinearTransformerBlock3D(nn.Module):
    """One inner FSText block (reference ``attention.py:328-427``).

    ``temporal=False``: per-frame self-attn over tokens, then cross-attn of
    the flattened ``(b, f*l)`` token sequence to the 3-D CLIP context, then FF.
    ``temporal=True``: causal rotary self-attn across frames per token
    position, then FF (returns early — no cross-attn).
    """

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    temporal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, f, l, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.temporal:
            # (b*l, f, c): frames are the sequence; causal + rotary
            x = x.transpose(0, 2, 1, 3).reshape(b * l, f, c)
            x = CrossAttention(
                query_dim=self.dim, heads=self.n_heads, dim_head=self.d_head,
                temporal=True, causal=True, name="attn1", **kw,
            )(LayerNorm(param_dtype=self.param_dtype, name="norm1")(x)) + x
            x = FeedForward(self.dim, name="ff", **kw)(
                LayerNorm(param_dtype=self.param_dtype, name="norm3")(x)
            ) + x
            return x.reshape(b, l, f, c).transpose(0, 2, 1, 3)

        x = x.reshape(b * f, l, c)
        x = CrossAttention(
            query_dim=self.dim, heads=self.n_heads, dim_head=self.d_head, name="attn1", **kw
        )(LayerNorm(param_dtype=self.param_dtype, name="norm1")(x)) + x
        if context is not None:
            # all f*l learned tokens cross-attend to the 77 CLIP tokens
            x = x.reshape(b, f * l, c)
            x = CrossAttention(
                query_dim=self.dim, cross_attention_dim=self.context_dim,
                heads=self.n_heads, dim_head=self.d_head, name="attn2", **kw,
            )(LayerNorm(param_dtype=self.param_dtype, name="norm2")(x), context=context) + x
        x = FeedForward(self.dim, name="ff", **kw)(
            LayerNorm(param_dtype=self.param_dtype, name="norm3")(x)
        ) + x
        return x.reshape(b, f, l, c)


class LinearTransformer3D(nn.Module):
    """depth=2 stack: [spatial+cross (context), temporal causal (None)]."""

    in_channels: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = BasicLinearTransformerBlock3D(
            self.in_channels, self.n_heads, self.d_head, context_dim=self.context_dim,
            temporal=False, name="transformer_blocks_0", **kw,
        )(x, context=context)
        x = BasicLinearTransformerBlock3D(
            self.in_channels, self.n_heads, self.d_head,
            temporal=True, name="transformer_blocks_1", **kw,
        )(x, context=None)
        return x


def _nearest_resize_frames(pos_embed: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')`` along the frame axis.

    pos_embed: (1, F0, l, c) -> (1, num_frames, l, c).
    nearest index = floor(i * F0 / num_frames).
    """
    f0 = pos_embed.shape[1]
    idx = jnp.floor(jnp.arange(num_frames) * (f0 / num_frames)).astype(jnp.int32)
    return jnp.take(pos_embed, idx, axis=1)


class FSTextTransformer(nn.Module):
    """Entry-point construction parity: ``FSTextTransformer(num_frames=16,
    num_layers=8)`` (reference ``train.py:183``), then ``set_numframe`` to the
    runtime frame count — here ``num_frames`` is the runtime count and
    ``pos_embed_frames`` the checkpoint's native 16."""

    num_frames: int = 16
    pos_embed_frames: int = 16
    in_channels: int = 768
    out_channels: int = 768
    n_heads: int = 8
    num_layers: int = 8
    cross_attention_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context: jnp.ndarray) -> jnp.ndarray:
        """context: (b, l, 768) CLIP embedding -> (b, num_frames, l, 768)."""
        b, l, c = context.shape
        d_head = self.out_channels // self.n_heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        query = self.param(
            "learnable_query", nn.initializers.zeros, (1, 1, 1, self.out_channels),
            self.param_dtype,
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, self.pos_embed_frames, MAX_LENGTH, self.out_channels), self.param_dtype,
        )
        sample = jnp.broadcast_to(
            query.astype(self.dtype), (b, self.num_frames, l, self.out_channels)
        )
        pe = pos_embed[:, :, :l, :]
        if self.pos_embed_frames != self.num_frames:
            pe = _nearest_resize_frames(pe, self.num_frames)
        x = sample + pe.astype(self.dtype)

        for n in range(self.num_layers):
            x = LinearTransformer3D(
                in_channels=self.in_channels, n_heads=self.n_heads, d_head=d_head,
                context_dim=self.cross_attention_dim, name=f"trf_blocks_{n}", **kw,
            )(x, context=context)
        return LayerNorm(param_dtype=self.param_dtype, name="norm")(x)
