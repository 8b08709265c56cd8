"""3D (per-frame 2D) ResNet blocks and spatial resampling.

Parity with reference ``seer/models/resnet.py``: fp32 GroupNorm islands
(``resnet.py:179,197``), SiLU, time-embedding bias added per-channel
(``resnet.py:191-193``), 1x1 conv shortcut on channel change
(``resnet.py:168-172``).  Upsample is nearest 2x spatial-only
(``resnet.py:52``); Downsample is stride-2 spatial conv.  All convs are 2D
per frame — there is no true 3D conv in the model.

Layout: channels-last ``(b, f, h, w, c)``.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import InflatedConv
from ..ops.norms import GroupNorm


class Upsample3D(nn.Module):
    """Nearest 2x spatial upsample + optional 3x3 conv (reference Upsample3D)."""

    channels: int
    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        # nearest-neighbor 2x on (h, w) only
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        if self.use_conv:
            x = InflatedConv(
                self.out_channels or self.channels,
                kernel_size=(3, 3),
                padding=1,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        return x


class Downsample3D(nn.Module):
    """Stride-2 spatial 3x3 conv (reference Downsample3D, use_conv=True)."""

    channels: int
    out_channels: Optional[int] = None
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding == 0:
            # reference pads (left 0, right 1, top 0, bottom 1) when padding=0
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return InflatedConv(
            self.out_channels or self.channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=self.padding,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class ResnetBlock3D(nn.Module):
    """GN32(fp32) → SiLU → conv → +temb → GN32(fp32) → SiLU → conv (+shortcut)."""

    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: int = 512
    groups: int = 32
    eps: float = 1e-6
    output_scale_factor: float = 1.0
    use_nin_shortcut: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out_ch = self.out_channels or self.in_channels
        h = GroupNorm(self.groups, eps=self.eps, param_dtype=self.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h = InflatedConv(
            out_ch, (3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, name="conv1"
        )(h)

        if temb is not None:
            temb = nn.Dense(
                out_ch, dtype=self.dtype, param_dtype=self.param_dtype, name="time_emb_proj"
            )(nn.silu(temb))
            h = h + temb[:, None, None, None, :]

        h = GroupNorm(self.groups, eps=self.eps, param_dtype=self.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        h = InflatedConv(
            out_ch, (3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, name="conv2"
        )(h)

        use_nin = (
            self.in_channels != out_ch if self.use_nin_shortcut is None else self.use_nin_shortcut
        )
        if use_nin:
            x = InflatedConv(
                out_ch, (1, 1), padding=0,
                dtype=self.dtype, param_dtype=self.param_dtype, name="conv_shortcut",
            )(x)
        return (x + h) / self.output_scale_factor
