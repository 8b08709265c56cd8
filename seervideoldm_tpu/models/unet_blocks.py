"""Down/mid/up blocks of the SeerUNet.

Parity with reference ``seer/models/unet_3d_blocks.py``: each cross-attn
block layer runs the triplet **ResnetBlock3D → SpatialTransformer3D
(per-frame spatial + per-frame text cross-attn) → SpatialTransformer3D
(temporal, causal)** (``unet_3d_blocks.py:402-419`` down, ``:224-275`` mid,
``:632-649`` up).  Downsample after layers, upsample after layers,
skip-concat on the channel axis (last axis here).

``jax.checkpoint`` (rematerialization) replaces torch gradient
checkpointing when ``remat=True``.
"""
from __future__ import annotations


from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .resnet3d import Downsample3D, ResnetBlock3D, Upsample3D
from .transformer3d import SpatialTransformer3D


class CrossAttnDownBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 2
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    attn_num_head_channels: int = 8
    cross_attention_dim: int = 768
    downsample_padding: int = 1
    add_downsample: bool = True
    text_frame_condition: bool = True
    causal: bool = True
    cond_frame: int = 0
    collect_attn: bool = False
    attention_slice: Optional[int] = None  # reference set_attention_slice
    tome_ratio: float = 0.0  # ToMe spatial-token merging (ops/tome.py)
    tome_min_tokens: int = 1024
    tome_sd: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb=None, encoder_hidden_states=None, pab=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        output_states = ()
        heads = self.attn_num_head_channels
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = ResnetBlock3D(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, name=f"resnets_{i}", **kw,
            )(hidden_states, temb)
            hidden_states = SpatialTransformer3D(
                self.out_channels, heads, self.out_channels // heads, depth=1,
                context_dim=self.cross_attention_dim,
                text_frame_condition=self.text_frame_condition,
                norm_num_groups=self.resnet_groups,
                collect_attn=self.collect_attn,
                attention_slice=self.attention_slice,
                tome_ratio=self.tome_ratio,
                tome_min_tokens=self.tome_min_tokens, tome_sd=self.tome_sd,
                name=f"attentions_{i}", **kw,
            )(hidden_states, context=encoder_hidden_states, pab=pab)
            hidden_states = SpatialTransformer3D(
                self.out_channels, heads, self.out_channels // heads, depth=1,
                temporal=True, causal=self.causal, cond_frame=self.cond_frame,
                norm_num_groups=self.resnet_groups,
                name=f"temporal_attentions_{i}", **kw,
            )(hidden_states, pab=pab)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample3D(
                self.out_channels, out_channels=self.out_channels,
                padding=self.downsample_padding, name="downsamplers_0", **kw,
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class DownBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 2
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    downsample_padding: int = 1
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        output_states = ()
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = ResnetBlock3D(
                in_channels=in_ch, out_channels=self.out_channels,
                temb_channels=self.temb_channels, eps=self.resnet_eps,
                groups=self.resnet_groups, name=f"resnets_{i}", **kw,
            )(hidden_states, temb)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample3D(
                self.out_channels, out_channels=self.out_channels,
                padding=self.downsample_padding, name="downsamplers_0", **kw,
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock3DCrossAttn(nn.Module):
    in_channels: int
    temb_channels: int
    num_layers: int = 1
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    attn_num_head_channels: int = 8
    cross_attention_dim: int = 768
    text_frame_condition: bool = True
    causal: bool = True
    cond_frame: int = 0
    collect_attn: bool = False
    attention_slice: Optional[int] = None  # reference set_attention_slice
    tome_ratio: float = 0.0  # ToMe spatial-token merging (ops/tome.py)
    tome_min_tokens: int = 1024
    tome_sd: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb=None, encoder_hidden_states=None, pab=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        heads = self.attn_num_head_channels
        resnet_kw = dict(
            in_channels=self.in_channels, out_channels=self.in_channels,
            temb_channels=self.temb_channels, eps=self.resnet_eps,
            groups=self.resnet_groups, **kw,
        )
        hidden_states = ResnetBlock3D(name="resnets_0", **resnet_kw)(hidden_states, temb)
        for i in range(self.num_layers):
            hidden_states = SpatialTransformer3D(
                self.in_channels, heads, self.in_channels // heads, depth=1,
                context_dim=self.cross_attention_dim,
                text_frame_condition=self.text_frame_condition,
                norm_num_groups=self.resnet_groups,
                collect_attn=self.collect_attn,
                attention_slice=self.attention_slice,
                tome_ratio=self.tome_ratio,
                tome_min_tokens=self.tome_min_tokens, tome_sd=self.tome_sd,
                name=f"attentions_{i}", **kw,
            )(hidden_states, context=encoder_hidden_states, pab=pab)
            hidden_states = SpatialTransformer3D(
                self.in_channels, heads, self.in_channels // heads, depth=1,
                temporal=True, causal=self.causal, cond_frame=self.cond_frame,
                norm_num_groups=self.resnet_groups,
                name=f"temporal_attentions_{i}", **kw,
            )(hidden_states, pab=pab)
            hidden_states = ResnetBlock3D(name=f"resnets_{i + 1}", **resnet_kw)(
                hidden_states, temb
            )
        return hidden_states


class CrossAttnUpBlock3D(nn.Module):
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: int
    num_layers: int = 3
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    attn_num_head_channels: int = 8
    cross_attention_dim: int = 768
    add_upsample: bool = True
    text_frame_condition: bool = True
    causal: bool = True
    cond_frame: int = 0
    collect_attn: bool = False
    attention_slice: Optional[int] = None  # reference set_attention_slice
    tome_ratio: float = 0.0  # ToMe spatial-token merging (ops/tome.py)
    tome_min_tokens: int = 1024
    tome_sd: int = 2
    # FreeU (b, s) for this stage (ops/freeu.py); None = off (parity)
    freeu: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden_states, res_hidden_states_tuple, temb=None,
        encoder_hidden_states=None, pab=None,
    ):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        heads = self.attn_num_head_channels
        for i in range(self.num_layers):
            res_skip_channels = (
                self.in_channels if (i == self.num_layers - 1) else self.out_channels
            )
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            if self.freeu is not None:
                from ..ops.freeu import apply_freeu

                hidden_states, res_hidden = apply_freeu(
                    hidden_states, res_hidden, *self.freeu)
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock3D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels, temb_channels=self.temb_channels,
                eps=self.resnet_eps, groups=self.resnet_groups, name=f"resnets_{i}", **kw,
            )(hidden_states, temb)
            hidden_states = SpatialTransformer3D(
                self.out_channels, heads, self.out_channels // heads, depth=1,
                context_dim=self.cross_attention_dim,
                text_frame_condition=self.text_frame_condition,
                norm_num_groups=self.resnet_groups,
                collect_attn=self.collect_attn,
                attention_slice=self.attention_slice,
                tome_ratio=self.tome_ratio,
                tome_min_tokens=self.tome_min_tokens, tome_sd=self.tome_sd,
                name=f"attentions_{i}", **kw,
            )(hidden_states, context=encoder_hidden_states, pab=pab)
            hidden_states = SpatialTransformer3D(
                self.out_channels, heads, self.out_channels // heads, depth=1,
                temporal=True, causal=self.causal, cond_frame=self.cond_frame,
                norm_num_groups=self.resnet_groups,
                name=f"temporal_attentions_{i}", **kw,
            )(hidden_states, pab=pab)
        if self.add_upsample:
            hidden_states = Upsample3D(
                self.out_channels, out_channels=self.out_channels, name="upsamplers_0", **kw
            )(hidden_states)
        return hidden_states


class UpBlock3D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    num_layers: int = 3
    resnet_eps: float = 1e-6
    resnet_groups: int = 32
    add_upsample: bool = True
    # FreeU (b, s) for this stage (ops/freeu.py); None = off (parity)
    freeu: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.num_layers):
            res_skip_channels = (
                self.in_channels if (i == self.num_layers - 1) else self.out_channels
            )
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            if self.freeu is not None:
                from ..ops.freeu import apply_freeu

                hidden_states, res_hidden = apply_freeu(
                    hidden_states, res_hidden, *self.freeu)
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock3D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels, temb_channels=self.temb_channels,
                eps=self.resnet_eps, groups=self.resnet_groups, name=f"resnets_{i}", **kw,
            )(hidden_states, temb)
        if self.add_upsample:
            hidden_states = Upsample3D(
                self.out_channels, out_channels=self.out_channels, name="upsamplers_0", **kw
            )(hidden_states)
        return hidden_states
