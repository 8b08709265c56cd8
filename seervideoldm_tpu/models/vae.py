"""AutoencoderKL — the frozen SD-1.5 VAE, re-implemented in Flax.

Covers the reference's use of diffusers ``AutoencoderKL.from_pretrained(
"runwayml/stable-diffusion-v1-5", subfolder="vae")`` (reference
``train.py:159-174``): per-frame 2D encode/decode of video frames, with the
0.18215 latent scaling applied by callers (reference ``train.py:351-352``).

Channels-last images ``(b, h, w, 3)``; latents ``(b, h/8, w/8, 4)``.
Parameter names follow diffusers module paths for the weight converter.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import GroupNorm

VAE_SCALE = 0.18215


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32


SD15_VAE_CONFIG = VAEConfig()


class ResnetBlock2D(nn.Module):
    """VAE resnet: GN(fp32) → silu → conv → GN → silu → conv (+1x1 shortcut)."""

    in_channels: int
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = GroupNorm(self.groups, eps=self.eps, param_dtype=self.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1", **kw)(h)
        h = GroupNorm(self.groups, eps=self.eps, param_dtype=self.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2", **kw)(h)
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", **kw)(x)
        return x + h


class AttentionBlock2D(nn.Module):
    """Single-head spatial self-attention (diffusers VAE AttentionBlock)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        x = GroupNorm(self.groups, eps=1e-6, param_dtype=self.param_dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, name="query", **kw)(x)
        k = nn.Dense(c, name="key", **kw)(x)
        v = nn.Dense(c, name="value", **kw)(x)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(c).astype(jnp.float32))
        logits = jnp.einsum(
            "bnc,bmc->bnm", q * scale, k * scale, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        x = jnp.einsum("bnm,bmc->bnc", probs, v)
        x = nn.Dense(c, name="proj_attn", **kw)(x)
        return x.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig = SD15_VAE_CONFIG
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        boc = tuple(cfg.block_out_channels)
        x = nn.Conv(boc[0], (3, 3), padding=1, name="conv_in", **kw)(x)
        out_ch = boc[0]
        for i, ch in enumerate(boc):
            in_ch, out_ch = out_ch, ch
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    in_ch if j == 0 else out_ch, out_ch, groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}_resnets_{j}", **kw,
                )(x)
            if i != len(boc) - 1:
                # diffusers Downsample2D pad=0: asymmetric (0,1) pad, stride 2
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID",
                    name=f"down_blocks_{i}_downsamplers_0_conv", **kw,
                )(x)
        x = ResnetBlock2D(out_ch, out_ch, groups=cfg.norm_num_groups,
                          name="mid_block_resnets_0", **kw)(x)
        x = AttentionBlock2D(out_ch, groups=cfg.norm_num_groups,
                             name="mid_block_attentions_0", **kw)(x)
        x = ResnetBlock2D(out_ch, out_ch, groups=cfg.norm_num_groups,
                          name="mid_block_resnets_1", **kw)(x)
        x = GroupNorm(cfg.norm_num_groups, eps=1e-6, param_dtype=self.param_dtype,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out", **kw)(x)


class Decoder(nn.Module):
    config: VAEConfig = SD15_VAE_CONFIG
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        boc = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(boc[0], (3, 3), padding=1, name="conv_in", **kw)(z)
        x = ResnetBlock2D(boc[0], boc[0], groups=cfg.norm_num_groups,
                          name="mid_block_resnets_0", **kw)(x)
        x = AttentionBlock2D(boc[0], groups=cfg.norm_num_groups,
                             name="mid_block_attentions_0", **kw)(x)
        x = ResnetBlock2D(boc[0], boc[0], groups=cfg.norm_num_groups,
                          name="mid_block_resnets_1", **kw)(x)
        out_ch = boc[0]
        for i, ch in enumerate(boc):
            in_ch, out_ch = out_ch, ch
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    in_ch if j == 0 else out_ch, out_ch, groups=cfg.norm_num_groups,
                    name=f"up_blocks_{i}_resnets_{j}", **kw,
                )(x)
            if i != len(boc) - 1:
                b, h, w, c = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(out_ch, (3, 3), padding=1,
                            name=f"up_blocks_{i}_upsamplers_0_conv", **kw)(x)
        x = GroupNorm(cfg.norm_num_groups, eps=1e-6, param_dtype=self.param_dtype,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw)(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig = SD15_VAE_CONFIG
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(self.config, **kw)
        self.decoder = Decoder(self.config, **kw)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  name="quant_conv", **kw)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name="post_quant_conv", **kw)

    def encode_moments(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(b, h, w, 3) -> (mean, logvar), each (b, h/8, w/8, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None, sample: bool = True
    ) -> jnp.ndarray:
        """Posterior sample (reference uses ``.latent_dist.sample()``) or mode."""
        mean, logvar = self.encode_moments(x)
        if sample and rng is not None:
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return mean

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        return self.decode(self.encode(x, rng))
