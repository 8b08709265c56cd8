"""Normalization layers with fp32 accumulation islands.

The reference keeps GroupNorms in fp32 inside an fp16 autocast region
(``seer/models/resnet.py:179,197``, ``unet_3d_condition.py:368``).  We
replicate that as: cast input to fp32 → normalize → affine → cast back to
the compute dtype.  Channels-last layout throughout.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GroupNorm(nn.Module):
    """Channels-last GroupNorm over the final axis, fp32 statistics.

    Matches ``torch.nn.GroupNorm(num_groups, C)`` applied to an NC... tensor
    after transposing channels to the end.
    """

    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        assert c % self.num_groups == 0, f"channels {c} % groups {self.num_groups} != 0"
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)

        x32 = x.astype(jnp.float32)
        spatial = x32.shape[1:-1]
        grouped = x32.reshape(x32.shape[0], -1, self.num_groups, c // self.num_groups)
        # statistics over (all spatial positions, channels within the group)
        mean = grouped.mean(axis=(1, 3), keepdims=True)
        var = grouped.var(axis=(1, 3), keepdims=True)
        normed = (grouped - mean) * jax.lax.rsqrt(var + self.eps)
        normed = normed.reshape(x32.shape[0], *spatial, c)
        out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return out.astype(orig_dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the final axis with fp32 statistics (torch parity:
    elementwise affine, eps 1e-5)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        out = (x32 - mean) / jnp.sqrt(var + self.eps)
        out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return out.astype(orig_dtype)
