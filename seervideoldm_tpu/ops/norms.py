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
        g = self.num_groups
        assert c % g == 0, f"channels {c} % groups {g} != 0"
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)

        # Lane-friendly statistics: reduce the big tensor per-channel (the
        # channel axis stays in lanes), then aggregate the tiny (b, c) moments
        # into (b, groups).  Avoids reshaping activations to a c/groups-lane
        # layout.  fp32 accumulation throughout (reference fp32-GN islands).
        b = x.shape[0]
        x32 = x.astype(jnp.float32)
        flat = x32.reshape(b, -1, c)
        n_spatial = flat.shape[1]
        s1 = jnp.sum(flat, axis=1)  # (b, c)
        s2 = jnp.sum(flat * flat, axis=1)  # (b, c)
        denom = n_spatial * (c // g)
        mean_g = s1.reshape(b, g, c // g).sum(-1) / denom  # (b, g)
        ex2_g = s2.reshape(b, g, c // g).sum(-1) / denom
        var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
        # broadcast per-group stats back to per-channel (tiny arrays)
        mean_c = jnp.repeat(mean_g, c // g, axis=-1)  # (b, c)
        rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + self.eps), c // g, axis=-1)
        w = rstd_c * scale.astype(jnp.float32)[None, :]
        bshift = bias.astype(jnp.float32)[None, :] - mean_c * w
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        out = x32 * w.reshape(shape) + bshift.reshape(shape)
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
