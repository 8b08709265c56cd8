"""Timestep embeddings (diffusers ``Timesteps``/``TimestepEmbedding`` parity).

Reference uses ``Timesteps(320, flip_sin_to_cos=True, freq_shift=0)`` +
``TimestepEmbedding(320, 1280)`` (``seer/models/unet_3d_condition.py:97-100``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers ``get_timestep_embedding`` semantics.

    timesteps: (b,) -> (b, dim), fp32.
    """
    half_dim = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """MLP: linear_1 -> silu -> linear_2 (diffusers parameter names)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_1"
        )(sample)
        sample = nn.silu(sample)
        return nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_2"
        )(sample)
