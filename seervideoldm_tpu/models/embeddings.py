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
    import math

    import numpy as np

    half_dim = dim // 2
    # Static fp64 frequency table: torch computes this in fp32 whose ~1-ulp
    # exp() error, amplified by t≈1000, yields ~2e-3 phase noise — we are
    # strictly more accurate, matching fp64 ground truth to ~1e-5.
    exponent = -math.log(max_period) * np.arange(half_dim, dtype=np.float64)
    exponent = exponent / (half_dim - downscale_freq_shift)
    freqs = jnp.asarray(np.exp(exponent).astype(np.float32))
    emb = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
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
