"""DDPM training-time noise ops (diffusers ``DDPMScheduler`` semantics).

``add_noise`` and ``get_velocity`` replicate the math used by the reference
training loop (reference ``train.py:364`` via diffusers ``DDPMScheduler``).
Pure functions over a precomputed ``alphas_cumprod`` table so they trace
cleanly under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample schedule values and broadcast over trailing dims."""
    out = jnp.take(table, t)
    return out.reshape(out.shape + (1,) * (ndim - 1))


def add_noise(
    alphas_cumprod: jnp.ndarray,
    latents: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """x_t = sqrt(ᾱ_t) x_0 + sqrt(1-ᾱ_t) ε  (fp32 schedule math)."""
    acp = alphas_cumprod.astype(jnp.float32)
    sqrt_a = _extract(jnp.sqrt(acp), timesteps, latents.ndim)
    sqrt_1ma = _extract(jnp.sqrt(1.0 - acp), timesteps, latents.ndim)
    return (sqrt_a * latents.astype(jnp.float32) + sqrt_1ma * noise.astype(jnp.float32)).astype(
        latents.dtype
    )


def get_velocity(
    alphas_cumprod: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """v = sqrt(ᾱ_t) ε − sqrt(1-ᾱ_t) x_0 (diffusers v-prediction target)."""
    acp = alphas_cumprod.astype(jnp.float32)
    sqrt_a = _extract(jnp.sqrt(acp), timesteps, sample.ndim)
    sqrt_1ma = _extract(jnp.sqrt(1.0 - acp), timesteps, sample.ndim)
    return (sqrt_a * noise.astype(jnp.float32) - sqrt_1ma * sample.astype(jnp.float32)).astype(
        sample.dtype
    )
