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


def min_snr_weight(
    alphas_cumprod: jnp.ndarray,
    timesteps: jnp.ndarray,
    gamma: float,
    prediction_type: str = "epsilon",
) -> jnp.ndarray:
    """Per-sample min-SNR-γ loss weights (Hang et al. 2023, arXiv 2303.09556).

    Beyond reference: the reference trains with an unweighted MSE; min-SNR
    clamps the per-timestep weight so easy low-noise steps stop dominating
    the gradient.  SNR_t = ᾱ_t / (1 - ᾱ_t); the weight is
    ``min(SNR, γ) / SNR`` for epsilon prediction and ``min(SNR, γ) /
    (SNR + 1)`` for v-prediction (the diffusers convention — the +1 folds
    the ε↔v variance change into the same clamp).  Returns shape
    ``timesteps.shape`` in fp32; finite even at ᾱ→0 (SNR→0 ⇒ weight→1 for
    ε, →0 for v) and at ᾱ→1 when γ caps the blow-up.
    """
    acp = alphas_cumprod.astype(jnp.float32)
    snr = jnp.take(acp / (1.0 - acp), timesteps)
    if prediction_type == "epsilon":
        # min(SNR,γ)/SNR written division-last so SNR→0 gives 1, not 0/0
        return jnp.minimum(jnp.float32(1.0), jnp.float32(gamma) / snr)
    if prediction_type == "v_prediction":
        return jnp.minimum(snr, jnp.float32(gamma)) / (snr + 1.0)
    raise ValueError(f"unknown prediction type {prediction_type}")


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
