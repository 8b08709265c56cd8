"""FreeU — training-free UNet backbone/skip reweighting (beyond reference).

Si et al., "FreeU: Free Lunch in Diffusion U-Net" (arXiv 2309.11497): at the
two deepest up-block stages, amplify the backbone features (first half of
the channels, factor ``b``) and damp the low-frequency band of the skip
features (Fourier mask, factor ``s``) before the skip-concat.  Improves
sample quality at zero training and ~zero cost (the FFT runs on 8x8/16x16
latents).  Published SD-1.5 recipe: b1=1.5, b2=1.6, s1=0.9, s2=0.2.

The reference has no equivalent; this is an opt-in sampling-time knob
(``freeu: [b1, b2, s1, s2]`` in any sampling YAML), off by default (parity).
"""
from __future__ import annotations

import jax.numpy as jnp


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale the centered low-frequency square of the 2D spectrum by ``scale``.

    x: (b, f, h, w, c) — FFT over the spatial axes in fp32 (TPU FFT is
    fp32-only), mask of half-width ``threshold`` around DC, inverse FFT.
    """
    dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(2, 3))
    xf = jnp.fft.fftshift(xf, axes=(2, 3))
    h, w = x.shape[2], x.shape[3]
    ch, cw = h // 2, w // 2
    mask = jnp.ones((1, 1, h, w, 1), jnp.float32)
    mask = mask.at[
        :, :, max(ch - threshold, 0) : ch + threshold,
        max(cw - threshold, 0) : cw + threshold, :,
    ].set(scale)
    xf = jnp.fft.ifftshift(xf * mask, axes=(2, 3))
    return jnp.fft.ifftn(xf, axes=(2, 3)).real.astype(dtype)


def apply_freeu(
    hidden_states: jnp.ndarray,
    res_hidden: jnp.ndarray,
    b: float,
    s: float,
    threshold: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One FreeU site: amplify the first half of the backbone channels by
    ``b`` and low-pass-scale the skip features by ``s``.  Both tensors are
    channels-last (b, f, h, w, c)."""
    nh = hidden_states.shape[-1] // 2
    hidden_states = jnp.concatenate(
        [hidden_states[..., :nh] * jnp.asarray(b, hidden_states.dtype),
         hidden_states[..., nh:]],
        axis=-1,
    )
    res_hidden = fourier_filter(res_hidden, threshold=threshold, scale=s)
    return hidden_states, res_hidden
