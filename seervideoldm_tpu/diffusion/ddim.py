"""DDIM video sampler as a single jitted ``lax.scan``.

Replaces the reference's Python hot loop (``ldm/models/diffusion/
ddim_video.py:135-238``) with a scan whose carry is the latent video —
the UNet is traced/compiled exactly once for all steps, and the carry is
donated by callers that jit this function.

Semantics preserved from the reference ``p_sample_ddim``:

- the clean conditioning-frame latents ``x0_emb`` are concatenated on the
  frame axis before every UNet call and the predicted noise for those
  frames is sliced back off (``ddim_video.py:187-210``);
- classifier-free guidance batches ``[uncond; cond]`` through one UNet call
  (``ddim_video.py:201-204``);
- the DDIM update ``x_prev = sqrt(ᾱ_prev)·pred_x0 + dir_xt + σ·noise``
  (``ddim_video.py:229-237``);
- ``cond_frame`` defaults to 0 during sampling — the reference's sampling
  wrapper never forwards it (``utils/ddim_sampling_utils.py:25-36``), so the
  temporal-FF cond-frame skip is active only in training.  Exposed here for
  callers that want the "fixed" behavior.

- the two-call CFG branch for *unequal* uncond/cond context shapes
  (``ddim_video.py:200-207``: the batched ``[uncond; cond]`` concat requires
  equal shapes; otherwise the reference runs two separate UNet calls).
  Every reference entry point expands the uncond embedding to a matching
  shape before sampling (``inference.py:193-194``), so the branch is
  near-dead in practice, but it is live API surface and kept here: a
  ``uncond_context`` whose trailing dims differ from ``context``'s takes
  two UNet calls per scan step (each still traced exactly once).

Layout: channels-last latents ``(b, f, h, w, c)``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedules import DDIMTables

UNetApply = Callable[..., jnp.ndarray]
# unet_apply(x, timesteps, context, cond_frame) -> eps, with
#   x: (b, f, h, w, c) latents, timesteps: (b,) int32,
#   context: (b, f_ctx, l, d) FSText embeddings.


def make_eps_fn(
    unet_apply: UNetApply,
    context: jnp.ndarray,
    x0_emb: Optional[jnp.ndarray],
    uncond_context: Optional[jnp.ndarray],
    guidance_scale: float,
    cond_frame: int,
    guidance_interval: Optional[tuple[float, float]] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build ``eps(img, t) -> e_t`` with the reference's conditioning
    mechanics (``ddim_video.py:185-211``), shared by every sampler:

    - clean cond-frame latents ``x0_emb`` concatenated before each UNet
      call, their predicted noise sliced back off;
    - CFG as one batched ``[uncond; cond]`` call when context shapes match,
      two separate calls otherwise (``:200-207``);
    - returned ``e_t`` is fp32 and covers only the future frames.

    ``guidance_interval=(lo, hi)`` (beyond reference, Kynkäänniemi et al.
    2024 "limited interval" guidance): CFG runs only for timesteps
    ``lo <= t <= hi``; outside the window the step takes the single
    cond-only UNet call, halving its batch.  At DDIM-50 with the SD-1.5
    schedule, roughly the fraction of steps outside the window is saved.
    """
    b = context.shape[0]
    use_cfg = uncond_context is not None and guidance_scale != 1.0
    cond_f = 0 if x0_emb is None else x0_emb.shape[1]
    unequal_cfg = use_cfg and uncond_context.shape[1:] != context.shape[1:]
    if use_cfg and not unequal_cfg:
        ctx_in = jnp.concatenate([uncond_context, context], axis=0)
    else:
        ctx_in = context

    def eps_single(x_cat: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        return unet_apply(x_cat, ts, context, cond_frame)[:, cond_f:]

    def eps_cfg(x_cat: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        if unequal_cfg:
            e_uncond = unet_apply(x_cat, ts, uncond_context, cond_frame)[:, cond_f:]
            e_cond = unet_apply(x_cat, ts, context, cond_frame)[:, cond_f:]
        else:
            x_in = jnp.concatenate([x_cat, x_cat], axis=0)
            t_in = jnp.concatenate([ts, ts], axis=0)
            e_all = unet_apply(x_in, t_in, ctx_in, cond_frame)[:, cond_f:]
            e_uncond, e_cond = jnp.split(e_all, 2, axis=0)
        return e_uncond + guidance_scale * (e_cond - e_uncond)

    def eps(img: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        x_cat = img if x0_emb is None else jnp.concatenate([x0_emb, img], axis=1)
        ts = jnp.full((b,), t, dtype=jnp.int32)
        if not use_cfg:
            e_t = eps_single(x_cat, ts)
        elif guidance_interval is None:
            e_t = eps_cfg(x_cat, ts)
        else:
            lo, hi = guidance_interval
            in_window = jnp.logical_and(t >= lo, t <= hi)
            # both branches are traced/compiled once; the runtime picks per
            # step — outside the window only the single-batch call executes
            e_t = jax.lax.cond(in_window, eps_cfg, eps_single, x_cat, ts)
        return e_t.astype(jnp.float32)

    return eps


def ddim_sample_loop(
    unet_apply: UNetApply,
    x_T: jnp.ndarray,
    tables: DDIMTables,
    context: jnp.ndarray,
    x0_emb: Optional[jnp.ndarray] = None,
    uncond_context: Optional[jnp.ndarray] = None,
    guidance_scale: float = 1.0,
    cond_frame: int = 0,
    eta_noise_key: Optional[jax.Array] = None,
    temperature: float = 1.0,
    guidance_interval: Optional[tuple[float, float]] = None,
    prediction_type: str = "epsilon",
) -> jnp.ndarray:
    """Run the full DDIM reverse process; returns final latents (b,f,h,w,c).

    ``tables`` must be reverse-ordered (index 0 = highest timestep), as
    produced by ``DiffusionSchedule.ddim_tables``.

    ``prediction_type="v_prediction"`` (beyond reference; pairs with the
    trainer's v target): the model output is interpreted as
    ``v = sqrt(a)·eps - sqrt(1-a)·x0`` and converted to eps via
    ``eps = sqrt(a)·v + sqrt(1-a)·x_t`` before the DDIM update — a
    v-trained checkpoint samples correctly with no other changes.
    """
    if prediction_type not in ("epsilon", "v_prediction"):
        raise ValueError(f"unknown prediction type {prediction_type!r}")
    timesteps = jnp.asarray(tables.timesteps)
    alphas = jnp.asarray(tables.alphas)
    alphas_prev = jnp.asarray(tables.alphas_prev)
    sigmas = jnp.asarray(tables.sigmas)
    sqrt_one_minus = jnp.asarray(tables.sqrt_one_minus_alphas)
    num_steps = timesteps.shape[0]

    eps_fn = make_eps_fn(unet_apply, context, x0_emb, uncond_context,
                         guidance_scale, cond_frame, guidance_interval)

    def step(img, per_step):
        t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx = per_step
        e_t = eps_fn(img, t)
        img32 = img.astype(jnp.float32)
        if prediction_type == "v_prediction":
            # CFG composes identically in v- and eps-space (the map is
            # affine in the model output with an x_t term common to both
            # branches), so converting after eps_fn is exact
            e_t = jnp.sqrt(a_t) * e_t + sqrt_1m_at * img32
        pred_x0 = (img32 - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if eta_noise_key is not None:
            key = jax.random.fold_in(eta_noise_key, step_idx)
            x_prev = x_prev + sigma_t * temperature * jax.random.normal(
                key, img.shape, dtype=jnp.float32
            )
        return x_prev.astype(img.dtype), None

    per_step = (
        timesteps,
        alphas,
        alphas_prev,
        sigmas,
        sqrt_one_minus,
        jnp.arange(num_steps, dtype=jnp.int32),
    )
    final, _ = jax.lax.scan(step, x_T, per_step)
    return final


def stochastic_encode(
    tables: DDIMTables,
    x0: jnp.ndarray,
    step_index: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Jump-forward encode to DDIM step ``step_index`` (reference
    ``ddim_video.py:240-254``): x = sqrt(ᾱ)·x0 + sqrt(1-ᾱ)·ε.

    ``step_index`` indexes the *forward-ordered* DDIM subsequence (low noise
    at 0), matching the reference's use of the un-reversed tables.
    """
    alphas_fwd = jnp.asarray(tables.alphas)[::-1]  # forward order
    a = jnp.take(alphas_fwd, step_index)
    a = a.reshape(a.shape + (1,) * (x0.ndim - a.ndim))
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def ddim_decode_loop(
    unet_apply: UNetApply,
    x_latent: jnp.ndarray,
    tables: DDIMTables,
    context: jnp.ndarray,
    t_start: int,
    uncond_context: Optional[jnp.ndarray] = None,
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    """Decode from an intermediate step (reference ``ddim_video.py:256-275``):
    run only the last ``t_start`` reverse steps of the subsequence."""
    num = tables.timesteps.shape[0]
    sliced = DDIMTables(
        timesteps=tables.timesteps[num - t_start :],
        alphas=tables.alphas[num - t_start :],
        alphas_prev=tables.alphas_prev[num - t_start :],
        sigmas=tables.sigmas[num - t_start :],
        sqrt_one_minus_alphas=tables.sqrt_one_minus_alphas[num - t_start :],
    )
    return ddim_sample_loop(
        unet_apply, x_latent, sliced, context,
        uncond_context=uncond_context, guidance_scale=guidance_scale,
    )
