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
import numpy as np

from .pab import COMPUTE_ALL, mode_to_flags
from .schedules import DDIMTables

UNetApply = Callable[..., jnp.ndarray]
# unet_apply(x, timesteps, context, cond_frame) -> eps, with
#   x: (b, f, h, w, c) latents, timesteps: (b,) int32,
#   context: (b, f_ctx, l, d) FSText embeddings.
#
# PAB (Pyramid Attention Broadcast, diffusion/pab.py) variant threading the
# attention-delta cache:
# pab_apply(x, timesteps, context, cond_frame, pab_state, flags)
#   -> (eps, new_pab_state), with `flags` a STATIC mode dict — the sampler
#   dispatches over modes with lax.switch so each branch is one fully-fused
#   static UNet graph.


def make_eps_fn(
    unet_apply: UNetApply,
    context: jnp.ndarray,
    x0_emb: Optional[jnp.ndarray],
    uncond_context: Optional[jnp.ndarray],
    guidance_scale: float,
    cond_frame: int,
    guidance_interval: Optional[tuple[float, float]] = None,
    pab: Optional[tuple] = None,
    guidance_rescale: float = 0.0,
) -> Callable[..., jnp.ndarray]:
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

    ``pab=(modes, pab_apply)`` (Pyramid Attention Broadcast): the returned
    fn is stateful — ``eps(img, t, pab_state, mode_ix) -> (e_t, new_state)``
    with ``lax.switch(mode_ix)`` over one static UNet graph per mode.
    """
    b = context.shape[0]
    use_cfg = uncond_context is not None and guidance_scale != 1.0

    def combine_cfg(e_uncond, e_cond):
        """CFG combine, optionally with guidance rescale (beyond reference;
        Lin et al. 2024 §3.4 / diffusers ``rescale_noise_cfg``): renormalize
        the guided output's per-sample std back to the cond branch's std,
        blended by ``guidance_rescale``∈[0,1].  Counters the overexposure
        that high CFG scales cause (essential with zero-terminal-SNR
        schedules).  0.0 = plain CFG (parity), typical 0.7."""
        e_t = e_uncond + guidance_scale * (e_cond - e_uncond)
        if guidance_rescale == 0.0:
            return e_t
        e_t32, e_cond32 = e_t.astype(jnp.float32), e_cond.astype(jnp.float32)
        axes = tuple(range(1, e_t.ndim))
        std_pos = jnp.std(e_cond32, axis=axes, keepdims=True)
        std_cfg = jnp.std(e_t32, axis=axes, keepdims=True)
        rescaled = e_t32 * (std_pos / jnp.maximum(std_cfg, 1e-12))
        out = guidance_rescale * rescaled + (1.0 - guidance_rescale) * e_t32
        return out.astype(e_t.dtype)

    cond_f = 0 if x0_emb is None else x0_emb.shape[1]
    unequal_cfg = use_cfg and uncond_context.shape[1:] != context.shape[1:]
    if use_cfg and not unequal_cfg:
        ctx_in = jnp.concatenate([uncond_context, context], axis=0)
    else:
        ctx_in = context

    if pab is not None:
        # the delta cache is shaped for exactly one UNet call per step: the
        # two-call unequal-context CFG path and the batch-halving
        # guidance_interval cond are shape-incompatible with it
        if unequal_cfg:
            raise ValueError(
                "PAB requires the batched CFG path; expand uncond_context to "
                "match context's shape (as every reference entry point does)"
            )
        if guidance_interval is not None:
            raise ValueError(
                "PAB and guidance_interval cannot be combined: the interval's "
                "single-batch branch conflicts with the CFG-batched PAB cache"
            )
        modes, pab_apply = pab

        def eps_pab(img, t, pab_state, mode_ix):
            x_cat = img if x0_emb is None else jnp.concatenate([x0_emb, img], axis=1)
            ts = jnp.full((b,), t, dtype=jnp.int32)
            if use_cfg:
                x_in = jnp.concatenate([x_cat, x_cat], axis=0)
                t_in = jnp.concatenate([ts, ts], axis=0)
                ctx = ctx_in
            else:
                x_in, t_in, ctx = x_cat, ts, context

            def make_branch(mode):
                flags = mode_to_flags(mode)

                def branch(x_in, t_in, pab_state):
                    return pab_apply(x_in, t_in, ctx, cond_frame, pab_state, flags)

                return branch

            e_all, new_state = jax.lax.switch(
                mode_ix, [make_branch(m) for m in modes], x_in, t_in, pab_state
            )
            e_all = e_all[:, cond_f:]
            if use_cfg:
                e_uncond, e_cond = jnp.split(e_all, 2, axis=0)
                e_t = combine_cfg(e_uncond, e_cond)
            else:
                e_t = e_all
            return e_t.astype(jnp.float32), new_state

        return eps_pab

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
        return combine_cfg(e_uncond, e_cond)

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


def make_pab_init_state(
    pab_apply,
    x_T: jnp.ndarray,
    context: jnp.ndarray,
    x0_emb: Optional[jnp.ndarray],
    uncond_context: Optional[jnp.ndarray],
    guidance_scale: float,
    cond_frame: int,
):
    """Zero-filled PAB cache pytree with the exact structure/shapes/dtypes
    the all-compute UNet mode writes (via ``jax.eval_shape`` — no compute).

    The zeros never reach an output: the schedule's step 0 is always the
    all-compute mode, which overwrites every entry before any step
    broadcasts (diffusion/pab.py ``build_pab_schedule``).
    """
    b = context.shape[0]
    use_cfg = uncond_context is not None and guidance_scale != 1.0

    def prime(img):
        x_cat = img if x0_emb is None else jnp.concatenate([x0_emb, img], axis=1)
        ts = jnp.zeros((b,), dtype=jnp.int32)
        if use_cfg:
            x_in = jnp.concatenate([x_cat, x_cat], axis=0)
            t_in = jnp.concatenate([ts, ts], axis=0)
            ctx = jnp.concatenate([uncond_context, context], axis=0)
        else:
            x_in, t_in, ctx = x_cat, ts, context
        return pab_apply(x_in, t_in, ctx, cond_frame, {}, mode_to_flags(COMPUTE_ALL))[1]

    shapes = jax.eval_shape(prime, x_T)
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


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
    pab: Optional[tuple] = None,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """Run the full DDIM reverse process; returns final latents (b,f,h,w,c).

    ``tables`` must be reverse-ordered (index 0 = highest timestep), as
    produced by ``DiffusionSchedule.ddim_tables``.

    ``prediction_type="v_prediction"`` (beyond reference; pairs with the
    trainer's v target): the model output is interpreted as
    ``v = sqrt(a)·eps - sqrt(1-a)·x0`` and converted to eps via
    ``eps = sqrt(a)·v + sqrt(1-a)·x_t`` before the DDIM update — a
    v-trained checkpoint samples correctly with no other changes.

    ``pab=(modes, mode_idx, pab_apply)`` (Pyramid Attention Broadcast,
    diffusion/pab.py; beyond reference): per-step ``lax.switch`` over one
    static UNet graph per mode, with the attention-delta cache riding the
    scan carry.  ``mode_idx`` must have one entry per sampler step.
    """
    if prediction_type not in ("epsilon", "v_prediction"):
        raise ValueError(f"unknown prediction type {prediction_type!r}")
    if prediction_type == "epsilon" and float(np.min(tables.alphas)) == 0.0:
        raise ValueError(
            "epsilon prediction is undefined at SNR 0 (pred_x0 divides by "
            "sqrt(alpha)=0); a zero-terminal-SNR schedule requires "
            "prediction_type='v_prediction'"
        )
    timesteps = jnp.asarray(tables.timesteps)
    alphas = jnp.asarray(tables.alphas)
    alphas_prev = jnp.asarray(tables.alphas_prev)
    sigmas = jnp.asarray(tables.sigmas)
    sqrt_one_minus = jnp.asarray(tables.sqrt_one_minus_alphas)
    num_steps = timesteps.shape[0]

    def ddim_update(img, e_t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx):
        img32 = img.astype(jnp.float32)
        if prediction_type == "v_prediction":
            # CFG composes identically in v- and eps-space (the map is
            # affine in the model output with an x_t term common to both
            # branches), so converting after eps_fn is exact.  pred_x0 is
            # computed in the DIRECT v form sqrt(a)·x − sqrt(1−a)·v (equal to
            # (x − sqrt(1−a)·eps)/sqrt(a) algebraically, but finite at the
            # a_t = 0 terminal step of a zero-SNR-rescaled schedule).
            v_t = e_t
            e_t = jnp.sqrt(a_t) * v_t + sqrt_1m_at * img32
            pred_x0 = jnp.sqrt(a_t) * img32 - sqrt_1m_at * v_t
        else:
            pred_x0 = (img32 - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if eta_noise_key is not None:
            key = jax.random.fold_in(eta_noise_key, step_idx)
            x_prev = x_prev + sigma_t * temperature * jax.random.normal(
                key, img.shape, dtype=jnp.float32
            )
        return x_prev.astype(img.dtype)

    if pab is not None:
        modes, mode_idx, pab_apply = pab
        if len(mode_idx) != num_steps:
            raise ValueError(
                f"PAB schedule has {len(mode_idx)} steps but the sampler runs "
                f"{num_steps}; build it with build_pab_schedule(num_steps, ...)"
            )
        eps_fn = make_eps_fn(unet_apply, context, x0_emb, uncond_context,
                             guidance_scale, cond_frame, guidance_interval,
                             pab=(modes, pab_apply),
                             guidance_rescale=guidance_rescale)
        pab_state0 = make_pab_init_state(
            pab_apply, x_T, context, x0_emb, uncond_context, guidance_scale,
            cond_frame,
        )

        def step_pab(carry, per_step):
            img, st = carry
            t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx, mode_ix = per_step
            e_t, st = eps_fn(img, t, st, mode_ix)
            x_prev = ddim_update(img, e_t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx)
            return (x_prev, st), None

        per_step = (
            timesteps, alphas, alphas_prev, sigmas, sqrt_one_minus,
            jnp.arange(num_steps, dtype=jnp.int32),
            jnp.asarray(mode_idx, dtype=jnp.int32),
        )
        (final, _), _ = jax.lax.scan(step_pab, (x_T, pab_state0), per_step)
        return final

    eps_fn = make_eps_fn(unet_apply, context, x0_emb, uncond_context,
                         guidance_scale, cond_frame, guidance_interval,
                         guidance_rescale=guidance_rescale)

    def step(img, per_step):
        t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx = per_step
        e_t = eps_fn(img, t)
        x_prev = ddim_update(img, e_t, a_t, a_prev, sigma_t, sqrt_1m_at, step_idx)
        return x_prev, None

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
    # mode='clip': jnp.take's default out-of-bounds mode fills with NaN, so
    # step_index == num (edit_strength 1.0) must clamp to the noisiest step
    # instead (the torch original would crash on this index).
    a = jnp.take(alphas_fwd, step_index, mode="clip")
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
    **kwargs,
) -> jnp.ndarray:
    """Decode from an intermediate step (reference ``ddim_video.py:256-275``):
    run only the last ``t_start`` reverse steps of the subsequence.

    Extra kwargs (``x0_emb``, ``cond_frame``, ``guidance_interval``, ...)
    pass through to :func:`ddim_sample_loop` — the SDEdit-style video-editing
    path needs the cond-frame concat mechanics the reference's unused
    ``decode`` never had."""
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
        **kwargs,
    )
