"""The jitted data-parallel train step.

Semantics of one step match the reference hot loop (``train.py:319-387``):

1. FSText decomposes the (precomputed, frozen) CLIP embedding;
2. the clean cond-frame latents are concatenated in front of the noised
   future-frame latents (``train.py:364-365``);
3. the UNet predicts ε with ``cond_frame=args.cond_frames``
   (``train.py:367`` — training-only behavior, SURVEY §2.5.3);
4. cond frames sliced off the prediction, MSE vs noise (or velocity),
   optional FSText ``text_loss`` (``train.py:346-347,371-380``);
5. AdamW step with global-norm clip and gradient accumulation.

VAE/CLIP encoding is a separate jitted "prepare" function — those models
are frozen, so keeping them out of the differentiated step saves memory and
compile time.  Under a data-parallel mesh the batch is sharded on axis 0;
XLA inserts the gradient all-reduce (the DDP/NCCL equivalent, SURVEY §2.4).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..diffusion.ddpm import add_noise, get_velocity, min_snr_weight
from ..diffusion.schedules import DiffusionSchedule
from ..models.vae import VAE_SCALE


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # trainable-only tree (or full tree if not partitioned)
    opt_state: Any
    # Exponential moving average of ``params`` (same tree), or None when EMA
    # is disabled.  Beyond-reference: the reference's LitEma
    # (``ldm/modules/ema.py``) exists only in the dead CompVis code and the
    # fine-tune driver never uses it; EMA weights are nonetheless standard
    # practice for diffusion sampling quality, so we expose it as a knob.
    ema_params: Any = None

    @staticmethod
    def create(params: dict, tx: optax.GradientTransformation,
               ema: bool = False) -> "TrainState":
        # EMA starts as a true copy (not aliased buffers): the train step
        # donates the whole state, and two tree leaves sharing one donated
        # buffer is undefined
        ema_params = jax.tree.map(jnp.copy, params) if ema else None
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), ema_params=ema_params,
        )


def partition_params(params: dict, mask: Any) -> tuple[dict, dict]:
    """Split a param tree into (trainable, frozen) flat-key subtrees.

    The reference stops gradients with ``requires_grad=False``
    (``train.py:188-192``); the JAX equivalent is differentiating only the
    trainable subtree — the backward pass never materializes (or computes)
    frozen-weight gradients, and Adam state exists only for trainable leaves.
    """
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    flat_mask = tu.flatten_dict(mask)
    train = {k: v for k, v in flat.items() if flat_mask[k]}
    frozen = {k: v for k, v in flat.items() if not flat_mask[k]}
    return tu.unflatten_dict(train), tu.unflatten_dict(frozen)


def combine_params(trainable: dict, frozen: dict) -> dict:
    """Inverse of partition_params."""
    import flax.traverse_util as tu

    flat = dict(tu.flatten_dict(frozen))
    flat.update(tu.flatten_dict(trainable))
    return tu.unflatten_dict(flat)


def prepare_batch_fn(models, sample_posterior: bool = True,
                     vae_scale: float = VAE_SCALE) -> Callable:
    """Jitted frozen-encoder pass: (video, ids, mask, rng) -> latent batch.

    video: (b, f, h, w, 3) in [-1, 1]; returns dict with ``latents_x0``
    (cond frames), ``latents`` (future frames), ``clip_emb``.

    ``sample_posterior=False`` (config ``vae_sample_posterior``) encodes
    the posterior MEAN instead of a draw — the diffusers train-script
    knob of the same name.  Default True is reference parity (the torch
    trainer samples ``latent_dist``); the deterministic form is the one
    that makes single-clip overfit proofs converge
    (tools/overfit_one_clip.py): at random VAE init the posterior noise
    exceeds the signal, so sampled targets put an irreducible floor on
    the eps loss.
    """
    clip, vae = models.clip, models.vae

    @functools.partial(jax.jit, static_argnames=("cond_frames",))
    def _prepare(video, input_ids, attention_mask, rng, clip_params,
                 vae_params, cond_frames: int, fold_step=None):
        if fold_step is not None:
            # per-micro-step key derivation INSIDE the jit: a host-side
            # `np.asarray(jax.random.fold_in(...))` is a full accelerator
            # round trip per micro-step (dispatch + device->host readback)
            rng = jax.random.fold_in(rng, fold_step)
        b, f, h, w, c = video.shape
        clip_emb = clip.apply({"params": clip_params}, input_ids, attention_mask)
        flat = video.reshape(b * f, h, w, c)
        z = vae.apply({"params": vae_params}, flat, rng, sample_posterior,
                      method=vae.encode) * vae_scale
        z = z.reshape(b, f, *z.shape[1:])
        return {
            "latents_x0": z[:, :cond_frames],
            "latents": z[:, cond_frames:],
            "clip_emb": clip_emb,
        }

    def prepare(video, input_ids, attention_mask, rng, cond_frames: int,
                fold_step=None):
        # frozen VAE/CLIP weights must be runtime ARGUMENTS — captured as
        # closure constants they get embedded into the lowered module
        # (~800 MB fp32), which the remote-compile tunnel rejects outright
        # (HTTP 413) and which would bloat any compile anywhere
        return _prepare(video, input_ids, attention_mask, rng,
                        models.clip_params, models.vae_params, cond_frames,
                        fold_step)

    return prepare


def make_train_step(
    models,
    tx: optax.GradientTransformation,
    schedule: Optional[DiffusionSchedule] = None,
    cond_frames: int = 2,
    prediction_type: str = "epsilon",
    text_loss: bool = False,
    frozen_params: Optional[dict] = None,
    ema_decay: float = 0.0,
    state_sharding: Any = None,
    snr_gamma: float = 0.0,
    lora_scale: float = 0.0,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    With ``frozen_params`` (from ``partition_params``), ``state.params``
    holds only the trainable subtree — gradients and optimizer state never
    exist for frozen weights (memory: the reference's fp32 UNet + Adam would
    not fit a 16 GB chip otherwise)."""
    train_schedule = schedule or DiffusionSchedule.sd15_train_schedule()
    acp = jnp.asarray(train_schedule.alphas_cumprod)
    num_timesteps = train_schedule.num_timesteps
    unet, fstext = models.unet, models.fstext

    def loss_fn(trainable, batch, noise, timesteps, frozen):
        if lora_scale > 0.0:
            # LoRA (training/lora.py): the trainable tree carries a "lora"
            # adapter subtree; the effective UNet kernels W + scale*A@B are
            # materialized here inside the differentiated step, so grads
            # flow only to the rank-r factors
            from .lora import split_lora

            lora, trainable = split_lora(trainable)
            if lora is None:
                raise ValueError(
                    "lora_scale > 0 but the trainable tree has no 'lora' "
                    "subtree (build it with training.lora.init_lora)"
                )
        else:
            lora = None
        params = (
            combine_params(trainable, frozen)
            if frozen is not None else trainable
        )
        if lora is not None:
            from .lora import apply_lora

            params = dict(params, unet=apply_lora(params["unet"], lora,
                                                  lora_scale))
        context = fstext.apply({"params": params["fstext"]}, batch["clip_emb"])
        loss_text = 0.0
        if text_loss:
            # FSText init objective (train.py:346-347)
            loss_text = jnp.mean(
                (context.mean(axis=1) - batch["clip_emb"]) ** 2
            )
        latents = batch["latents"]
        noisy = add_noise(acp, latents, noise, timesteps)
        x_in = jnp.concatenate([batch["latents_x0"], noisy], axis=1)
        pred = unet.apply(
            {"params": params["unet"]}, x_in, timesteps, context, cond_frames
        )[:, cond_frames:]
        if prediction_type == "epsilon":
            target = noise
        elif prediction_type == "v_prediction":
            target = get_velocity(acp, latents, noise, timesteps)
        else:
            raise ValueError(f"unknown prediction type {prediction_type}")
        se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if snr_gamma > 0.0:
            # min-SNR-γ (beyond reference, arXiv 2303.09556): per-sample MSE
            # weighted by the clamped SNR; `mse` metric stays the raw MSE so
            # logged curves remain comparable across snr_gamma settings
            w = min_snr_weight(acp, timesteps, snr_gamma, prediction_type)
            per_sample = se.reshape(se.shape[0], -1).mean(axis=1)
            loss = jnp.mean(w * per_sample)
        else:
            loss = jnp.mean(se)
        return loss + loss_text, {"mse": jnp.mean(se)}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _train_step(state: TrainState, batch: dict, rng: jax.Array, frozen):
        # state is DONATED: without it the step transiently holds old+new
        # trainable params AND both Adam moment sets (~2x5.4 GB at flagship
        # scale) — with VAE/CLIP resident that OOMs the 16 GB chip
        k_noise, k_t = jax.random.split(jax.random.fold_in(rng, state.step))
        latents = batch["latents"]
        noise = jax.random.normal(k_noise, latents.shape, dtype=jnp.float32).astype(
            latents.dtype
        )
        timesteps = jax.random.randint(k_t, (latents.shape[0],), 0, num_timesteps)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, noise, timesteps, frozen
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if isinstance(state.opt_state, optax.MultiStepsState):
            # norm of the running-mean accumulated gradient — at the sync
            # micro-step this is exactly the vector global-norm clipping sees
            # (optax.MultiSteps averages grads: acc·n/(n+1) + g/(n+1))
            n = state.opt_state.mini_step
            acc = jax.tree.map(
                lambda a, g: a * (n / (n + 1)) + g / (n + 1),
                state.opt_state.acc_grads, grads,
            )
            gnorm = optax.global_norm(acc)
        else:
            gnorm = optax.global_norm(grads)
        ema_params = state.ema_params
        if ema_decay > 0.0:
            # LitEma semantics (reference ``ldm/modules/ema.py:15-35``):
            # warmup-ramped decay min(decay, (1+n)/(10+n)) per optimizer
            # update.  Under gradient accumulation the params only change at
            # the sync micro-step, so the EMA advances only there — updating
            # every micro-step would compound the decay by the accum factor.
            if isinstance(state.opt_state, optax.MultiStepsState):
                did_sync = opt_state.mini_step == 0  # post-update: just wrapped
                n_updates = opt_state.gradient_step
            else:
                did_sync = jnp.bool_(True)
                n_updates = state.step + 1
            d = jnp.minimum(ema_decay, (1.0 + n_updates) / (10.0 + n_updates))
            d = jnp.where(did_sync, d, 1.0).astype(jnp.float32)
            ema_params = jax.tree.map(
                lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)).astype(e.dtype),
                state.ema_params, params,
            )
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema_params)
        if state_sharding is not None:
            # ZeRO-1 (parallel.sharding.zero1_state_sharding): pin the output
            # state to the input's shardings so the donated sharded moment /
            # EMA buffers stay sharded across steps — without the constraint
            # GSPMD is free to replicate them, silently undoing the memory win
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_sharding
            )
        return new_state, {"loss": loss, "grad_norm": gnorm, **aux}

    def train_step(state: TrainState, batch: dict, rng: jax.Array,
                   frozen=frozen_params):
        # frozen params MUST reach the jitted function as a runtime
        # *argument*: a Python default binds inside the trace, turning every
        # frozen weight into an embedded module constant — at flagship scale
        # that pulls ~GBs device->host at trace time and bloats the module
        # until the compile never finishes (the round-1 blocker).
        if ema_decay > 0.0 and state.ema_params is None:
            raise ValueError(
                "ema_decay > 0 requires TrainState.create(..., ema=True)"
            )
        return _train_step(state, batch, rng, frozen)

    def compile_aligned(state: TrainState, batch: dict, rng) -> Callable:
        """AOT-compile the step, then barrier all processes before the first
        execution.  The first run of a multi-process executable opens its
        Gloo/ICI communicators with a bounded rendezvous window (30 s on the
        CPU Gloo backend); per-rank trace+compile skew easily exceeds that,
        so compile first on every rank, sync, then execute."""
        compiled = _train_step.lower(state, batch, rng, frozen_params).compile()
        from ..parallel.distributed import barrier_sync

        barrier_sync("train_step_compiled")

        def run(state: TrainState, batch: dict, rng) -> tuple:
            return compiled(state, batch, rng, frozen_params)

        return run

    train_step.jitted = _train_step  # for lower()/compile probes
    train_step.compile_aligned = compile_aligned
    return train_step
