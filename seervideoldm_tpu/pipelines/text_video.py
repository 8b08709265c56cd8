"""End-to-end text+frames → video sampling pipeline.

Mirrors the reference inference path (``utils/ddim_sampling_utils.py:21-42``
+ ``inference.py:150-205``): CLIP-encode prompt and empty-string uncond →
FSText decomposition (uncond = raw CLIP embedding expanded per frame, NOT
passed through FSText, ``inference.py:193-194``) → VAE-encode conditioning
frames ×0.18215 → DDIM with CFG re-concatenating the clean reference
latents at every step → per-frame VAE decode ×(1/0.18215) → clamp [0,1].

Everything device-side is jitted once per shape; the DDIM loop is a single
``lax.scan`` (see ``diffusion/ddim.py``).  Video I/O layout at this
boundary: channels-last ``(b, f, h, w, c)`` in [-1, 1].
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.ddim import ddim_decode_loop, ddim_sample_loop, stochastic_encode
from ..diffusion.schedules import DiffusionSchedule
from ..models.clip_text import CLIPTextModel
from ..models.fstext import FSTextTransformer
from ..models.unet3d import SeerUNet, SeerUNetConfig
from ..models.vae import AutoencoderKL, VAE_SCALE


@dataclass
class SeerModels:
    """Module defs + parameter pytrees for the full model stack."""

    unet: SeerUNet
    fstext: FSTextTransformer
    vae: AutoencoderKL
    clip: CLIPTextModel
    unet_params: Any
    fstext_params: Any
    vae_params: Any
    clip_params: Any

    @staticmethod
    def initialize(
        rng: jax.Array,
        num_frames: int = 12,
        unet_config: Optional[SeerUNetConfig] = None,
        vae_config=None,
        clip_config=None,
        fstext_kwargs: Optional[dict] = None,
        dtype: jnp.dtype = jnp.bfloat16,
        param_dtype: jnp.dtype = jnp.float32,
        latent_size: int = 32,
        remat: bool = False,
    ) -> "SeerModels":
        """Random initialization (weights are loaded separately via io.convert)."""
        from ..models.clip_text import CLIP_VIT_L14_TEXT_CONFIG
        from ..models.vae import SD15_VAE_CONFIG

        k1, k2, k3, k4 = jax.random.split(rng, 4)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        unet_config = unet_config or SeerUNetConfig()
        clip_config = clip_config or CLIP_VIT_L14_TEXT_CONFIG
        vae_config = vae_config or SD15_VAE_CONFIG
        unet = SeerUNet(config=unet_config, remat=remat, **kw)
        fstext = FSTextTransformer(
            num_frames=num_frames,
            **{
                "in_channels": unet_config.cross_attention_dim,
                "out_channels": unet_config.cross_attention_dim,
                "cross_attention_dim": unet_config.cross_attention_dim,
                **(fstext_kwargs or {}),
            },
            **kw,
        )
        vae = AutoencoderKL(config=vae_config, **kw)
        clip = CLIPTextModel(config=clip_config, **kw)
        f, s = num_frames, latent_size
        seq = clip_config.max_position_embeddings
        ctx_dim = unet_config.cross_attention_dim
        unet_params = unet.init(
            k1, jnp.zeros((1, f, s, s, unet_config.in_channels)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, f, seq, ctx_dim)), 0,
        )["params"]
        fstext_params = fstext.init(k2, jnp.zeros((1, seq, ctx_dim)))["params"]
        scale = 2 ** (len(vae_config.block_out_channels) - 1)
        vae_params = vae.init(k3, jnp.zeros((1, scale * s, scale * s, 3)))["params"]
        clip_params = clip.init(k4, jnp.zeros((1, seq), jnp.int32))["params"]
        return SeerModels(unet, fstext, vae, clip, unet_params, fstext_params,
                          vae_params, clip_params)


class SeerPipeline:
    """Jit-cached sampling pipeline over a SeerModels bundle.

    With a ``mesh`` (axis ``data``), every batch input is sharded over the
    data axis and params replicated — sampling/eval scale across chips with
    XLA inserting the collectives (the reference's multi-GPU
    ``accelerate.gather`` inference equivalent, SURVEY §2.4).
    """

    def __init__(self, models: SeerModels, schedule: Optional[DiffusionSchedule] = None,
                 mesh=None, donate_latents: bool = True,
                 vae_scale: float = VAE_SCALE):
        self.m = models
        self.mesh = mesh
        self.vae_scale = float(vae_scale)
        # donate x_T into the DDIM scan (halves transient latent HBM);
        # config knob `donate_latents: false` keeps the caller's buffer alive
        self.donate_latents = donate_latents
        # reference sampler schedule defaults (ddim_video.py:27-29)
        self.schedule = schedule or DiffusionSchedule.create(1000)

        self._encode_text = jax.jit(
            lambda p, ids, mask: self.m.clip.apply({"params": p}, ids, mask)
        )
        self._fstext = jax.jit(
            lambda p, ctx: self.m.fstext.apply({"params": p}, ctx)
        )
        self._vae_encode = jax.jit(
            lambda p, x, rng: self.m.vae.apply(
                {"params": p}, x, rng, method=self.m.vae.encode
            ) * self.vae_scale
        )
        self._vae_decode = jax.jit(
            lambda p, z: self.m.vae.apply(
                {"params": p}, z / self.vae_scale, method=self.m.vae.decode
            )
        )

    def _shard(self, x: jnp.ndarray) -> jnp.ndarray:
        """Shard a batch array over the data axis when a mesh is set.

        Batches not divisible by the data axis (e.g. a single image on a
        multi-chip mesh) are replicated instead — a layout fallback, never
        an error."""
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel.mesh import batch_sharding, replicate

        x = jnp.asarray(x)
        data = self.mesh.shape.get("data", 1)
        if np.ndim(x) == 0 or x.shape[0] % data != 0:
            return jax.device_put(x, replicate(self.mesh))
        return jax.device_put(x, batch_sharding(self.mesh, np.ndim(x)))

    # --- text ---
    def encode_text(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> jnp.ndarray:
        return self._encode_text(
            self.m.clip_params, self._shard(input_ids), self._shard(attention_mask)
        )

    def fstext(self, clip_emb: jnp.ndarray) -> jnp.ndarray:
        return self._fstext(self.m.fstext_params, clip_emb)

    # --- vae (per-frame 2D over folded frames) ---
    def vae_encode_video(self, video: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """(b, f, h, w, 3) in [-1,1] -> (b, f, h/8, w/8, 4) scaled latents."""
        b, f, h, w, c = video.shape
        z = self._vae_encode(self.m.vae_params, video.reshape(b * f, h, w, c), rng)
        return z.reshape(b, f, *z.shape[1:])

    def vae_decode_video(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(b, f, h', w', 4) scaled latents -> (b, f, h, w, 3) clamped [0,1]."""
        b, f = latents.shape[:2]
        x = self._vae_decode(self.m.vae_params, latents.reshape(b * f, *latents.shape[2:]))
        x = x.reshape(b, f, *x.shape[1:])
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

    # --- sampling ---
    @functools.lru_cache(maxsize=8)
    def _sample_fn(self, ddim_steps: int, guidance_scale: float, cond_frame: int,
                   use_cfg: bool, sampler: str = "ddim",
                   guidance_interval=None, prediction_type: str = "epsilon",
                   pab_config=None, timestep_spacing: str = "uniform",
                   guidance_rescale: float = 0.0):
        tables = self.schedule.ddim_tables(ddim_steps, eta=0.0,
                                           discr_method=timestep_spacing)
        if sampler in ("dpm++", "dpmpp"):
            from ..diffusion.dpm_solver import dpm_solver_sample_loop
            loop = dpm_solver_sample_loop
        elif sampler == "ddim":
            loop = ddim_sample_loop
        else:
            raise ValueError(f"unknown sampler {sampler!r} (ddim or dpm++)")

        pab_schedule = None
        if pab_config is not None and pab_config.enabled:
            from ..diffusion.pab import build_pab_schedule

            # the reference's +1-offset uniform grid can yield MORE sampler
            # steps than ddim_steps (e.g. 30 -> 31: range(0,1000,33)); the
            # schedule must cover the actual table length
            pab_schedule = build_pab_schedule(len(tables.timesteps), pab_config)

        def fn(unet_params, x_T, x0_emb, context, uncond_context):
            def unet_apply(x, t, ctx, cf):
                return self.m.unet.apply({"params": unet_params}, x, t, ctx, cf)

            pab = None
            if pab_schedule is not None:
                def pab_apply(x, t, ctx, cf, pab_state, flags):
                    out, mut = self.m.unet.apply(
                        {"params": unet_params, "pab": pab_state},
                        x, t, ctx, cf, pab=flags, mutable=["pab"],
                    )
                    return out, mut["pab"]

                pab = (*pab_schedule, pab_apply)

            return loop(
                unet_apply, x_T, tables, context,
                x0_emb=x0_emb,
                uncond_context=uncond_context if use_cfg else None,
                guidance_scale=guidance_scale if use_cfg else 1.0,
                cond_frame=cond_frame,
                guidance_interval=guidance_interval if use_cfg else None,
                prediction_type=prediction_type,
                guidance_rescale=guidance_rescale if use_cfg else 0.0,
                **({"pab": pab} if pab is not None else {}),
            )

        return jax.jit(fn, donate_argnums=(1,) if self.donate_latents else ())

    def sample_latents(
        self,
        x_T: jnp.ndarray,
        x0_emb: jnp.ndarray,
        context: jnp.ndarray,
        uncond_context: Optional[jnp.ndarray] = None,
        ddim_steps: int = 30,
        guidance_scale: float = 7.5,
        cond_frame: int = 0,
        sampler: str = "ddim",
        guidance_interval=None,
        prediction_type: str = "epsilon",
        pab_config=None,
        timestep_spacing: str = "uniform",
        guidance_rescale: float = 0.0,
    ) -> jnp.ndarray:
        """Sample future-frame latents (DDIM by default; ``sampler="dpm++"``
        uses DPM-Solver++ 2M on the same step grid).

        x_T: (b, f2, h', w', 4) noise; x0_emb: (b, f1, h', w', 4) clean
        conditioning latents; context: (b, f1+f2, 77, 768) FSText embedding;
        uncond_context: same shape (raw CLIP empty embedding per frame).
        ``scale == 1.0`` disables CFG (reference ddim_sampling_utils.py:23-24).
        ``guidance_interval=(lo, hi)`` restricts CFG to timesteps in the
        window (beyond reference): steps outside run a single-batch UNet call.
        ``pab_config`` (a ``diffusion.pab.PABConfig``, beyond reference)
        enables Pyramid Attention Broadcast: attention deltas are computed
        every N steps and reused in between (N per attention type).
        ``timestep_spacing="trailing"`` anchors the step grid at t=T-1 and
        ``guidance_rescale`` applies the CFG std-rescale (both beyond
        reference; the Lin et al. 2024 zero-terminal-SNR recipe together
        with a ``rescale_zero_snr`` schedule and v-prediction).
        """
        use_cfg = uncond_context is not None and guidance_scale != 1.0
        # normalize the alias before the lru_cache key — "dpmpp" and "dpm++"
        # must share one compiled executable
        sampler = "dpm++" if sampler == "dpmpp" else sampler
        if guidance_interval is not None:
            guidance_interval = tuple(float(v) for v in guidance_interval)
        fn = self._sample_fn(ddim_steps, float(guidance_scale), int(cond_frame),
                             use_cfg, sampler, guidance_interval,
                             prediction_type, pab_config, timestep_spacing,
                             float(guidance_rescale))
        if not use_cfg:
            uncond_context = context  # placeholder, unused
        return fn(self.m.unet_params, x_T, x0_emb, context, uncond_context)

    # --- SDEdit-style video editing (beyond reference) ---
    @functools.lru_cache(maxsize=8)
    def _edit_fn(self, ddim_steps: int, t_enc: int, guidance_scale: float,
                 cond_frame: int, use_cfg: bool,
                 prediction_type: str = "epsilon",
                 timestep_spacing: str = "uniform",
                 guidance_rescale: float = 0.0):
        tables = self.schedule.ddim_tables(ddim_steps, eta=0.0,
                                           discr_method=timestep_spacing)

        def fn(unet_params, x0_future, x0_emb, context, uncond_context, rng):
            def unet_apply(x, t, ctx, cf):
                return self.m.unet.apply({"params": unet_params}, x, t, ctx, cf)

            noise = jax.random.normal(rng, x0_future.shape, x0_future.dtype)
            # reference convention (CompVis img2img): encode at forward index
            # t_enc, decode the last t_enc reverse steps.  jnp.take clamps,
            # so t_enc == num (strength 1.0) encodes at the noisiest step
            # instead of crashing like the torch original.
            x = stochastic_encode(tables, x0_future, jnp.asarray(t_enc), noise)
            return ddim_decode_loop(
                unet_apply, x, tables, context, t_enc,
                uncond_context=uncond_context if use_cfg else None,
                guidance_scale=guidance_scale if use_cfg else 1.0,
                x0_emb=x0_emb, cond_frame=cond_frame,
                prediction_type=prediction_type,
                guidance_rescale=guidance_rescale if use_cfg else 0.0,
            )

        return jax.jit(fn)

    def edit(
        self,
        video: jnp.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        uncond_ids: np.ndarray,
        uncond_mask: np.ndarray,
        cond_frames: int,
        edit_strength: float,
        rng: jax.Array,
        ddim_steps: int = 30,
        guidance_scale: float = 7.5,
        cond_frame: int = 0,
        prediction_type: str = "epsilon",
        timestep_spacing: str = "uniform",
        guidance_rescale: float = 0.0,
    ) -> jnp.ndarray:
        """SDEdit-style video editing (beyond reference; Meng et al. 2022,
        arXiv 2108.01073): re-noise the future-frame latents of a REAL input
        clip to ``edit_strength`` of the trajectory and denoise under a new
        instruction — the machinery the reference ships but never wires
        (``ddim_video.py:240-275`` ``stochastic_encode``/``decode``).

        ``video``: (b, f, h, w, 3) in [-1, 1], full clip including the
        ``cond_frames`` reference frames (kept clean, concatenated at every
        step exactly like generation).  ``edit_strength`` in [0, 1]: 0
        returns the input unchanged, 1 ~= full regeneration.  Returns
        decoded future frames (b, f - cond_frames, h, w, 3) in [0, 1].
        """
        if not 0.0 <= edit_strength <= 1.0:
            raise ValueError(f"edit_strength must be in [0, 1], got {edit_strength}")
        b, f = video.shape[:2]
        f1 = cond_frames
        video = self._shard(video)
        k_enc, k_noise = jax.random.split(rng)
        latents = self.vae_encode_video(video, k_enc)
        x0_emb, x0_future = latents[:, :f1], latents[:, f1:]
        clip_emb = self.encode_text(input_ids, attention_mask)
        context = self.fstext(clip_emb)
        uncond_emb = self.encode_text(uncond_ids, uncond_mask)
        uncond_context = jnp.broadcast_to(
            uncond_emb[:, None], (b, context.shape[1], *uncond_emb.shape[1:])
        )
        tables = self.schedule.ddim_tables(ddim_steps, eta=0.0,
                                           discr_method=timestep_spacing)
        t_enc = int(round(edit_strength * len(tables.timesteps)))
        if t_enc == 0:
            return self.vae_decode_video(x0_future)
        use_cfg = guidance_scale != 1.0
        fn = self._edit_fn(ddim_steps, t_enc, float(guidance_scale),
                           int(cond_frame), use_cfg, prediction_type,
                           timestep_spacing, float(guidance_rescale))
        edited = fn(self.m.unet_params, x0_future, x0_emb, context,
                    uncond_context, k_noise)
        return self.vae_decode_video(edited)

    def generate(
        self,
        cond_video: jnp.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        uncond_ids: np.ndarray,
        uncond_mask: np.ndarray,
        num_frames: int,
        rng: jax.Array,
        ddim_steps: int = 30,
        guidance_scale: float = 7.5,
        cond_frame: int = 0,
        sampler: str = "ddim",
        guidance_interval=None,
        prediction_type: str = "epsilon",
        pab_config=None,
        timestep_spacing: str = "uniform",
        guidance_rescale: float = 0.0,
    ) -> jnp.ndarray:
        """Full path: cond frames (b, f1, h, w, 3) in [-1,1] + tokenized prompt
        -> decoded future frames (b, f2, h, w, 3) in [0,1].

        One-window special case of :meth:`generate_rollout` (single chunk,
        ``total_frames = num_frames - f1``) — one shared implementation of
        the conditioning mechanics, locked bitwise by
        ``test_rollout.py::test_single_chunk_matches_generate_bitwise``."""
        f2 = num_frames - cond_video.shape[1]
        return self.generate_rollout(
            cond_video,
            [{"input_ids": input_ids, "attention_mask": attention_mask}],
            uncond_ids, uncond_mask,
            num_frames=num_frames, total_frames=f2, rng=rng,
            ddim_steps=ddim_steps, guidance_scale=guidance_scale,
            cond_frame=cond_frame, sampler=sampler,
            guidance_interval=guidance_interval,
            prediction_type=prediction_type,
            pab_config=pab_config,
            timestep_spacing=timestep_spacing,
            guidance_rescale=guidance_rescale,
        )

    def generate_rollout(
        self,
        cond_video: jnp.ndarray,
        prompts_tok: list,
        uncond_ids: np.ndarray,
        uncond_mask: np.ndarray,
        num_frames: int,
        total_frames: int,
        rng: jax.Array,
        ddim_steps: int = 30,
        guidance_scale: float = 7.5,
        cond_frame: int = 0,
        sampler: str = "ddim",
        guidance_interval=None,
        prediction_type: str = "epsilon",
        pab_config=None,
        timestep_spacing: str = "uniform",
        guidance_rescale: float = 0.0,
    ) -> jnp.ndarray:
        """Autoregressive long-video rollout (beyond reference).

        The reference generates a fixed window of ``num_frames - f1`` future
        frames (``inference_img.py:164-177`` ref).  This rolls the window
        forward: after each chunk, the last ``f1`` *generated latents*
        become the next chunk's conditioning latents (no decode/encode
        round trip — conditioning stays in latent space, so there is no
        VAE drift between chunks), until ``total_frames`` future frames
        exist.  Every chunk reuses the one jit-cached sampler executable
        (identical shapes), so rollout length is compile-free.

        ``prompts_tok``: list of tokenizer outputs (dicts with
        ``input_ids``/``attention_mask``), either one entry (same
        instruction every chunk) or one per chunk — chained sub-task
        instructions, matching the instructional-video domain.

        The first chunk is bitwise-identical to :meth:`generate` with the
        same ``rng`` (same ``k_enc``/``k_noise`` split); chunk ``c > 0``
        draws its noise from ``fold_in(k_noise, c)``.

        Returns decoded future frames ``(b, total_frames, h, w, 3)`` in
        [0, 1] (conditioning frames not included, like :meth:`generate`).
        """
        b, f1, h, w, _ = cond_video.shape
        f2 = num_frames - f1
        if f2 < 1:
            raise ValueError(f"num_frames={num_frames} leaves no future frames "
                             f"beyond the {f1} conditioning frames")
        if total_frames < 1:
            raise ValueError(f"total_frames must be >= 1, got {total_frames}")
        n_chunks = -(-total_frames // f2)  # ceil
        if len(prompts_tok) == 1:
            prompts_tok = list(prompts_tok) * n_chunks
        if len(prompts_tok) != n_chunks:
            raise ValueError(
                f"rollout needs 1 or {n_chunks} prompts (one per "
                f"{f2}-frame chunk covering total_frames={total_frames}), "
                f"got {len(prompts_tok)}"
            )

        cond_video = self._shard(cond_video)
        k_enc, k_noise = jax.random.split(rng)

        uncond_emb = self.encode_text(uncond_ids, uncond_mask)
        # cache per unique prompt: chained instructions often repeat
        ctx_cache: dict = {}

        def context_for(tok):
            key = (np.asarray(tok["input_ids"]).tobytes(),
                   np.asarray(tok["attention_mask"]).tobytes())
            if key not in ctx_cache:
                clip_emb = self.encode_text(tok["input_ids"], tok["attention_mask"])
                ctx_cache[key] = self.fstext(clip_emb)
            return ctx_cache[key]

        x0_emb = self.vae_encode_video(cond_video, k_enc)
        scale = 2 ** (len(self.m.vae.config.block_out_channels) - 1)
        lat_shape = (b, f2, h // scale, w // scale,
                     self.m.vae.config.latent_channels)

        chunks = []
        for c in range(n_chunks):
            context = context_for(prompts_tok[c])
            if context.shape[1] != num_frames:
                raise ValueError(
                    f"FSText was built for {context.shape[1]} frames but "
                    f"num_frames={num_frames}"
                )
            uncond_context = jnp.broadcast_to(
                uncond_emb[:, None], (b, context.shape[1], *uncond_emb.shape[1:])
            )
            k_c = k_noise if c == 0 else jax.random.fold_in(k_noise, c)
            x_T = jax.random.normal(k_c, lat_shape, dtype=x0_emb.dtype)
            latents = self.sample_latents(
                x_T, x0_emb, context, uncond_context,
                ddim_steps=ddim_steps, guidance_scale=guidance_scale,
                cond_frame=cond_frame, sampler=sampler,
                guidance_interval=guidance_interval,
                prediction_type=prediction_type,
                pab_config=pab_config,
                timestep_spacing=timestep_spacing,
                guidance_rescale=guidance_rescale,
            )
            chunks.append(latents)
            if c + 1 < n_chunks:
                if f2 >= f1:
                    x0_emb = latents[:, -f1:]
                else:
                    # short chunks: conditioning spans the previous window
                    x0_emb = jnp.concatenate([x0_emb, latents], axis=1)[:, -f1:]

        all_latents = jnp.concatenate(chunks, axis=1)[:, :total_frames]
        return self.vae_decode_video(all_latents)
