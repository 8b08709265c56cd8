"""YAML configuration loader, key-compatible with the reference configs.

The reference loads flat YAML files with OmegaConf and treats the result as
an argparse namespace (reference ``train.py:437-442``).  We accept the same
YAML files/keys verbatim, layering them over typed defaults, and additionally
support dotted-key CLI overrides (``--set key=value``).
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


@dataclass
class Config:
    """Flat config namespace covering every key the reference YAMLs use.

    Reference key sources: ``configs/{train,inference,inference_base,eval}.yaml``.
    Unknown keys found in a YAML are attached dynamically so downstream code
    can still read them.
    """

    # --- model / pretrained ---
    pretrained_model_name_or_path: Optional[str] = None
    fstext_init_ckpt: Optional[str] = None
    tokenizer_path: Optional[str] = None  # local CLIP BPE vocab/merges dir

    # --- data ---
    dataset: str = "sthv2"
    dataset_path: Optional[str] = None
    resolution: int = 256
    cond_frames: int = 2
    num_frames: int = 12
    center_crop: bool = True
    dataloader_num_workers: int = 4

    # --- training ---
    output_dir: str = "outputs/run"
    seed: int = 0
    train_batch_size: int = 1
    val_batch_size: int = 1
    gradient_accumulation_steps: int = 2
    learning_rate: float = 1.28e-5
    scale_lr: bool = True
    lr_scheduler: str = "cosine"
    lr_warmup_steps: int = 10000
    max_train_steps: int = 200000
    num_train_epochs: int = 10000
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 0.3
    mixed_precision: str = "bf16"  # reference default fp16; bf16 on TPU
    # bf16 host->device wire for the video batch when the model computes in
    # bf16 (halves transfer bytes; bf16's 0.4% step == the frames' uint8
    # quantization).  Set false to keep the fp32 wire for parity/ablation
    # runs where the input quantization must be expressible.
    bf16_wire: bool = True
    # VAE posterior handling during training: True (reference parity — the
    # torch trainer samples latent_dist) draws a fresh latent per epoch;
    # False encodes the posterior MEAN (the diffusers train-script knob of
    # the same name) — deterministic targets, required for single-clip
    # overfit proofs (tools/overfit_one_clip.py).
    vae_sample_posterior: bool = True
    # latent scale factor — the reference hardcodes SD-1.5's 0.18215 at
    # every encode/decode site (/root/reference/train.py:351-352,
    # utils/ddim_sampling_utils.py:38,49); a knob because other VAEs use
    # other constants (SDXL 0.13025) and toy-scale proofs need unit-scale
    # latents (tools/overfit_one_clip.py)
    vae_scale: float = 0.18215
    use_8bit_adam: bool = False
    gradient_checkpointing: bool = False
    # EMA of trainable weights (0 disables). Beyond reference: the reference
    # fine-tune driver has no EMA (LitEma exists only in dead CompVis code);
    # standard diffusion practice. Costs one extra fp32 copy of the
    # trainable subtree. Checkpointed params use the EMA weights.
    ema_decay: float = 0.0
    # beyond reference: "epsilon" (reference parity) or "v_prediction" —
    # sets BOTH the training target and the samplers' output interpretation
    prediction_type: str = "epsilon"
    # beyond reference: min-SNR-γ loss weighting (arXiv 2303.09556) — clamp
    # the per-timestep loss weight at min(SNR, γ)/SNR (ε) or min(SNR, γ)/
    # (SNR+1) (v). 0 disables (reference-parity unweighted MSE); typical 5.0
    snr_gamma: float = 0.0
    save_steps: int = 1000
    saved_global_step: Optional[int] = None
    # checkpoint retention: keep only the newest N step directories
    # (None = keep all, the reference behavior)
    max_to_keep: Optional[int] = None
    text_loss: bool = False
    push_to_hub: bool = False
    logging_dir: str = "logs"

    # --- sampling ---
    ddim_steps: int = 30
    # "ddim" (reference parity) or "dpm++" (DPM-Solver++ 2M, beyond
    # reference: comparable quality at ~2.5x fewer steps)
    sampler: str = "ddim"
    scale: float = 7.5  # classifier-free guidance scale
    # beyond reference: [lo, hi] timestep window — CFG runs only inside it
    # (single-batch UNet calls outside). null = CFG at every step (parity).
    guidance_interval: Optional[list] = None
    # beyond reference: Pyramid Attention Broadcast (arXiv 2408.12588) —
    # reuse per-attention-type residual deltas across sampler steps.
    # pab: false = off (parity). Ranges = compute every N-th step inside the
    # pab_window fraction of the trajectory; 1 = never broadcast that type.
    pab: bool = False
    pab_spatial_range: int = 2
    pab_cross_range: int = 6
    pab_temporal_range: int = 4
    pab_window: list = field(default_factory=lambda: [0.1, 0.9])
    # beyond reference: Token Merging (ToMeSD, arXiv 2303.17604) — merge
    # tome_ratio of the spatial tokens around the spatial self-attention in
    # high-resolution UNet blocks (>= tome_min_tokens spatial tokens).
    # 0.0 = off (parity). Typical 0.5 — attacks the seq-4096 self-attention
    # that dominates the 512px step.
    tome_ratio: float = 0.0
    tome_min_tokens: int = 1024
    # beyond reference: FreeU (arXiv 2309.11497) — training-free
    # [b1, b2, s1, s2] backbone-amplify / skip-lowpass reweighting at the
    # two deepest up-block stages.  null = off (parity).  SD-1.5 recipe:
    # [1.5, 1.6, 0.9, 0.2].
    freeu: Optional[list] = None
    # beyond reference: autoregressive long-video rollout — total FUTURE
    # frames to generate by rolling the num_frames window forward, feeding
    # the last cond_frames generated latents back as conditioning.
    # null = single window (parity). inference_img only; the prompt may be
    # "|"-separated per-chunk chained instructions.
    total_frames: Optional[int] = None
    # --- zero-terminal-SNR recipe (beyond reference; Lin et al. 2024
    # "Common Diffusion Noise Schedules and Sampler Steps are Flawed") ---
    # rescale ALL schedules (train + sampler) so terminal SNR is exactly 0;
    # requires prediction_type: v_prediction (epsilon is undefined at SNR 0)
    rescale_zero_snr: bool = False
    # "uniform" = reference +1-offset grid (parity); "trailing" anchors the
    # sampler grid at t=T-1 (needed for zero-SNR to sample from pure noise)
    timestep_spacing: str = "uniform"
    # CFG std-rescale blend in [0,1]; 0 = plain CFG (parity), typical 0.7
    guidance_rescale: float = 0.0
    # --- trainable scope (beyond reference) ---
    # "reference" = the reference's partial freeze (UNet temporal_attentions
    # + FSText train, everything else frozen — /root/reference/train.py:
    # 123-125,188-192); "all" trains every UNet+FSText weight (from-scratch
    # training, and the single-clip overfit proof where a random-init frozen
    # spatial half caps convergence). VAE/CLIP never train (both recipes).
    trainable_scope: str = "reference"
    # --- LoRA adaptation (beyond reference; arXiv 2106.09685) ---
    # rank of the low-rank attention-projection adapters. 0 = off (reference
    # parity: full temporal-attention fine-tune). With rank > 0 the UNet is
    # FULLY frozen and only the rank-r A/B factors (+ FSText) train — the
    # recipe for adapting a fine-tuned Seer checkpoint to a new domain.
    # Checkpoints store the MERGED weights (load anywhere unchanged).
    lora_rank: int = 0
    # LoRA alpha (delta scaled by alpha/rank); null = rank (scale 1.0)
    lora_alpha: Optional[float] = None
    # "attention" = every UNet attention projection (spatial/cross/temporal);
    # "temporal" = only temporal_attentions (the reference trainable scope)
    lora_targets: str = "attention"
    # --- ZeRO-1 optimizer-state sharding (beyond reference) ---
    # shard Adam moments / grad-accumulation buffers / EMA over the 'data'
    # mesh axis (params stay replicated, DDP semantics unchanged); needs a
    # multi-device 'data' axis — ignored with a warning otherwise
    zero1: bool = False
    # --- FSDP / ZeRO-3 (beyond reference) ---
    # shard the PARAMETERS themselves (trainable, frozen, VAE/CLIP) plus all
    # optimizer tensors over the 'data' axis; GSPMD inserts per-layer
    # all-gathers and gradient reduce-scatters over ICI. Per-chip weight
    # memory ~1/N; training math unchanged. Subsumes zero1.
    fsdp: bool = False
    num_samples: int = 1
    sample_iter: int = 1
    n_rows: int = 2
    image_path: Optional[str] = None
    input_text_prompts: Optional[str] = None
    learned_unet_ckpt: Optional[str] = None

    # --- eval ---
    compute_fvd: bool = True
    MAX_FVD_BATCH: int = 32
    compute_is: bool = False
    MAX_IS_BATCH: int = 100
    # beyond reference: trilinear-resample clips to the C3D's 16-frame
    # contract so IS runs on 12-frame recipes (the reference crashes there)
    is_cast_frames: bool = False
    i3d_ckpt: Optional[str] = None
    c3d_ckpt: Optional[str] = None
    # beyond reference: CLIPSIM text-faithfulness metric (mean frame-vs-
    # prompt CLIP cosine, GODIVA protocol) — needs a local HF CLIPModel
    # state dict (ViT-L/14) for clip_sim_ckpt
    compute_clip_sim: bool = False
    clip_sim_ckpt: Optional[str] = None

    # --- serving (beyond reference) ---
    serve_host: str = "127.0.0.1"
    serve_port: int = 8000
    serve_max_batch: int = 4
    serve_max_wait_ms: float = 100.0

    # --- TPU / parallelism (new) ---
    mesh_shape: Optional[dict] = None  # e.g. {"data": 8} or {"data": 4, "model": 2}
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    use_pallas_attention: bool = True
    # ring attention for the SWAT temporal attention under sequence
    # parallelism: keep the frame axis sharded and rotate K/V blocks around
    # the 'seq' axis with ppermute instead of all-gathering the sequence
    # (peak memory O(local block) — the long-rollout enabler). Only engages
    # when the mesh has a seq axis; false forces the gather-based paths.
    ring_attention: bool = True
    remat: bool = False
    donate_latents: bool = True

    # Dynamic bag for unknown YAML keys.
    extras: dict = field(default_factory=dict)

    def __getattr__(self, name: str) -> Any:
        extras = object.__getattribute__(self, "extras") if "extras" in self.__dict__ else {}
        if name in extras:
            return extras[name]
        raise AttributeError(name)

    def get(self, name: str, default: Any = None) -> Any:
        try:
            return getattr(self, name)
        except AttributeError:
            return default


_FIELDS = {f.name for f in dataclasses.fields(Config)}


def pab_config_from(cfg: "Config"):
    """Build a ``diffusion.pab.PABConfig`` from the flat YAML knobs, or None
    when ``pab: false`` (the parity default)."""
    if not cfg.get("pab"):
        return None
    from .diffusion.pab import PABConfig

    return PABConfig(
        spatial_range=int(cfg.pab_spatial_range),
        cross_range=int(cfg.pab_cross_range),
        temporal_range=int(cfg.pab_temporal_range),
        window=tuple(float(v) for v in cfg.pab_window),
    )


def sampler_schedule_from(cfg: "Config"):
    """The sampler-side ``DiffusionSchedule`` for this config: the reference
    defaults (``ddim_video.py:27-29``), zero-SNR-rescaled when
    ``rescale_zero_snr: true``."""
    from .diffusion.schedules import DiffusionSchedule

    return DiffusionSchedule.create(
        1000, rescale_zero_snr=bool(cfg.rescale_zero_snr)
    )


def sampling_kwargs_from(cfg: "Config") -> dict:
    """The per-call sampling knobs shared by every entry point (sampler
    choice + the beyond-reference guidance/schedule options)."""
    return dict(
        sampler=cfg.sampler,
        guidance_interval=cfg.guidance_interval,
        prediction_type=cfg.prediction_type,
        pab_config=pab_config_from(cfg),
        timestep_spacing=cfg.timestep_spacing,
        guidance_rescale=float(cfg.guidance_rescale),
    )


def _coerce(value: str) -> Any:
    """Parse a CLI override value with YAML semantics (``1`` -> int, etc.)."""
    return yaml.safe_load(value)


def validate(cfg: Config) -> Config:
    """Reject reference knobs this framework cannot honor — loudly.

    Silently swallowing a requested behavior (the reference honors
    ``push_to_hub`` at ``train.py:139-150``) is worse than failing: the user
    would believe their run did something it did not.
    """
    if cfg.get("push_to_hub"):
        raise ValueError(
            "push_to_hub is not supported: this framework runs with zero "
            "egress (no Hugging Face Hub access). Remove `push_to_hub: true` "
            "from the config and upload the checkpoint directory manually."
        )
    if cfg.sampler not in ("ddim", "dpm++", "dpmpp"):
        raise ValueError(
            f"sampler must be 'ddim' or 'dpm++', got {cfg.sampler!r}"
        )
    if cfg.prediction_type not in ("epsilon", "v_prediction"):
        raise ValueError(
            f"prediction_type must be 'epsilon' or 'v_prediction', "
            f"got {cfg.prediction_type!r}"
        )
    if cfg.timestep_spacing not in ("uniform", "trailing"):
        raise ValueError(
            f"timestep_spacing must be 'uniform' (reference parity) or "
            f"'trailing', got {cfg.timestep_spacing!r}"
        )
    if cfg.rescale_zero_snr and cfg.prediction_type != "v_prediction":
        raise ValueError(
            "rescale_zero_snr requires prediction_type: v_prediction — "
            "epsilon prediction is undefined at the zero-SNR terminal step"
        )
    if cfg.rescale_zero_snr and cfg.timestep_spacing != "trailing":
        # not an error (training-only configs never sample), but a sampler
        # on the uniform(+1) grid tops out at t=981 and never visits the
        # rescaled schedule's terminal SNR-0 step — the recipe's fix
        # silently would not engage
        print("warning: rescale_zero_snr without timestep_spacing: trailing "
              "— sampling will never reach the terminal SNR-0 step")
    if cfg.trainable_scope not in ("reference", "all"):
        raise ValueError(
            f"trainable_scope must be 'reference' or 'all', got "
            f"{cfg.trainable_scope!r}"
        )
    if int(cfg.lora_rank) < 0:
        raise ValueError(f"lora_rank must be >= 0, got {cfg.lora_rank!r}")
    if int(cfg.lora_rank) > 0 and cfg.trainable_scope != "reference":
        raise ValueError(
            "lora_rank > 0 freezes the full UNet (adapters train instead); "
            "combine it with trainable_scope: reference only"
        )
    if int(cfg.lora_rank) > 0:
        from .training.lora import SCOPES

        if cfg.lora_targets not in SCOPES:
            raise ValueError(
                f"lora_targets must be one of {SCOPES}, got {cfg.lora_targets!r}"
            )
        if cfg.lora_alpha is not None and float(cfg.lora_alpha) <= 0.0:
            raise ValueError(
                f"lora_alpha must be > 0, got {cfg.lora_alpha!r}"
            )
    if float(cfg.snr_gamma) < 0.0:
        raise ValueError(f"snr_gamma must be >= 0, got {cfg.snr_gamma!r}")
    if not float(cfg.vae_scale) > 0.0:
        raise ValueError(f"vae_scale must be > 0, got {cfg.vae_scale!r}")
    if not 0.0 <= float(cfg.tome_ratio) < 1.0:
        raise ValueError(
            f"tome_ratio must be in [0, 1), got {cfg.tome_ratio!r}"
        )
    if int(cfg.tome_min_tokens) < 4:
        raise ValueError(
            f"tome_min_tokens must be >= 4, got {cfg.tome_min_tokens!r}"
        )
    fu = cfg.freeu
    if fu is not None and (
        len(fu) != 4
        or not all(isinstance(v, (int, float)) and not isinstance(v, bool)
                   and 0 < v <= 10 for v in fu)
    ):
        raise ValueError(
            f"freeu must be [b1, b2, s1, s2] with floats in (0, 10], got {fu!r}"
        )
    if not 0.0 <= float(cfg.guidance_rescale) <= 1.0:
        raise ValueError(
            f"guidance_rescale must be in [0, 1], got {cfg.guidance_rescale!r}"
        )
    gi = cfg.get("guidance_interval")
    if gi is not None and (
        len(gi) != 2 or not all(isinstance(v, (int, float)) for v in gi)
        or gi[0] > gi[1]
    ):
        raise ValueError(
            f"guidance_interval must be [lo, hi] timesteps with lo <= hi, "
            f"got {gi!r}"
        )
    if cfg.get("pab"):
        if gi is not None:
            raise ValueError(
                "pab and guidance_interval cannot be combined: the interval's "
                "single-batch CFG branch conflicts with the CFG-batched PAB "
                "attention cache"
            )
        pab_config_from(cfg)  # raises on invalid ranges/window
    if cfg.get("center_crop") is False:
        raise ValueError(
            "center_crop: false is not supported: the reference's live data "
            "path always applies Resize -> CenterCrop (sthv2.py:50-56) and "
            "so does this framework; a no-crop mode would silently change "
            "the training distribution."
        )
    return cfg


def load_config(path: str, overrides: Optional[list[str]] = None) -> Config:
    """Load a flat YAML config, applying ``key=value`` overrides."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config()
    for key, value in raw.items():
        if key in _FIELDS:
            setattr(cfg, key, value)
        else:
            cfg.extras[key] = value
    for item in overrides or []:
        key, _, value = item.partition("=")
        if key in _FIELDS:
            setattr(cfg, key, _coerce(value))
        else:
            cfg.extras[key] = _coerce(value)
    return validate(cfg)


def parse_args(description: str, extra_flags: Optional[dict] = None) -> Config:
    """Reference-compatible CLI: ``<script>.py --config ./configs/x.yaml``.

    ``extra_flags`` maps flag name -> default for script-specific flags
    (e.g. ``--image_path`` in inference_img, reference ``inference_img.py:189-198``).
    """
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        help="dotted-key overrides, e.g. --set ddim_steps=50")
    for flag, default in (extra_flags or {}).items():
        parser.add_argument(f"--{flag}", type=str, default=default)
    ns = parser.parse_args()
    cfg = load_config(ns.config, ns.overrides)
    for flag in (extra_flags or {}):
        value = getattr(ns, flag)
        if value is not None:
            setattr(cfg, flag, value) if flag in _FIELDS else cfg.extras.__setitem__(flag, value)
    return cfg
