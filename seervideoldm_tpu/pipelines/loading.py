"""Model construction + weight loading shared by all entry points.

Replicates the reference setup path (``train.py:159-187``,
``inference.py:66-128``): frozen CLIP/VAE from a local SD-1.5 directory,
SeerUNet inflated from the SD 2D UNet (or loaded from fine-tuned
``pytorch_model.bin``), FSText from ``pytorch_model_1.bin`` or
``fstext_init_ckpt``.  All paths are local — this framework runs with zero
egress.  Native Orbax checkpoints (ours) are auto-detected.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..io.convert import (
    convert_clip_text,
    convert_fstext,
    convert_seer_unet,
    convert_vae,
    load_torch_state_dict,
)
from ..utils.tokenizer import build_tokenizer
from .text_video import SeerModels


def _find_weights(directory: str, *names: str) -> Optional[str]:
    for name in names:
        path = os.path.join(directory, name)
        if os.path.exists(path):
            return path
    return None


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
           "fp32": jnp.float32, "fp16": jnp.bfloat16,  # fp16 configs run as bf16 on TPU
           "no": jnp.float32}


def _parse_remat(value):
    """Normalize the YAML ``remat`` knob; reject unknown strings loudly
    (an unrecognized truthy string would otherwise silently ENABLE full
    block remat)."""
    if value in (False, None, 0, "", "none", "False", "false"):
        return False
    if value in (True, "block", "True", "true"):
        return True
    if value == "save_attn":
        return "save_attn"
    raise ValueError(
        f"remat must be one of False/none, True/block, save_attn; got {value!r}"
    )


def load_models(cfg: Config, rng: jax.Array, latent_size: Optional[int] = None,
                mesh=None):
    """Build SeerModels (+ tokenizer), loading any locally available weights.

    Compute dtype: the reference YAML key ``mixed_precision`` ("fp16"/"bf16"/
    "no", reference ``configs/*.yaml``) is honored unless the TPU-native
    ``compute_dtype`` key overrides it.

    With a ``mesh`` carrying a ``seq`` axis (>1), the UNet is built with a
    frame-axis activation sharding (sequence parallelism).  Any multi-device
    mesh (data- and/or seq-sharded batches) is registered as the *activation
    mesh*: the Pallas kernels then run under shard_map (axis-0 batch
    partitioning — pallas_call is an opaque custom call GSPMD cannot
    partition on its own) instead of being disabled.
    """
    from ..ops.pallas import (get_activation_mesh, set_activation_mesh,
                              set_pallas_enabled)

    from ..ops.ring import set_ring_enabled

    use_pallas = bool(cfg.get("use_pallas_attention", True))
    set_pallas_enabled(use_pallas)
    set_ring_enabled(bool(cfg.get("ring_attention", True)))
    seq_parallel = mesh is not None and mesh.shape.get("seq", 1) > 1
    # set_activation_mesh itself filters to the batch-bearing axes with
    # size > 1 and registers None when there are none (or mesh is None)
    set_activation_mesh(mesh)
    if get_activation_mesh() is not None and use_pallas:
        print("multi-device mesh: Pallas kernels run under shard_map "
              "(batch-partitioned); non-divisible sites take the XLA paths")
    if seq_parallel and bool(cfg.get("ring_attention", True)):
        print("seq axis active: SWAT temporal attention runs the ppermute "
              "ring (frame shards stay resident; ring_attention: false "
              "restores the gather paths)")

    dtype_key = cfg.get("compute_dtype") or cfg.mixed_precision or "bfloat16"
    if cfg.get("compute_dtype") == "bfloat16" and cfg.mixed_precision == "no":
        dtype_key = "no"  # explicit full-precision request wins over our default
    dtype = _DTYPES.get(str(dtype_key), jnp.bfloat16)
    param_dtype = _DTYPES.get(str(cfg.param_dtype), jnp.float32)

    # Optional sub-model config overrides (YAML dicts under
    # ``model_overrides``) — smoke tests and scaled-down experiments.
    overrides = cfg.get("model_overrides") or {}

    def _cfg(cls, key):
        if key not in overrides:
            return None
        return cls(**{k: tuple(v) if isinstance(v, list) else v
                      for k, v in overrides[key].items()})

    from ..models.clip_text import CLIPTextConfig
    from ..models.unet3d import SeerUNetConfig
    from ..models.vae import VAEConfig

    unet_config = _cfg(SeerUNetConfig, "unet")
    vae_config = _cfg(VAEConfig, "vae")
    clip_config = _cfg(CLIPTextConfig, "clip")
    # Accel-knob injection (ToMe / FreeU): the top-level YAML knob is
    # injected into the UNet construction config UNLESS model_overrides.unet
    # set the same key explicitly — presence in the override dict decides
    # (an explicit `tome_ratio: 0.0` override disables, it is not mistaken
    # for the dataclass default).
    unet_overrides = overrides.get("unet") or {}
    if (float(cfg.get("tome_ratio") or 0.0) > 0.0
            and "tome_ratio" not in unet_overrides):
        import dataclasses as _dc

        base = unet_config or SeerUNetConfig()
        tome_min = (base.tome_min_tokens
                    if "tome_min_tokens" in unet_overrides
                    else int(cfg.get("tome_min_tokens") or 1024))
        unet_config = _dc.replace(
            base, tome_ratio=float(cfg.tome_ratio), tome_min_tokens=tome_min)
    if cfg.get("freeu") is not None and "freeu" not in unet_overrides:
        import dataclasses as _dc

        base = unet_config or SeerUNetConfig()
        unet_config = _dc.replace(
            base, freeu=tuple(float(v) for v in cfg.freeu))
    n_vae_blocks = len(vae_config.block_out_channels) if vae_config else 4
    vae_scale = 2 ** (n_vae_blocks - 1)
    models = SeerModels.initialize(
        rng,
        num_frames=cfg.num_frames,
        unet_config=unet_config,
        vae_config=vae_config,
        clip_config=clip_config,
        fstext_kwargs=overrides.get("fstext"),
        dtype=dtype,
        param_dtype=param_dtype,
        latent_size=latent_size or cfg.resolution // vae_scale,
        # bool or policy string; YAML `remat: save_attn`.  The reference's
        # `gradient_checkpointing` key (its train.py plumbs it into
        # torch.utils.checkpoint per block, unet_3d_blocks.py:369-401) maps
        # to block remat when the TPU-native `remat` knob is unset.
        remat=(_parse_remat(cfg.get("remat", False))
               or bool(cfg.get("gradient_checkpointing", False))),
    )
    if seq_parallel:
        from ..parallel.mesh import video_sharding

        models.unet = models.unet.clone(
            activation_sharding=video_sharding(mesh))
    tokenizer = build_tokenizer(cfg.tokenizer_path)

    root = cfg.pretrained_model_name_or_path
    if root and os.path.isdir(root):
        vae_path = _find_weights(
            os.path.join(root, "vae"),
            "diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin",
        )
        if vae_path:
            models.vae_params = convert_vae(load_torch_state_dict(vae_path),
                                            models.vae_params)
        clip_path = _find_weights(
            os.path.join(root, "text_encoder"),
            "model.safetensors", "pytorch_model.bin",
        )
        if clip_path:
            models.clip_params = convert_clip_text(load_torch_state_dict(clip_path),
                                                   models.clip_params)
        unet_path = _find_weights(
            os.path.join(root, "unet"),
            "diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin",
        )
        if unet_path:
            # 2D -> 3D inflation: temporal attentions keep fresh init
            models.unet_params, fresh = convert_seer_unet(
                load_torch_state_dict(unet_path), models.unet_params, strict=False
            )

    if cfg.fstext_init_ckpt and os.path.exists(cfg.fstext_init_ckpt):
        models.fstext_params = convert_fstext(
            load_torch_state_dict(cfg.fstext_init_ckpt), models.fstext_params
        )
    return models, tokenizer


def resolve_finetuned_dir(cfg: Config) -> Optional[str]:
    """Reference convention: ``<output_dir>/learned_sdunet-steps-<N>``
    selected by ``saved_global_step`` (``inference.py:119-128``), or an
    explicit ``learned_unet_ckpt`` path."""
    if cfg.learned_unet_ckpt:
        return cfg.learned_unet_ckpt
    if cfg.saved_global_step:
        path = os.path.join(
            cfg.output_dir, f"learned_sdunet-steps-{cfg.saved_global_step}"
        )
        if os.path.isdir(path):
            return path
    return None


def load_finetuned(models: SeerModels, ckpt_dir: str) -> SeerModels:
    """Load fine-tuned SeerUNet + FSText from a checkpoint directory.

    Accepts the reference torch layout (``pytorch_model.bin`` +
    ``pytorch_model_1.bin``; ``inference.py:119-128``) or a native Orbax
    checkpoint produced by our trainer.
    """
    torch_unet = _find_weights(ckpt_dir, "pytorch_model.bin",
                               "diffusion_pytorch_model.bin")
    if torch_unet:
        models.unet_params, _ = convert_seer_unet(
            load_torch_state_dict(torch_unet), models.unet_params, strict=True
        )
        torch_fstext = _find_weights(ckpt_dir, "pytorch_model_1.bin")
        if torch_fstext:
            models.fstext_params = convert_fstext(
                load_torch_state_dict(torch_fstext), models.fstext_params
            )
        return models

    import orbax.checkpoint as ocp

    params_dir = os.path.join(ckpt_dir, "params")
    restored = ocp.StandardCheckpointer().restore(
        params_dir, {"unet": models.unet_params, "fstext": models.fstext_params}
    )
    models.unet_params = restored["unet"]
    models.fstext_params = restored["fstext"]
    return models
