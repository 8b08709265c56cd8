"""Single image + prompt → predicted video clip (reference ``inference_img.py``).

Usage: ``python inference_img.py --config ./configs/inference_base.yaml
--image_path img.png --input_text_prompts "push the cup left"``.
The image is replicated to ``cond_frames`` (reference
``inference_img.py:164-166``), VAE-encoded, and the DDIM sampler predicts
the remaining frames with classifier-free guidance.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from seervideoldm_tpu.config import (
    parse_args,
    sampler_schedule_from,
    sampling_kwargs_from,
)
from seervideoldm_tpu.data.transforms import image_to_model_input
from seervideoldm_tpu.parallel.mesh import create_mesh
from seervideoldm_tpu.pipelines.loading import (
    load_finetuned,
    load_models,
    resolve_finetuned_dir,
)
from seervideoldm_tpu.pipelines.text_video import SeerPipeline
from seervideoldm_tpu.utils.viz import save_visualization_onegif


def main() -> None:
    from seervideoldm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_args(
        "Seer TPU single-image inference",
        extra_flags={"image_path": None, "input_text_prompts": None},
    )
    rng = jax.random.PRNGKey(cfg.seed)
    k_model, k_sample = jax.random.split(rng)

    if not cfg.image_path:
        raise SystemExit(
            "error: --image_path (or the image_path config key) is required"
        )

    mesh = create_mesh(cfg.mesh_shape) if cfg.mesh_shape else None
    models, tokenizer = load_models(cfg, k_model, mesh=mesh)
    ckpt_dir = resolve_finetuned_dir(cfg)
    if ckpt_dir:
        models = load_finetuned(models, ckpt_dir)
    pipe = SeerPipeline(models, mesh=mesh,
                        schedule=sampler_schedule_from(cfg),
                        donate_latents=bool(cfg.donate_latents),
                        vae_scale=float(cfg.vae_scale))

    with Image.open(cfg.image_path) as img:
        frame = image_to_model_input(img, cfg.resolution)
    cond = jnp.asarray(frame)[None, None].repeat(cfg.cond_frames, axis=1)

    prompt = cfg.input_text_prompts or ""
    tok_uc = tokenizer([""])

    sample_kw = dict(
        num_frames=cfg.num_frames, rng=k_sample,
        ddim_steps=cfg.ddim_steps, guidance_scale=cfg.scale,
        **sampling_kwargs_from(cfg),
    )
    if cfg.total_frames:
        # autoregressive rollout (beyond reference): "|"-separated prompt
        # segments are chained per-chunk instructions
        prompts_tok = [tokenizer([p.strip()]) for p in prompt.split("|")]
        samples = pipe.generate_rollout(
            cond, prompts_tok, tok_uc["input_ids"], tok_uc["attention_mask"],
            total_frames=int(cfg.total_frames), **sample_kw,
        )
    else:
        tok = tokenizer([prompt])
        samples = pipe.generate(
            cond, tok["input_ids"], tok["attention_mask"],
            tok_uc["input_ids"], tok_uc["attention_mask"], **sample_kw,
        )
    cond01 = np.asarray((cond + 1.0) / 2.0)
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_visualization_onegif(np.asarray(samples), cond01, cfg.output_dir, 0)
    print(f"wrote {cfg.output_dir}/sample-0.gif")


if __name__ == "__main__":
    main()
