"""Video + new prompt → SDEdit-style edited video (beyond reference).

Usage: ``python edit.py --config ./configs/inference_base.yaml
--video_path clip.gif --input_text_prompts "pour the water instead"
--edit_strength 0.6``.

Wires :meth:`SeerPipeline.edit` — the machinery the reference ships but
never exposes (``ddim_video.py:240-275`` ``stochastic_encode``/``decode``):
the input clip's future-frame latents are re-noised to ``edit_strength`` of
the DDIM trajectory and denoised under the new instruction, with the first
``cond_frames`` frames kept clean as conditioning exactly like generation.

``--video_path`` accepts an animated GIF or a directory of frame images
(sorted); the first ``num_frames`` frames are used.
"""
from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageSequence

from seervideoldm_tpu.config import parse_args, sampler_schedule_from
from seervideoldm_tpu.data.transforms import image_to_model_input
from seervideoldm_tpu.parallel.mesh import create_mesh
from seervideoldm_tpu.pipelines.loading import (
    load_finetuned,
    load_models,
    resolve_finetuned_dir,
)
from seervideoldm_tpu.pipelines.text_video import SeerPipeline
from seervideoldm_tpu.utils.viz import save_visualization_onegif


def load_video_frames(path: str, resolution: int, num_frames: int) -> np.ndarray:
    """Read ``num_frames`` frames from a GIF or a frame directory.

    Returns (num_frames, resolution, resolution, 3) in [-1, 1].
    """
    frames = []
    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*"))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp"))
        )
        for f in files[:num_frames]:
            with Image.open(f) as img:
                frames.append(image_to_model_input(img, resolution))
    else:
        with Image.open(path) as img:
            # Optimized GIFs store P-mode DELTA frames (only the changed
            # region) with disposal methods; a bare convert('RGB') per
            # iterator frame renders just that region and corrupts every
            # frame after the first.  Coalesce by compositing each frame
            # onto the running full-frame canvas before converting.
            canvas = None
            for frame in ImageSequence.Iterator(img):
                rgba = frame.convert("RGBA")
                if canvas is None:
                    canvas = rgba
                else:
                    canvas = canvas.copy()
                    canvas.paste(rgba, (0, 0), rgba)
                frames.append(
                    image_to_model_input(canvas.convert("RGB"), resolution))
                if len(frames) >= num_frames:
                    break
    if len(frames) < num_frames:
        raise SystemExit(
            f"error: {path} has only {len(frames)} frames; "
            f"num_frames={num_frames} required"
        )
    return np.stack(frames)


def main() -> None:
    from seervideoldm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_args(
        "Seer TPU SDEdit-style video editing",
        extra_flags={"video_path": None, "input_text_prompts": None,
                     "edit_strength": 0.6},
    )
    rng = jax.random.PRNGKey(cfg.seed)
    k_model, k_sample = jax.random.split(rng)

    if not cfg.video_path:
        raise SystemExit(
            "error: --video_path (or the video_path config key) is required"
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

    video = load_video_frames(cfg.video_path, cfg.resolution, cfg.num_frames)
    video = jnp.asarray(video)[None]  # (1, f, h, w, 3) in [-1, 1]

    tok = tokenizer([cfg.input_text_prompts or ""])
    tok_uc = tokenizer([""])

    samples = pipe.edit(
        video, tok["input_ids"], tok["attention_mask"],
        tok_uc["input_ids"], tok_uc["attention_mask"],
        cond_frames=cfg.cond_frames,
        edit_strength=float(cfg.edit_strength),
        rng=k_sample, ddim_steps=cfg.ddim_steps, guidance_scale=cfg.scale,
        prediction_type=cfg.prediction_type,
        timestep_spacing=cfg.timestep_spacing,
        guidance_rescale=cfg.guidance_rescale,
    )
    cond01 = np.asarray((video[:, : cfg.cond_frames] + 1.0) / 2.0)
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_visualization_onegif(np.asarray(samples), cond01, cfg.output_dir, 0)
    print(f"wrote {cfg.output_dir}/sample-0.gif")


if __name__ == "__main__":
    main()
