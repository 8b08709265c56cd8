"""Real-weights FVD-parity runbook: the ONE command chain a weights-holder
runs to discharge the north-star check (matched FVD vs the released PyTorch
checkpoints, BASELINE.md) that is blocked in this zero-egress sandbox.

Stages (run individually or chained with ``all``):

  convert   load + convert SD-1.5 (HF layout) and the released Seer
            checkpoint (``pytorch_model{,_1}.bin``,
            reference ``inference.py:119-128``) through the production
            converters; strict — any unmapped/mismatched key fails here.
  golden    fixed-seed DDIM sample with the converted weights; writes
            ``golden_latents.npz`` (x_T, tokens, final latents) and prints
            the companion torch snippet that produces ``torch_latents.npz``
            from the SAME x_T with the reference repo.  With
            ``--torch_latents`` compares the two trajectories and
            pass/fails on ``--latent_tol`` (default 5e-2 max-abs — bf16
            UNet accumulation differences; run with
            ``mixed_precision: 'no'`` in the config for a tighter bound).
  fvd       runs ``eval.py`` with the given config (FVD/KVD/IS on the
            real val set) and echoes the final numbers for comparison
            against the paper's (arXiv 2303.14897).

Typical full run (paths are the weights-holder's local copies):

  python tools/fvd_parity_runbook.py all \\
      --config configs/eval.yaml \\
      --set pretrained_model_name_or_path=/ckpts/stable-diffusion-v1-5 \\
      --set learned_unet_ckpt=/ckpts/seer-sthv2 \\
      --set data_dir=/data/sthv2 \\
      --out /tmp/seer_parity

``--dry-run`` exercises the identical code path end-to-end on a tiny
random-weight model + synthetic data (no external files) — the CI proof
that the chain executes; tests/test_parity_runbook.py drives it.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY_OVERRIDES = {
    "unet": dict(block_out_channels=[8, 16], layers_per_block=1,
                 norm_num_groups=4, cross_attention_dim=8,
                 attention_head_dim=2),
    "vae": dict(block_out_channels=[8, 8], layers_per_block=1,
                norm_num_groups=4),
    "clip": dict(hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                 num_attention_heads=2),
    "fstext": dict(n_heads=2, num_layers=1),
}

TORCH_SNIPPET = """\
# --- companion snippet: run in the REFERENCE repo (GPU) to produce the
# --- torch-side latents from the SAME x_T / prompt; then re-run this stage
# --- with --torch_latents torch_latents.npz
import numpy as np, torch
d = np.load("{npz}")
# build the reference DDIMSampler exactly like inference.py, then:
#   x_T    = torch.from_numpy(d["x_T"]).permute(0, 4, 1, 2, 3).cuda()
#   (reference latent layout is (b, c, f, h, w); ours is (b, f, h, w, c))
#   prompt = str(d["prompt"]); seed is irrelevant given fixed x_T
#   samples, _ = sampler.sample(S={steps}, ..., x_T=x_T, eta=0.0,
#                               unconditional_guidance_scale={scale})
# np.savez("torch_latents.npz",
#          latents=samples.permute(0, 2, 3, 4, 1).cpu().numpy())
"""


def _load_cfg(args):
    from seervideoldm_tpu.config import load_config, validate

    cfg = load_config(args.config, overrides=list(args.set or []))
    if args.dry_run:
        cfg.model_overrides = TINY_OVERRIDES
        cfg.resolution = 16
        cfg.num_frames = 4
        cfg.cond_frames = 1
        cfg.ddim_steps = 4
        cfg.mixed_precision = "no"
        cfg.pretrained_model_name_or_path = None
        cfg.learned_unet_ckpt = None
        cfg.saved_global_step = 0
    return validate(cfg)


def stage_convert(args) -> dict:
    """Prove both checkpoints convert cleanly (strict where the reference is
    strict); report per-component key coverage."""
    import jax

    from seervideoldm_tpu.pipelines.loading import (
        load_finetuned, load_models, resolve_finetuned_dir)

    cfg = _load_cfg(args)
    report = {"stage": "convert", "sd15": None, "seer": None}
    models, _ = load_models(cfg, jax.random.PRNGKey(cfg.seed))
    if cfg.pretrained_model_name_or_path:
        report["sd15"] = {"root": cfg.pretrained_model_name_or_path,
                          "loaded": True}
    ckpt = resolve_finetuned_dir(cfg)
    if ckpt:
        load_finetuned(models, ckpt)  # strict=True inside for torch layout
        report["seer"] = {"ckpt": ckpt, "loaded": True}
    if not args.dry_run and not (cfg.pretrained_model_name_or_path or ckpt):
        raise SystemExit(
            "convert: no weights given — set pretrained_model_name_or_path "
            "and/or learned_unet_ckpt/saved_global_step")
    print(json.dumps(report))
    return report


def stage_golden(args) -> dict:
    """Fixed-seed sample → golden_latents.npz (+ optional torch compare)."""
    import jax
    import jax.numpy as jnp

    from seervideoldm_tpu.config import sampler_schedule_from
    from seervideoldm_tpu.pipelines.loading import (
        load_finetuned, load_models, resolve_finetuned_dir)
    from seervideoldm_tpu.pipelines.text_video import SeerPipeline

    cfg = _load_cfg(args)
    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)
    k_model, k_xt, k_img = jax.random.split(rng, 3)
    models, tokenizer = load_models(cfg, k_model)
    ckpt = resolve_finetuned_dir(cfg)
    if ckpt:
        models = load_finetuned(models, ckpt)
    pipe = SeerPipeline(models, schedule=sampler_schedule_from(cfg))

    prompt = args.prompt
    cond = jax.random.uniform(  # deterministic stand-in conditioning frames
        k_img, (1, cfg.cond_frames, cfg.resolution, cfg.resolution, 3),
        minval=-1.0, maxval=1.0)
    # (a weights-holder may instead load real conditioning frames and write
    # them into golden_latents.npz — the torch side reads cond from the npz)
    x0_emb = pipe.vae_encode_video(pipe._shard(cond), k_img)
    tok = tokenizer([prompt])
    tok_uc = tokenizer([""])
    clip_emb = pipe.encode_text(tok["input_ids"], tok["attention_mask"])
    context = pipe.fstext(clip_emb)
    uncond_emb = pipe.encode_text(tok_uc["input_ids"], tok_uc["attention_mask"])
    uncond_context = jnp.broadcast_to(
        uncond_emb[:, None], (1, context.shape[1], *uncond_emb.shape[1:]))
    f2 = cfg.num_frames - cfg.cond_frames
    x_T = jax.random.normal(k_xt, (*x0_emb.shape[:1], f2, *x0_emb.shape[2:]),
                            jnp.float32)
    # fetch BEFORE sampling: the pipeline may donate x_T into the DDIM scan
    x_T_np = np.asarray(x_T)
    latents = pipe.sample_latents(
        x_T, x0_emb, context, uncond_context,
        ddim_steps=cfg.ddim_steps, guidance_scale=cfg.scale,
        prediction_type=cfg.prediction_type,
        timestep_spacing=cfg.timestep_spacing,
        guidance_rescale=cfg.guidance_rescale,
    )
    npz = os.path.join(args.out, "golden_latents.npz")
    np.savez(npz, x_T=x_T_np, cond=np.asarray(cond),
             prompt=np.asarray(prompt),
             latents=np.asarray(latents, dtype=np.float32))
    report = {"stage": "golden", "npz": npz,
              "latents_shape": list(np.asarray(latents).shape)}
    if args.torch_latents:
        want = np.load(args.torch_latents)["latents"]
        got = np.asarray(latents, dtype=np.float32)
        maxdiff = float(np.abs(got - want).max())
        rmse = float(np.sqrt(np.mean((got - want) ** 2)))
        report.update(maxdiff=maxdiff, rmse=rmse, tol=args.latent_tol,
                      parity=bool(maxdiff <= args.latent_tol))
        if not report["parity"]:
            print(json.dumps(report))
            raise SystemExit(f"golden: latent maxdiff {maxdiff} > tol "
                             f"{args.latent_tol}")
    else:
        print(TORCH_SNIPPET.format(npz=npz, steps=cfg.ddim_steps,
                                   scale=cfg.scale))
    print(json.dumps(report))
    return report


def stage_fvd(args) -> dict:
    """Run eval.py with this config; parse the final metric lines."""
    cmd = [sys.executable, os.path.join(REPO, "eval.py"),
           "--config", args.config]
    for kv in args.set or []:
        cmd += ["--set", kv]
    if args.dry_run:
        # num_frames >= 9: the I3D temporal stack (three stride-2 halvings
        # then a VALID (2,7,7) avg-pool) produces an EMPTY tensor below 9
        # frames and the FVD degenerates to NaN
        cmd += ["--set", f"model_overrides={json.dumps(TINY_OVERRIDES)}",
                "--set", "resolution=16", "--set", "num_frames=10",
                "--set", "cond_frames=1", "--set", "ddim_steps=2",
                "--set", "mixed_precision=no", "--set", "compute_fvd=true",
                "--set", "MAX_FVD_BATCH=4", "--set", "compute_is=false",
                "--set", "saved_global_step=0",
                "--set", "pretrained_model_name_or_path=null",
                "--set", "learned_unet_ckpt=null"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        raise SystemExit(f"fvd: eval.py failed ({proc.returncode})")
    import re

    m = re.search(r"Final FVD ([^,\s]+)", proc.stdout)
    report = {"stage": "fvd", "fvd": float(m.group(1)) if m else None}
    print(json.dumps(report))
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("stage", choices=["convert", "golden", "fvd", "all"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--set", action="append", metavar="KEY=VAL",
                    help="config override (same syntax as the entry points)")
    ap.add_argument("--out", default="./parity_out")
    ap.add_argument("--prompt", default="Pouring water into a glass")
    ap.add_argument("--torch_latents", default=None,
                    help="torch-side latents .npz to compare against")
    ap.add_argument("--latent_tol", type=float, default=5e-2)
    ap.add_argument("--dry-run", action="store_true",
                    help="tiny random-weight model + synthetic shapes")
    args = ap.parse_args()
    stages = {"convert": [stage_convert], "golden": [stage_golden],
              "fvd": [stage_fvd],
              "all": [stage_convert, stage_golden, stage_fvd]}[args.stage]
    for s in stages:
        s(args)


if __name__ == "__main__":
    main()
