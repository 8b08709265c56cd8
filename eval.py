"""FVD/KVD and Inception Score evaluation over the validation split
(reference ``eval.py`` equivalent).

Usage: ``python eval.py --config ./configs/eval.yaml``.
Samples clips with DDIM+CFG, prepends the conditioning frames (reference
``eval.py:225``), accumulates buckets of ``MAX_FVD_BATCH`` clips, and
reports cumulative FVD/KVD via the JAX I3D (VideoGPT protocol) and/or IS
via the JAX C3D.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.config import (
    parse_args,
    sampler_schedule_from,
    sampling_kwargs_from,
)
from seervideoldm_tpu.data import DataLoader, build_dataset
from seervideoldm_tpu.parallel.distributed import (
    gather_across_hosts,
    initialize_distributed,
    is_main_process,
)
from seervideoldm_tpu.parallel.mesh import create_mesh
from seervideoldm_tpu.pipelines.loading import (
    load_finetuned,
    load_models,
    resolve_finetuned_dir,
)
from seervideoldm_tpu.pipelines.text_video import SeerPipeline


def to_uint8(video01: np.ndarray) -> np.ndarray:
    return (np.clip(video01, 0.0, 1.0) * 255).astype(np.uint8)


def main() -> None:
    from seervideoldm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    initialize_distributed()
    cfg = parse_args("Seer TPU FVD/KVD/IS evaluation")
    rng = jax.random.PRNGKey(cfg.seed)
    k_model, k_eval = jax.random.split(rng)

    mesh = create_mesh(cfg.mesh_shape) if cfg.mesh_shape else None
    models, tokenizer = load_models(cfg, k_model, mesh=mesh)
    ckpt_dir = resolve_finetuned_dir(cfg)
    if ckpt_dir:
        models = load_finetuned(models, ckpt_dir)
    pipe = SeerPipeline(models, mesh=mesh,
                        schedule=sampler_schedule_from(cfg),
                        donate_latents=bool(cfg.donate_latents),
                        vae_scale=float(cfg.vae_scale))

    fvd_eval = None
    if cfg.compute_fvd:
        from seervideoldm_tpu.evaluation.fvd import FVDEvaluator
        from seervideoldm_tpu.evaluation.i3d import InceptionI3d, load_i3d_params

        from seervideoldm_tpu.utils.inits import jit_init

        i3d = InceptionI3d()
        i3d_params = jit_init(
            lambda k: i3d.init(k, jnp.zeros((1, cfg.num_frames, 224, 224, 3))),
            jax.random.PRNGKey(0))
        if cfg.i3d_ckpt:
            i3d_params = load_i3d_params(cfg.i3d_ckpt, i3d_params)
        else:
            print("WARNING: no i3d_ckpt given — FVD uses random I3D weights")
        fvd_eval = FVDEvaluator(i3d, i3d_params)

    c3d_classify = None
    y_score_stack: list = []
    is_mean = is_std = float("nan")
    if cfg.compute_is:
        from seervideoldm_tpu.evaluation.c3d import C3D, load_c3d_params
        from seervideoldm_tpu.evaluation.inception_score import inception_score

        from seervideoldm_tpu.utils.inits import jit_init

        c3d = C3D()
        c3d_params = jit_init(
            lambda k: c3d.init(k, jnp.zeros((1, 16, 112, 112, 3))),
            jax.random.PRNGKey(0))
        if cfg.c3d_ckpt:
            mean_path = cfg.get("c3d_mean_path") or cfg.c3d_ckpt.replace(
                "conv3d_deepnetA_ucf.npz", "mean2.npz"
            )
            c3d_params = load_c3d_params(cfg.c3d_ckpt, mean_path, c3d_params)
        else:
            print("WARNING: no c3d_ckpt given — IS uses random C3D weights")
        # params as a runtime argument, NOT a closure constant (a captured
        # tree gets embedded into the lowered module — ~300 MB for C3D)
        c3d_apply = jax.jit(lambda p, v: c3d.apply({"params": p}, v))
        c3d_classify = lambda v: c3d_apply(c3d_params, jnp.asarray(v))  # noqa: E731

    clip_sim_fn = None
    clip_sims: list[np.ndarray] = []
    if cfg.get("compute_clip_sim"):
        # CLIPSIM (beyond reference): mean frame-vs-prompt CLIP cosine —
        # text faithfulness, which FVD/IS don't measure
        from seervideoldm_tpu.evaluation.clip_sim import (
            CLIPProjections, CLIPVisionConfig, CLIPVisionModel,
            make_clip_sim_fn,
        )
        from seervideoldm_tpu.models.clip_text import (
            CLIPTextConfig, CLIPTextModel,
        )
        from seervideoldm_tpu.utils.inits import jit_init

        # tiny-config overrides for CPU drives, same pattern as the main
        # models: model_overrides: {clip_sim: {vision: {...}, text: {...}}}
        ov = (cfg.get("model_overrides") or {}).get("clip_sim", {})
        vcfg = CLIPVisionConfig(**ov.get("vision", {}))
        tcfg = CLIPTextConfig(**ov.get("text", {}))
        vision = CLIPVisionModel(vcfg)
        text = CLIPTextModel(tcfg)
        proj = CLIPProjections(projection_dim=vcfg.projection_dim)
        vp = jit_init(lambda k: vision.init(
            k, jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))),
            jax.random.PRNGKey(0))
        tp = jit_init(lambda k: text.init(
            k, jnp.zeros((1, tcfg.max_position_embeddings), jnp.int32)),
            jax.random.PRNGKey(0))
        pp = proj.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, vcfg.hidden_size)),
                       jnp.zeros((1, tcfg.hidden_size)))["params"]
        if cfg.get("clip_sim_ckpt"):
            from seervideoldm_tpu.io.convert import (
                convert_clip_projections, convert_clip_text,
                convert_clip_vision, load_torch_state_dict,
            )

            sd = load_torch_state_dict(cfg.clip_sim_ckpt)
            vp = convert_clip_vision(sd, vp)
            tp = convert_clip_text(
                {k: v for k, v in sd.items()
                 if k.startswith("text_model.")}, tp)
            pp = convert_clip_projections(sd, pp)
        else:
            print("WARNING: no clip_sim_ckpt given — CLIPSIM uses random "
                  "CLIP weights")
        clip_sim_fn = make_clip_sim_fn(vision, text, proj, vp, tp, pp)

    dataset = build_dataset(
        cfg.dataset, cfg.dataset_path or cfg.get("data_dir"),
        cfg.resolution, cfg.num_frames, split="val",
    )
    loader = DataLoader(dataset, cfg.val_batch_size, shuffle=False,
                        num_workers=int(cfg.get("num_workers", cfg.dataloader_num_workers)), drop_last=True,
                        shard_index=jax.process_index(), num_shards=jax.process_count())

    pred_stack: list[np.ndarray] = []
    gt_stack: list[np.ndarray] = []
    fvd = kvd = float("nan")
    num_batches = len(loader)
    for i, (videos, prompts) in enumerate(loader):
        video = jnp.asarray(videos)
        cond = video[:, : cfg.cond_frames]
        tok = tokenizer(prompts)
        tok_uc = tokenizer([""] * len(prompts))
        samples = pipe.generate(
            cond, tok["input_ids"], tok["attention_mask"],
            tok_uc["input_ids"], tok_uc["attention_mask"],
            num_frames=cfg.num_frames, rng=jax.random.fold_in(k_eval, i),
            ddim_steps=cfg.ddim_steps, guidance_scale=cfg.scale,
            **sampling_kwargs_from(cfg),
        )
        if clip_sim_fn is not None:
            # score the GENERATED frames against the prompt (cond frames are
            # inputs, not predictions)
            sims = np.asarray(clip_sim_fn(
                jnp.asarray(samples), jnp.asarray(tok["input_ids"]),
                jnp.asarray(tok["attention_mask"])))
            clip_sims.append(gather_across_hosts(sims))
            if is_main_process():
                running = float(np.concatenate(clip_sims).mean())
                print(f"[{sum(len(s) for s in clip_sims)} clips] "
                      f"CLIPSIM {running:.4f}")
        # prepend cond frames to prediction (eval.py:225)
        pred = np.concatenate(
            [np.asarray((cond + 1.0) / 2.0), np.asarray(samples)], axis=1
        )
        gt = np.asarray((video + 1.0) / 2.0)
        # gather across hosts before bucketing (reference eval.py:226-231)
        pred_stack.append(gather_across_hosts(to_uint8(pred)))
        gt_stack.append(gather_across_hosts(to_uint8(gt)))
        # concatenate once before both branches — the reference's IS branch
        # reuses the pre-FVD-clear tensor (eval.py:235-247)
        pred_cat = np.concatenate(pred_stack)
        gt_cat = np.concatenate(gt_stack)
        n_acc = len(pred_cat)
        last = i == num_batches - 1

        # independent branches + final-batch flush regardless of bucket fill
        # (reference eval.py:236-247)
        if cfg.compute_fvd and (n_acc >= cfg.MAX_FVD_BATCH or last):
            metrics = fvd_eval.update(pred_cat, gt_cat)
            fvd, kvd = metrics["fvd"], metrics["kvd"]
            if is_main_process():
                print(f"[{metrics['n']} clips] FVD {fvd:.2f} KVD {kvd:.4f}")
            pred_stack, gt_stack = [], []
        if cfg.compute_is and (n_acc >= cfg.MAX_IS_BATCH or last):
            samples_np = pred_cat / 127.5 - 1.0
            if cfg.is_cast_frames and samples_np.shape[1] != 16:
                # opt-in: meet the C3D 16-frame contract on 12-frame recipes
                from seervideoldm_tpu.data.transforms import resample_frames

                samples_np = np.stack(
                    [resample_frames(clip, 16) for clip in samples_np])
            is_mean, is_std, y_score_stack = inception_score(
                c3d_classify, samples_np.astype(np.float32), y_score_stack
            )
            if is_main_process():
                print(f"IS {is_mean:.2f} +- {is_std:.2f}")
            pred_stack, gt_stack = [], []

    if is_main_process():
        if cfg.compute_fvd:
            print(f"Final FVD {fvd:.2f}, KVD {kvd:.4f}")
        if cfg.compute_is:
            print(f"Final IS {is_mean:.2f} +- {is_std:.2f}")
        if clip_sim_fn is not None and clip_sims:
            print(f"Final CLIPSIM {float(np.concatenate(clip_sims).mean()):.4f}")


if __name__ == "__main__":
    main()
