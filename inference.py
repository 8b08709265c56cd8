"""Batch dataset sampling driver (reference ``inference.py``).

Usage: ``python inference.py --config ./configs/inference.yaml``.
Iterates the validation split, DDIM-samples ``num_samples`` clips per batch
with CFG, and writes GIFs + PNG grids (generated | VAE-recon | GT rows).
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
from seervideoldm_tpu.utils.viz import save_visualization


def main() -> None:
    from seervideoldm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    initialize_distributed()
    cfg = parse_args("Seer TPU batch inference")
    rng = jax.random.PRNGKey(cfg.seed)
    k_model, k_sample = jax.random.split(rng)

    # opt-in multi-chip sampling: YAML `mesh_shape: {data: N}` shards every
    # batch over the local mesh (+ `seq: M` adds frame-axis sharding)
    mesh = create_mesh(cfg.mesh_shape) if cfg.mesh_shape else None
    models, tokenizer = load_models(cfg, k_model, mesh=mesh)
    ckpt_dir = resolve_finetuned_dir(cfg)
    if ckpt_dir:
        models = load_finetuned(models, ckpt_dir)
    pipe = SeerPipeline(models, mesh=mesh,
                        schedule=sampler_schedule_from(cfg),
                        donate_latents=bool(cfg.donate_latents),
                        vae_scale=float(cfg.vae_scale))

    dataset = build_dataset(
        cfg.dataset, cfg.dataset_path or cfg.get("data_dir"),
        cfg.resolution, cfg.num_frames, split="val",
    )
    loader = DataLoader(dataset, cfg.val_batch_size, shuffle=False,
                        num_workers=int(cfg.get("num_workers", cfg.dataloader_num_workers)), drop_last=True,
                        shard_index=jax.process_index(), num_shards=jax.process_count())

    def batches():
        # stream forever by re-creating the iterator — itertools.cycle
        # would cache every decoded batch in host RAM for the whole run
        while True:
            count = 0
            for item in loader:
                count += 1
                yield item
            if count == 0:
                # without this, an empty loader (dataset shard smaller than
                # val_batch_size with drop_last) spins here forever
                raise RuntimeError(
                    "validation loader yielded no batches — dataset shard "
                    f"smaller than val_batch_size={cfg.val_batch_size}?"
                )

    it = batches()
    try:
        from tqdm.auto import tqdm

        iters = tqdm(range(cfg.sample_iter), desc="sampling", dynamic_ncols=True)
    except Exception:
        iters = range(cfg.sample_iter)
    # host-side GIF/PNG encoding overlaps the NEXT clip's device sampling:
    # one writer thread, at most 2 batches in flight (bounds host RAM)
    from concurrent.futures import ThreadPoolExecutor

    writer_pool = ThreadPoolExecutor(max_workers=1)
    pending_writes: list = []
    for i_ter in iters:
        videos, prompts = next(it)
        video = jnp.asarray(videos)  # (b, f, h, w, 3) in [-1, 1]
        cond = video[:, : cfg.cond_frames]
        gt = video[:, cfg.cond_frames :]
        tok = tokenizer(prompts)
        tok_uc = tokenizer([""] * len(prompts))

        k_enc, k_it = jax.random.split(jax.random.fold_in(k_sample, i_ter))
        gt_latents = pipe.vae_encode_video(gt, k_enc)
        recon = pipe.vae_decode_video(gt_latents)

        for j in range(cfg.num_samples):
            samples = pipe.generate(
                cond, tok["input_ids"], tok["attention_mask"],
                tok_uc["input_ids"], tok_uc["attention_mask"],
                num_frames=cfg.num_frames, rng=jax.random.fold_in(k_it, j),
                ddim_steps=cfg.ddim_steps, guidance_scale=cfg.scale,
                **sampling_kwargs_from(cfg),
            )
            # gather every host's clips, write from rank 0 only (reference
            # utils/ddim_sampling_utils.py:60-63 concat_all_gather + rank gate)
            samples_g = gather_across_hosts(np.asarray(samples))
            recon_g = gather_across_hosts(np.asarray(recon))
            gt_g = gather_across_hosts(np.asarray((gt + 1.0) / 2.0))
            cond_g = gather_across_hosts(np.asarray((cond + 1.0) / 2.0))
            if is_main_process():
                # reference naming is i_ter*10+j (inference.py:203), which
                # silently overwrites earlier GIFs once num_samples > 10;
                # widen the stride only in that case so filenames stay
                # reference-identical for the common num_samples <= 10
                stride = max(10, cfg.num_samples)
                pending_writes.append(writer_pool.submit(
                    save_visualization, samples_g, recon_g, gt_g, cond_g,
                    cfg.output_dir, global_step=i_ter * stride + j,
                    num_sample_rows=cfg.n_rows,
                ))
                while len(pending_writes) > 2:
                    pending_writes.pop(0).result()  # propagate write errors
        print(f"iteration {i_ter + 1}/{cfg.sample_iter} done")
    for fut in pending_writes:
        fut.result()
    writer_pool.shutdown()


if __name__ == "__main__":
    main()
