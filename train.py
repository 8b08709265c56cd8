"""Fine-tuning driver (reference ``train.py`` equivalent).

Usage: ``python train.py --config ./configs/train.yaml`` — same YAML keys as
the reference; accelerate launch is replaced by JAX's mesh-based data
parallelism (one process drives all local chips; multi-host via
``jax.distributed``).

Recipe parity: AdamW over temporal-attentions + FSText only, lr scaled by
accum × batch × hosts, cosine warmup, grad clip 0.3, ε-MSE on VAE latents
with the clean cond-frame latents concatenated in front (reference
``train.py:319-387``).  Checkpoints: ``learned_sdunet-steps-<N>/`` (Orbax,
async) + tensorboard logs + loss/lr PNGs.
"""
from __future__ import annotations

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.config import parse_args
from seervideoldm_tpu.data import DataLoader, build_dataset
from seervideoldm_tpu.io.checkpoint import CheckpointManager
from seervideoldm_tpu.parallel.distributed import initialize_distributed, is_main_process
from seervideoldm_tpu.parallel.mesh import (
    create_mesh,
    global_batch_array,
    replicate_global,
)
from seervideoldm_tpu.pipelines.loading import load_models
from seervideoldm_tpu.training.meters import RunningAverageMeter
from seervideoldm_tpu.training.optim import build_optimizer
from seervideoldm_tpu.training.optim import trainable_mask
from seervideoldm_tpu.training.trainer import (
    TrainState,
    combine_params,
    make_train_step,
    partition_params,
    prepare_batch_fn,
)


def _plot_series(series, output_dir: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for steps, vals, name in series:
            if not vals:
                continue
            plt.figure()
            plt.plot(steps, vals)
            plt.xlabel("step")
            plt.ylabel(name)
            plt.savefig(os.path.join(output_dir, f"{name}.png"))
            plt.close()
    except Exception as exc:  # plotting must never kill training
        print(f"plot_graphs failed: {exc}")


def _meter_snapshot(losses: RunningAverageMeter, lrs: RunningAverageMeter):
    # copy the series on the caller's thread — the train loop keeps
    # appending to the meters while the worker renders
    return [(list(m.steps), list(m.vals), name)
            for m, name in ((losses, "loss"), (lrs, "lr"))]


def plot_graphs(losses: RunningAverageMeter, lrs: RunningAverageMeter,
                output_dir: str) -> None:
    """Loss/LR PNGs (reference ``train.py:415-435``), synchronous."""
    _plot_series(_meter_snapshot(losses, lrs), output_dir)


_plot_busy = threading.Lock()


def plot_graphs_async(losses: RunningAverageMeter, lrs: RunningAverageMeter,
                      output_dir: str) -> None:
    """Periodic plotting off the train thread.  The reference forks
    ``plot_graphs`` into a separate PROCESS (``train.py:400-406``) so a
    slow or wedged matplotlib never stalls the step; a daemon thread gives
    the same non-blocking property without the fork cost (Agg is
    render-only, no GUI main-thread requirement).  At most one job runs at
    a time — if the previous render is still going, this request is
    dropped (the next log tick plots fresher data anyway)."""
    snap = _meter_snapshot(losses, lrs)
    if not _plot_busy.acquire(blocking=False):
        return

    def work() -> None:
        try:
            _plot_series(snap, output_dir)
        finally:
            _plot_busy.release()

    threading.Thread(target=work, daemon=True, name="plot_graphs").start()


def main() -> None:
    from seervideoldm_tpu.utils.cache import enable_compilation_cache, set_compile_effort

    enable_compilation_cache()
    initialize_distributed()
    cfg = parse_args("Seer TPU fine-tuning")
    # training backward graphs are the compile-time hot spot; default fast
    set_compile_effort(str(cfg.get("compile_effort", "fast")))
    os.makedirs(cfg.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)

    mesh = create_mesh(cfg.mesh_shape)
    num_hosts = jax.process_count()
    if num_hosts > 1 and mesh.devices.size != jax.device_count():
        # a per-host submesh is fine for sampling/eval (rank-0 gathers), but
        # training on one would silently skip cross-host gradient sync
        raise ValueError(
            f"multi-host training needs a GLOBAL mesh over all "
            f"{jax.device_count()} devices; mesh_shape={cfg.mesh_shape} "
            f"covers only {mesh.devices.size}"
        )

    if cfg.scale_lr:
        cfg.learning_rate = (
            cfg.learning_rate * cfg.gradient_accumulation_steps
            * cfg.train_batch_size * num_hosts
        )

    models, tokenizer = load_models(cfg, rng, mesh=mesh)
    params = {"unet": models.unet_params, "fstext": models.fstext_params}
    lora_rank = int(cfg.lora_rank or 0)
    if lora_rank:
        # LoRA (beyond reference, training/lora.py): the WHOLE UNet freezes;
        # trainable = rank-r adapters on the attention projections + FSText.
        # Meaningful when the base is an already-fine-tuned Seer checkpoint
        # (fresh temporal attentions have nothing for a low-rank delta to
        # adapt) — warn rather than reject, tiny-scale smoke runs are legit.
        from seervideoldm_tpu.training.lora import init_lora, lora_scale, param_count

        if not (cfg.get("learned_unet_ckpt") or cfg.get("saved_global_step")):
            print("lora: base UNet has no fine-tuned temporal attentions — "
                  "LoRA adapts whatever the base weights are")
        import jax.tree_util as jtu

        fstext_only = jtu.tree_map_with_path(
            lambda p, _: (p[0].key if hasattr(p[0], "key") else str(p[0]))
            == "fstext", params)
        trainable, frozen = partition_params(params, fstext_only)
        adapters = init_lora(frozen["unet"], lora_rank,
                             jax.random.fold_in(rng, 7),
                             scope=cfg.lora_targets)
        trainable = {**trainable, "lora": adapters}
        lscale = lora_scale(lora_rank, cfg.lora_alpha)
        print(f"lora: rank {lora_rank} scope {cfg.lora_targets} — "
              f"{param_count(adapters) / 1e6:.2f}M adapter params")
    else:
        # gradients + Adam state only for the trainable scope: 'reference' =
        # temporal attentions + FSText (the reference's partial freeze),
        # 'all' = every UNet+FSText weight (from-scratch training)
        trainable, frozen = partition_params(
            params, trainable_mask(params, cfg.trainable_scope))
        lscale = 0.0
    # drop the original full fp32 trees: the partition shares the trainable
    # buffers, but once frozen is cast to bf16 below the fp32 frozen halves
    # (~3.9 GB at flagship scale) would otherwise stay alive through these
    # references for the whole run and OOM the 16 GB chip
    del params
    models.unet_params = None
    models.fstext_params = None
    tx, schedule_fn = build_optimizer(
        trainable,
        cfg.learning_rate,
        scheduler=cfg.lr_scheduler,
        warmup_steps=cfg.lr_warmup_steps,
        total_steps=cfg.max_train_steps,
        betas=(cfg.adam_beta1, cfg.adam_beta2),
        weight_decay=cfg.adam_weight_decay,
        eps=cfg.adam_epsilon,
        max_grad_norm=cfg.max_grad_norm,
        accumulation_steps=cfg.gradient_accumulation_steps,
        partitioned=True,
        use_8bit=bool(cfg.use_8bit_adam),
    )
    use_ema = float(cfg.ema_decay) > 0.0
    data_multi = mesh.shape.get("data", 1) > 1
    use_fsdp = bool(cfg.get("fsdp")) and data_multi
    use_zero1 = bool(cfg.zero1) and data_multi and not use_fsdp
    if bool(cfg.get("fsdp")) and not data_multi:
        print("fsdp: ignored — mesh has no multi-device 'data' axis")
    if bool(cfg.zero1) and not data_multi:
        print("zero1: ignored — mesh has no multi-device 'data' axis")
    if bool(cfg.zero1) and use_fsdp:
        print("zero1: subsumed by fsdp (ZeRO-3 already shards the moments)")

    def place_state(s):
        """Put a host-local TrainState on the mesh: replicated, ZeRO-1
        (sharded optimizer/EMA buffers), or FSDP/ZeRO-3 (params sharded
        too) — both beyond reference."""
        if not (use_zero1 or use_fsdp):
            return replicate_global(mesh, s), None
        from seervideoldm_tpu.parallel.mesh import shard_global
        from seervideoldm_tpu.parallel.sharding import (
            fsdp_state_sharding, zero1_state_sharding,
        )

        sh = (fsdp_state_sharding(s, mesh) if use_fsdp
              else zero1_state_sharding(s, mesh))
        return shard_global(mesh, s, sh), sh

    state, state_sharding = place_state(TrainState.create(trainable, tx,
                                                          ema=use_ema))
    if cfg.get("frozen_params_bf16"):
        # halve frozen-weight memory (quality impact negligible: frozen
        # weights are used in bf16 compute anyway)
        frozen = jax.tree.map(lambda p: p.astype(jnp.bfloat16), frozen)
    # frozen VAE/CLIP weights feed the jitted prepare(): they must be global
    # arrays too, or multi-process jit rejects the mix of global batch
    # inputs and process-local params.  Under FSDP they shard over 'data'
    # like everything else (the frozen UNet half is the largest weight
    # block in the whole run); GSPMD gathers per-layer at use.
    def place_frozen(tree):
        if not use_fsdp:
            return replicate_global(mesh, tree)
        from seervideoldm_tpu.parallel.mesh import shard_global
        from seervideoldm_tpu.parallel.sharding import fsdp_param_sharding

        return shard_global(mesh, tree, fsdp_param_sharding(tree, mesh))

    frozen = place_frozen(frozen)
    models.clip_params = place_frozen(models.clip_params)
    models.vae_params = place_frozen(models.vae_params)
    # training noise schedule: SD-1.5 scaled_linear (reference train.py:234),
    # zero-terminal-SNR-rescaled when the recipe asks for it (requires
    # v-prediction; enforced by config.validate)
    from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule

    train_step = make_train_step(
        models, tx, cond_frames=cfg.cond_frames,
        schedule=DiffusionSchedule.sd15_train_schedule(
            rescale_zero_snr=bool(cfg.rescale_zero_snr)
        ),
        text_loss=bool(cfg.text_loss), frozen_params=frozen,
        ema_decay=float(cfg.ema_decay),
        prediction_type=cfg.prediction_type,
        state_sharding=state_sharding,
        snr_gamma=float(cfg.snr_gamma),
        lora_scale=lscale,
    )
    prepare = prepare_batch_fn(
        models, sample_posterior=bool(cfg.vae_sample_posterior),
        vae_scale=float(cfg.vae_scale))

    dataset = build_dataset(
        cfg.dataset, cfg.dataset_path or cfg.get("data_dir"),
        cfg.resolution, cfg.num_frames, split="train",
        horizontal_flip=bool(cfg.get("horizontal_flip", False)),
        force_num_frames=bool(cfg.get("force_num_frames", True)),
    )
    loader = DataLoader(
        dataset, cfg.train_batch_size, shuffle=True, seed=cfg.seed,
        num_workers=int(cfg.get("num_workers", cfg.dataloader_num_workers)),
        shard_index=jax.process_index(), num_shards=num_hosts,
    )

    ckpt = CheckpointManager(
        cfg.output_dir,
        max_to_keep=int(cfg.max_to_keep) if cfg.get("max_to_keep") else None)
    losses_train = RunningAverageMeter(0.99)
    lr_meter = RunningAverageMeter(0.99)
    global_step = 0
    start_epoch = 0
    meta_loaded = False
    if cfg.saved_global_step:
        global_step = int(cfg.saved_global_step)
        try:
            state = ckpt.restore(global_step, state)
        except Exception as orig:
            # ema_decay toggled across the resume: the saved tree structure
            # differs from the template (ema_params present vs None). Retry
            # with the other template and migrate instead of surfacing an
            # opaque Orbax structure mismatch.
            del state  # free the failed template's opt/EMA buffers FIRST —
            # at flagship scale template + alternate + restored tree live
            # simultaneously otherwise, and the resume would OOM the chip
            try:
                # same placement as the main template (ZeRO-1 shardings when
                # enabled — restored moments land sharded; the migrated EMA
                # below starts replicated and is re-sharded by the step's
                # output constraint, costing one extra compile in this
                # already-rare toggled-EMA resume)
                alt, _ = place_state(
                    TrainState.create(trainable, tx, ema=not use_ema))
                restored = ckpt.restore(global_step, alt)
                del alt
            except Exception:
                raise orig  # not an EMA-shape mismatch — surface the original
            if use_ema:
                print("resume: checkpoint has no EMA state — seeding the "
                      "EMA from the restored weights")
                state = TrainState(
                    step=restored.step, params=restored.params,
                    opt_state=restored.opt_state,
                    ema_params=jax.tree.map(jnp.copy, restored.params))
            else:
                print("resume: dropping the checkpoint's EMA state "
                      "(ema_decay: 0)")
                state = TrainState(
                    step=restored.step, params=restored.params,
                    opt_state=restored.opt_state, ema_params=None)
        meta_path = os.path.join(cfg.output_dir, f"learned_sdunet-steps-{global_step}.json")
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                meta = json.load(f)
            meta_loaded = True
            start_epoch = meta.get("epoch", 0)
            losses_train.load_ckpt(meta["losses_train"])
            lr_meter.load_ckpt(meta["lr_meter"])

    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(cfg.output_dir, cfg.logging_dir))
    except Exception:
        writer = None

    # Disjoint PRNG streams: VAE posterior sampling in prepare() and the
    # diffusion noise target in train_step() must never share a key — with a
    # shared stream the ε target equals the posterior noise embedded in the
    # input latents, leaking the regression target into the model input.
    prep_rng, step_rng = jax.random.split(jax.random.PRNGKey(cfg.seed + 1))
    step_rng_np = np.asarray(step_rng)  # host copy; fold_in happens in-jit
    prep_rng_np = np.asarray(prep_rng)
    # bf16 on the host wire: when the models compute in bf16 anyway, casting
    # the video batch before device_put halves the host->device bytes (the
    # dominant non-compute cost per micro-step on slow interconnects), and
    # bf16's 0.4% relative step equals the uint8 quantization the decoded
    # frames already carry.  Full-precision runs keep the fp32 wire.
    if models.unet.dtype == jnp.bfloat16 and cfg.bf16_wire:
        import ml_dtypes

        wire_dtype = ml_dtypes.bfloat16
    else:
        wire_dtype = None
    step_time = time.time()
    compiled_step = None
    # reference tqdm over optimizer steps (train.py:313); rank-0 only
    progress = None
    try:
        from tqdm.auto import tqdm

        if is_main_process():
            progress = tqdm(total=cfg.max_train_steps, initial=global_step,
                            desc="steps", dynamic_ncols=True)
    except Exception:
        pass
    pending_losses: list = []
    window_losses: list = []  # per-micro-step losses in the current accum window
    accum = max(1, cfg.gradient_accumulation_steps)
    micro_step = global_step * accum
    # mid-epoch resume: skip the batches already consumed this epoch so the
    # data order continues exactly as an uninterrupted run (the reference
    # replays the epoch from the start; this is a deliberate fix).  Only
    # valid when the sidecar meta (start_epoch) loaded AND the epoch length
    # still matches — otherwise the skip would silently land in the wrong
    # epoch position, which is worse than replaying.
    steps_per_epoch = max(1, len(loader))
    resume_skip = max(0, micro_step - start_epoch * steps_per_epoch)
    if resume_skip and not meta_loaded:
        print("resume: epoch meta missing — replaying the epoch from the start")
        resume_skip = 0
    elif resume_skip == steps_per_epoch:
        # checkpoint landed exactly on an epoch boundary: that epoch is fully
        # consumed — continue with the next one instead of replaying it
        start_epoch += 1
        resume_skip = 0
    elif resume_skip > steps_per_epoch:
        print("resume: dataset size changed — replaying the epoch from the start")
        resume_skip = 0
    epoch = start_epoch  # final-save metadata even if the loop body never runs
    for epoch in range(start_epoch, cfg.num_train_epochs):
        loader.set_epoch(epoch, skip_batches=resume_skip if epoch == start_epoch else 0)
        for videos, prompts in loader:
            tok = tokenizer(prompts)
            # every process feeds its own loader shard; the result is ONE
            # global batch array sharded over the data axis (the reference's
            # per-rank DataLoader + DDP, train.py:247-249,265-267)
            if wire_dtype is not None:
                videos = videos.astype(wire_dtype)
            videos = global_batch_array(mesh, videos)
            ids = global_batch_array(mesh, tok["input_ids"])
            mask = global_batch_array(mesh, tok["attention_mask"])
            # keys go in as host numpy (identical on every process): a
            # committed process-local device array cannot mix with global
            # inputs under multi-process jit.  The per-micro-step fold_in
            # happens INSIDE the jit (fold_step): host-side fold_in was a
            # full accelerator round trip per micro-step.
            batch = prepare(videos, ids, mask, prep_rng_np,
                            cond_frames=cfg.cond_frames,
                            fold_step=np.int32(micro_step))
            if compiled_step is None:
                # multi-process: compile on every rank FIRST, barrier, then
                # execute — the first collective's rendezvous window is much
                # shorter than trace/compile skew between ranks
                compiled_step = (
                    train_step.compile_aligned(state, batch, step_rng_np)
                    if jax.process_count() > 1 else train_step
                )
            state, metrics = compiled_step(state, batch, step_rng_np)
            micro_step += 1
            window_losses.append(metrics["loss"])
            if micro_step % accum != 0:
                continue
            # global_step counts optimizer (sync) steps, reference parity
            global_step += 1
            if progress is not None:
                progress.update(1)
            # mean loss over the whole accumulation window (all micro steps),
            # not just the sync micro-step's loss
            window_mean = (
                window_losses[0] if len(window_losses) == 1
                else jnp.mean(jnp.stack(window_losses))
            )
            window_losses = []
            pending_losses.append((global_step, window_mean,
                                   metrics["grad_norm"]))
            if len(pending_losses) >= 10 or global_step % cfg.save_steps == 0:
                # fetch device scalars in one batch (no per-step host sync)
                for gs, dev_loss, dev_gnorm in pending_losses:
                    loss = float(dev_loss)
                    lr = float(schedule_fn(gs))
                    losses_train.update(loss, gs)
                    lr_meter.update(lr, gs)
                    if writer is not None:
                        writer.add_scalar("loss", loss, gs)
                        writer.add_scalar("lr", lr, gs)
                        writer.add_scalar("grad_norm", float(dev_gnorm), gs)
                pending_losses = []
            if global_step % 50 == 0:
                loss = losses_train.val if losses_train.val is not None else float("nan")
                lr = float(schedule_fn(global_step))
                dt = (time.time() - step_time) / 50
                step_time = time.time()
                print(f"step {global_step} loss {loss:.4f} lr {lr:.2e} "
                      f"{dt * 1000:.0f} ms/step")
            if global_step % cfg.save_steps == 0:
                # the Orbax save is COLLECTIVE: every process participates
                # (each writes the shards it owns; Orbax coordinates the
                # commit).  Gating it on rank 0 would deadlock a
                # multi-controller save of global arrays.  Only the JSON
                # sidecar and plots are host-side rank-0 I/O.
                from seervideoldm_tpu.parallel.distributed import barrier_sync

                barrier_sync(f"save_{global_step}")
                # params-only sub-checkpoint is the inference artifact: with
                # EMA enabled it carries the averaged weights (standard
                # diffusion practice); the raw weights stay in `state`.
                # Under LoRA the adapter delta is baked into the UNet kernels
                # here — the artifact loads anywhere a full fine-tune would.
                from seervideoldm_tpu.training.lora import inference_params

                full = inference_params(
                    state.ema_params if use_ema else state.params, frozen,
                    lscale)
                ckpt.save(global_step, state,
                          params={"unet": full["unet"], "fstext": full["fstext"]})
                if is_main_process():
                    import json

                    with open(os.path.join(
                            cfg.output_dir,
                            f"learned_sdunet-steps-{global_step}.json"), "w") as f:
                        json.dump({"epoch": epoch, "global_step": global_step,
                                   "lr_meter": lr_meter.ckpt(),
                                   "losses_train": losses_train.ckpt()}, f)
                    plot_graphs_async(losses_train, lr_meter, cfg.output_dir)
            if global_step >= cfg.max_train_steps:
                break
        if global_step >= cfg.max_train_steps:
            break
    if progress is not None:
        progress.close()

    # --- end-of-training finalization ---
    # flush metric entries still pending from a partial 10-entry window
    for gs, dev_loss, dev_gnorm in pending_losses:
        loss = float(dev_loss)
        lr = float(schedule_fn(gs))
        losses_train.update(loss, gs)
        lr_meter.update(lr, gs)
        if writer is not None:
            writer.add_scalar("loss", loss, gs)
            writer.add_scalar("lr", lr, gs)
            writer.add_scalar("grad_norm", float(dev_gnorm), gs)
    pending_losses = []
    # save the final state unless the last step already did — otherwise up
    # to save_steps-1 optimizer steps of training would be unloadable
    if global_step > 0 and global_step % cfg.save_steps != 0:
        from seervideoldm_tpu.parallel.distributed import barrier_sync

        barrier_sync(f"save_final_{global_step}")
        from seervideoldm_tpu.training.lora import inference_params

        full = inference_params(
            state.ema_params if use_ema else state.params, frozen, lscale)
        ckpt.save(global_step, state,
                  params={"unet": full["unet"], "fstext": full["fstext"]})
        if is_main_process():
            import json

            with open(os.path.join(
                    cfg.output_dir,
                    f"learned_sdunet-steps-{global_step}.json"), "w") as f:
                json.dump({"epoch": epoch, "global_step": global_step,
                           "lr_meter": lr_meter.ckpt(),
                           "losses_train": losses_train.ckpt()}, f)
            plot_graphs(losses_train, lr_meter, cfg.output_dir)
    if writer is not None:
        writer.close()
    ckpt.wait()


if __name__ == "__main__":
    main()
