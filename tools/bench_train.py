"""Training-step benchmark at the reference recipe scale.

Measures ms/optimizer-step for the Sthv2 recipe (256px, 12 frames, bs 1,
temporal-attentions + FSText trainable) with rematerialization, on the real
chip.  Prints one JSON line.  Run: python tools/bench_train.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--num_frames", type=int, default=12)
    parser.add_argument("--cond_frames", type=int, default=2)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--remat", default="save_attn",
                        help="none | block | save_attn")
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--compile_effort", default="fast",
                        help="fast|default (fast keeps the cold backward "
                             "compile inside the remote tunnel's lifetime)")
    args = parser.parse_args()

    from seervideoldm_tpu.utils.cache import set_compile_effort

    set_compile_effort(args.compile_effort)

    from seervideoldm_tpu.models.fstext import FSTextTransformer
    from seervideoldm_tpu.models.unet3d import SeerUNet
    from seervideoldm_tpu.pipelines.text_video import SeerModels
    from seervideoldm_tpu.training.optim import build_optimizer, trainable_mask
    from seervideoldm_tpu.training.trainer import (
        TrainState, make_train_step, partition_params,
    )

    dtype = jnp.bfloat16
    latent = args.resolution // 8
    b, f, f1 = args.batch, args.num_frames, args.cond_frames
    f2 = f - f1

    # build only the trainable stack (VAE/CLIP encoding is a frozen
    # prepare pass outside the step)
    remat = False if args.remat == "none" else (
        True if args.remat == "block" else args.remat)
    unet = SeerUNet(dtype=dtype, remat=remat)
    fstext = FSTextTransformer(num_frames=f, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    # jitted tiny-spatial init: param shapes don't depend on h/w, and an
    # unjitted full-scale init costs ~10 min of relay dispatch latency
    unet_params = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, f, 8, 8, 4), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, f, 77, 768), dtype), f1,
    )["params"])(rng)
    fstext_params = jax.jit(
        lambda k: fstext.init(k, jnp.zeros((1, 77, 768), dtype))["params"]
    )(rng)
    params = {"unet": unet_params, "fstext": fstext_params}

    class M:  # minimal SeerModels stand-in for make_train_step
        pass

    models = M()
    models.unet, models.fstext = unet, fstext

    trainable, frozen = partition_params(params, trainable_mask(params))
    tx, _ = build_optimizer(trainable, 1e-4, warmup_steps=1, total_steps=1000,
                            partitioned=True)
    state = TrainState.create(trainable, tx)
    train_step = make_train_step(models, tx, cond_frames=f1, frozen_params=frozen)

    batch = {
        "latents_x0": jax.random.normal(rng, (b, f1, latent, latent, 4), dtype),
        "latents": jax.random.normal(rng, (b, f2, latent, latent, 4), dtype),
        "clip_emb": jax.random.normal(rng, (b, 77, 768), dtype),
    }
    t0 = time.perf_counter()
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    float(metrics["loss"])  # sync
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, jax.random.PRNGKey(2))
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        hbm_gb = None
    print(json.dumps({
        "metric": "train_step_ms",
        "value": round(dt * 1000, 1),
        "unit": "ms/step",
        "detail": {"resolution": args.resolution, "batch": b, "frames": f,
                   "remat": args.remat, "loss": float(metrics["loss"]),
                   "compile_or_warmup_s": round(compile_s, 1),
                   "peak_hbm_gb": hbm_gb},
    }))


if __name__ == "__main__":
    main()
