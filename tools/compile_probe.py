"""Diagnose train-step compile size: trace/lower the flagship train step
abstractly (no real params) and report jaxpr equation counts + StableHLO op
counts, optionally timing an XLA CPU compile.

The round-1 blocker was the full-scale backward compile never finishing
through the remote-compile tunnel (STATUS.md); compile time tracks graph
node count, so this tool is how we measure whether scan-over-layers /
coarser remat actually shrink the graph.

Run: JAX_PLATFORMS=cpu python tools/compile_probe.py [--toy] [--compile]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def count_eqns(jaxpr) -> int:
    n = 0
    for eqn in jaxpr.eqns:
        n += 1
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                n += count_eqns(v.jaxpr)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if hasattr(x, "jaxpr"):
                        n += count_eqns(x.jaxpr)
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--toy", action="store_true", help="toy widths (round-1 test scale)")
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--cond_frames", type=int, default=2)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--remat", default="block",
                        help="remat mode: none | block | <policy name>")
    parser.add_argument("--scan", action="store_true", help="scan-over-layers UNet")
    parser.add_argument("--compile", action="store_true", help="time XLA compile too")
    parser.add_argument("--fwd-only", action="store_true", help="probe forward pass only")
    args = parser.parse_args()

    jax.config.update("jax_platforms", "cpu")

    from seervideoldm_tpu.models.fstext import FSTextTransformer
    from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig
    from seervideoldm_tpu.training.optim import build_optimizer, trainable_mask
    from seervideoldm_tpu.training.trainer import (
        TrainState, make_train_step, partition_params,
    )

    dtype = jnp.bfloat16
    if args.toy:
        cfg = SeerUNetConfig(block_out_channels=(32, 64), norm_num_groups=8,
                             layers_per_block=1, cross_attention_dim=32,
                             attention_head_dim=4)
        ctx_dim, latent = 32, 8
    else:
        cfg = SeerUNetConfig()
        ctx_dim, latent = 768, args.resolution // 8

    b, f, f1 = args.batch, args.frames, args.cond_frames
    f2 = f - f1
    unet_kw = dict(config=cfg, dtype=dtype)
    if args.remat in ("none", "block"):
        unet_kw["remat"] = args.remat == "block"
    else:
        unet_kw["remat"] = args.remat
    if args.scan:
        unet_kw["scan_layers"] = True
    unet = SeerUNet(**unet_kw)
    fstext = FSTextTransformer(
        num_frames=f, dtype=dtype, in_channels=ctx_dim, out_channels=ctx_dim,
        cross_attention_dim=ctx_dim, n_heads=4 if args.toy else 8,
        num_layers=1 if args.toy else 8,
    )

    # abstract init — zero memory, just shapes
    t0 = time.perf_counter()
    unet_shapes = jax.eval_shape(
        lambda r, x, t, c: unet.init(r, x, t, c, f1),  # f1 static
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((b, f, latent, latent, 4), dtype),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b, f, 77, ctx_dim), dtype),
    )["params"]
    fstext_shapes = jax.eval_shape(
        fstext.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((b, 77, ctx_dim), dtype),
    )["params"]
    print(f"abstract init: {time.perf_counter() - t0:.1f}s", flush=True)
    params = {"unet": unet_shapes, "fstext": fstext_shapes}
    n_params = sum(
        int(jnp.prod(jnp.asarray(p.shape))) for p in jax.tree.leaves(params)
    )
    print(f"params: {n_params / 1e6:.1f}M", flush=True)

    class M:
        pass

    models = M()
    models.unet, models.fstext = unet, fstext

    trainable, frozen = partition_params(params, trainable_mask(params))
    tx, _ = build_optimizer(trainable, 1e-4, warmup_steps=1, total_steps=1000,
                            partitioned=True)
    state_shapes = jax.eval_shape(lambda t: TrainState.create(t, tx), trainable)

    batch = {
        "latents_x0": jax.ShapeDtypeStruct((b, f1, latent, latent, 4), dtype),
        "latents": jax.ShapeDtypeStruct((b, f2, latent, latent, 4), dtype),
        "clip_emb": jax.ShapeDtypeStruct((b, 77, ctx_dim), dtype),
    }
    if args.fwd_only:
        def fwd(fr, ba):
            ctx = fstext.apply({"params": fr["fstext"]}, ba["clip_emb"])
            x_in = jnp.concatenate([ba["latents_x0"], ba["latents"]], axis=1)
            return unet.apply({"params": fr["unet"]}, x_in,
                              jnp.zeros((b,), jnp.int32), ctx, f1)

        full = {"unet": unet_shapes, "fstext": fstext_shapes}
        fn, fargs = jax.jit(fwd), (full, batch)
    else:
        train_step = make_train_step(models, tx, cond_frames=f1,
                                     frozen_params=frozen)
        fn, fargs = train_step.jitted, (state_shapes, batch,
                                        jax.ShapeDtypeStruct((2,), jnp.uint32), frozen)

    t0 = time.perf_counter()
    lowered = fn.lower(*fargs)
    t_lower = time.perf_counter() - t0
    mlir_ops = lowered.compiler_ir(dialect="stablehlo").operation.get_asm(
        large_elements_limit=0).count("\n")
    print(f"lower: {t_lower:.1f}s  stablehlo lines: {mlir_ops}", flush=True)

    if args.compile:
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        try:
            n_hlo = compiled.as_text().count("\n")
        except Exception:
            n_hlo = -1
        print(f"XLA CPU compile: {t_compile:.1f}s  optimized hlo lines: {n_hlo}",
              flush=True)


if __name__ == "__main__":
    main()
