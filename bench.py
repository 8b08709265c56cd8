"""Headline benchmark: DDIM sampling frames/sec/chip on the flagship model.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s/chip",
   "vs_baseline": R}

Protocol (BASELINE.md north star): 12-frame clip, DDIM-50 with CFG
(2x batched UNet), cond_frames=2, SD-1.5-scale SeerUNet in bf16, 512 px.
The headline `value` is the **e2e clip** rate — cond-frame VAE encode +
DDIM loop + per-frame VAE decode, exactly the reference's one-call
inference path (``/root/reference/utils/ddim_sampling_utils.py:21-42``);
`latents_only` (FSText + DDIM, no VAE) is reported in `detail` for
comparison with rounds 1-2.  MFU uses the analytic matmul/conv FLOP count
(``seervideoldm_tpu/utils/flops.py``) — the standard model-FLOPs numerator,
NOT pre-optimization HLO cost analysis (round-2's `est_mfu` overcounted).

Invoked with NO flags (the driver protocol), three rows run and land in
``detail.modes`` so regressions in any mode stay driver-visible across
rounds (VERDICT r4 task 6): the 512px parity headline, 256px parity (the
reference's actual train/eval recipe resolution,
``/root/reference/configs/train.yaml``), and PAB --pab 2 6 4 at 512px (the
accelerated serving mode).  Any explicit flag keeps the old single-config
behavior.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--num_frames", type=int, default=12)
    parser.add_argument("--cond_frames", type=int, default=2)
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--skip_e2e", action="store_true",
                        help="latents-only (rounds 1-2 protocol)")
    parser.add_argument("--sampler", default="ddim", choices=["ddim", "dpm++"],
                        help="headline protocol is ddim (reference parity); "
                             "dpm++ probes the fast-sampler path")
    parser.add_argument("--guidance_interval", type=float, nargs=2, default=None,
                        metavar=("LO", "HI"),
                        help="CFG only for timesteps in [LO, HI] (beyond "
                             "reference; headline protocol omits this)")
    parser.add_argument("--pab", type=int, nargs=3, default=None,
                        metavar=("SPATIAL", "CROSS", "TEMPORAL"),
                        help="Pyramid Attention Broadcast ranges (beyond "
                             "reference; headline protocol omits this). "
                             "Typical: --pab 2 6 4")
    parser.add_argument("--tome", type=float, default=None, metavar="RATIO",
                        help="Token Merging ratio for the high-res spatial "
                             "self-attention (beyond reference; headline "
                             "protocol omits this). Typical: --tome 0.5")
    parser.add_argument("--compile_effort", default="default",
                        choices=["fast", "default", "max"],
                        help="XLA exec-time optimization effort; 'max' suits "
                             "a compile-once serving executable")
    return parser


def bench_one(args) -> dict:
    from seervideoldm_tpu.utils.cache import set_compile_effort

    set_compile_effort(args.compile_effort)

    from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop
    from seervideoldm_tpu.diffusion.dpm_solver import dpm_solver_sample_loop
    from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule
    from seervideoldm_tpu.models.fstext import FSTextTransformer
    from seervideoldm_tpu.models.unet3d import SeerUNet
    from seervideoldm_tpu.models.vae import VAE_SCALE, AutoencoderKL

    dtype = jnp.bfloat16
    latent = args.resolution // 8
    f1, f = args.cond_frames, args.num_frames
    f2 = f - f1
    b = args.batch

    unet_cfg = None
    if args.tome:
        import dataclasses

        from seervideoldm_tpu.models.unet3d import SEER_UNET_SD15_CONFIG

        unet_cfg = dataclasses.replace(SEER_UNET_SD15_CONFIG, tome_ratio=args.tome)
    unet = SeerUNet(dtype=dtype) if unet_cfg is None else SeerUNet(
        config=unet_cfg, dtype=dtype)
    fstext = FSTextTransformer(num_frames=f, dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    clip_emb = jax.random.normal(k1, (b, 77, 768), dtype)
    cond_pixels = jax.random.uniform(k2, (b, f1, args.resolution, args.resolution, 3),
                                     dtype, -1.0, 1.0)
    x_T = jax.random.normal(k3, (b, f2, latent, latent, 4), dtype)
    # init at TINY spatial shapes: param shapes don't depend on h/w (see
    # utils/inits.py for why inits are always jitted)
    from seervideoldm_tpu.utils.inits import jit_init

    unet_params = jit_init(lambda k: unet.init(
        k, jnp.zeros((1, f, 8, 8, 4), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, f, 77, 768), dtype), 0,
    ), k4)
    fstext_params = jit_init(
        lambda k: fstext.init(k, jnp.zeros((1, 77, 768), dtype)), k4)
    vae_params = jit_init(
        lambda k: vae.init(k, jnp.zeros((1, 16, 16, 3), dtype), k), k4)
    # production inference: store weights in bf16 (halves HBM weight traffic)
    cast = lambda t: jax.tree.map(lambda p: p.astype(dtype), t)  # noqa: E731
    unet_params, fstext_params, vae_params = map(
        cast, (unet_params, fstext_params, vae_params))

    schedule = DiffusionSchedule.create(1000)
    tables = schedule.ddim_tables(args.ddim_steps, eta=0.0)

    if args.pab is not None:
        from seervideoldm_tpu.diffusion.pab import PABConfig, build_pab_schedule

        s, c, t_ = args.pab
        # schedule over the ACTUAL table length (the +1-offset grid can
        # produce more steps than ddim_steps, e.g. 30 -> 31)
        pab_schedule = build_pab_schedule(
            len(tables.timesteps),
            PABConfig(spatial_range=s, cross_range=c, temporal_range=t_),
        )

    def ddim(unet_params, fstext_params, x_T, x0_emb, clip_emb):
        context = fstext.apply({"params": fstext_params}, clip_emb)
        uncond = jnp.broadcast_to(clip_emb[:, None], (b, f, *clip_emb.shape[1:]))

        def unet_apply(x, t, ctx, cf):
            return unet.apply({"params": unet_params}, x, t, ctx, cf)

        pab = None
        if args.pab is not None:
            def pab_apply(x, t, ctx, cf, st, flags):
                out, mut = unet.apply({"params": unet_params, "pab": st},
                                      x, t, ctx, cf, pab=flags, mutable=["pab"])
                return out, mut["pab"]

            pab = (*pab_schedule, pab_apply)

        loop = dpm_solver_sample_loop if args.sampler == "dpm++" else ddim_sample_loop
        return loop(
            unet_apply, x_T, tables, context, x0_emb=x0_emb,
            uncond_context=uncond, guidance_scale=7.5,
            guidance_interval=(tuple(args.guidance_interval)
                               if args.guidance_interval else None),
            **({"pab": pab} if pab is not None else {}),
        )

    def latents_fn(unet_params, fstext_params, vae_params, x_T, cond_pixels,
                   clip_emb, key):
        z = vae.apply({"params": vae_params},
                      cond_pixels.reshape(b * f1, *cond_pixels.shape[2:]), key,
                      method=vae.encode) * jnp.asarray(VAE_SCALE, dtype)
        x0_emb = z.reshape(b, f1, latent, latent, 4)
        return ddim(unet_params, fstext_params, x_T, x0_emb, clip_emb)

    def e2e_fn(unet_params, fstext_params, vae_params, x_T, cond_pixels,
               clip_emb, key):
        latents = latents_fn(unet_params, fstext_params, vae_params, x_T,
                             cond_pixels, clip_emb, key)
        flat = latents.reshape(b * f2, latent, latent, 4) / jnp.asarray(
            VAE_SCALE, dtype)
        frames = vae.apply({"params": vae_params}, flat, method=vae.decode)
        # clamp to [0, 1] like the reference (ddim_sampling_utils.py:41-42)
        return jnp.clip((frames + 1.0) / 2.0, 0.0, 1.0)

    def run(fn, label):
        # donate x_T only where an output of the same shape/dtype exists to
        # alias (latents_fn returns the sampled latents); e2e_fn's output is
        # decoded frames, so donating there is never usable and XLA warns.
        # The DDIM scan's internal carry donation is independent of this.
        donate = (3,) if fn is latents_fn else ()
        jit_fn = jax.jit(fn, donate_argnums=donate)
        key = jax.random.PRNGKey(99)
        # fresh buffer per run(): x_T is donated, so the warmup of the second
        # benchmarked fn must not reuse the first one's consumed input
        x_T_w = jax.random.normal(jax.random.PRNGKey(1000), x_T.shape, dtype)
        out = jit_fn(unet_params, fstext_params, vae_params, x_T_w, cond_pixels,
                     clip_emb, key)
        float(out.mean())  # compile + sync (scalar fetch; see below)
        times = []
        for i in range(args.iters):
            x_T_i = jax.random.normal(jax.random.PRNGKey(i + 1), x_T.shape, dtype)
            np.asarray(x_T_i)  # input upload outside the timer
            t0 = time.perf_counter()
            out = jit_fn(unet_params, fstext_params, vae_params, x_T_i,
                         cond_pixels, clip_emb, key)
            # sync on a device-reduced SCALAR: waits for the whole
            # computation but keeps the (tunnel-slow, production-irrelevant)
            # bulk device->host copy out of the timed region
            float(out.mean())
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    from seervideoldm_tpu.utils.flops import sampling_clip_flops

    flops = sampling_clip_flops(b, f, f1, args.resolution, args.ddim_steps,
                                cfg=True, include_vae=True)
    peak_flops = {"TPU v5 lite": 197e12, "TPU v5": 459e12,
                  "TPU v4": 275e12, "TPU v6 lite": 918e12}
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peak_flops.items() if kind.startswith(k)), None)
    # the benchmark program is single-device (no mesh): per-chip rate means
    # the one chip actually used — dividing by jax.device_count() on a
    # multi-chip host would deflate the rate while est_mfu assumed one chip
    n_chips = 1

    dt_lat = run(latents_fn, "latents")
    dt_e2e = dt_lat if args.skip_e2e else run(e2e_fn, "e2e")
    del run
    dt = dt_e2e
    value = b * f2 / dt / n_chips

    baseline = None
    try:
        with open("BASELINE.json") as fp:
            base = json.load(fp)
        baseline = base.get("measured", {}).get("a100_frames_per_sec_per_chip")
    except Exception:
        pass
    vs_baseline = value / baseline if baseline else 1.0

    return ({
        "metric": "frames_per_sec_per_chip",
        "value": round(value, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "protocol": (f"e2e clip (VAE encode + {args.sampler} + VAE decode)"
                         if not args.skip_e2e else
                         f"latents only ({args.sampler})"),
            "resolution": args.resolution, "num_frames": f,
            "ddim_steps": args.ddim_steps, "sampler": args.sampler,
            "pab_ranges": args.pab,
            "tome_ratio": args.tome,
            "e2e_clip_latency_s": round(dt_e2e, 4),
            "latents_only_latency_s": round(dt_lat, 4),
            "latents_only_frames_per_sec_per_chip": round(
                b * f2 / dt_lat / n_chips, 4),
            "chips": n_chips,
            "est_mfu": (round(flops["e2e_total"] / dt_e2e / peak, 4)
                        if peak and not args.skip_e2e else
                        round(flops["ddim_total"] / dt_lat / peak, 4)
                        if peak else None),
            "est_mfu_latents": (round(flops["ddim_total"] / dt_lat / peak, 4)
                                if peak else None),
            "total_tflops_e2e": round(flops["e2e_total"] / 1e12, 1),
            "flops_method": "analytic matmul/conv count (utils/flops.py)",
        },
    })


def _mode_summary(row: dict) -> dict:
    d = row["detail"]
    return {
        "frames_per_sec_per_chip": row["value"],
        "e2e_clip_latency_s": d["e2e_clip_latency_s"],
        "latents_only_frames_per_sec_per_chip":
            d["latents_only_frames_per_sec_per_chip"],
        "est_mfu": d["est_mfu"],
        "resolution": d["resolution"],
        "pab_ranges": d["pab_ranges"],
    }


def main() -> None:
    from seervideoldm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = _build_parser()
    args = parser.parse_args()
    if len(sys.argv) > 1:
        # explicit flags: single-config behavior (tooling/probe usage)
        print(json.dumps(bench_one(args)))
        return

    # driver protocol (no flags): three rows so every serving mode is
    # regression-tracked across rounds.  Headline value/metric stay the
    # 512px parity e2e rate; the other modes land in detail.modes.
    print("bench row 1/3: 512px parity DDIM-50", file=sys.stderr, flush=True)
    r512 = bench_one(parser.parse_args([]))
    print("bench row 2/3: 256px parity DDIM-50 (reference train recipe "
          "resolution)", file=sys.stderr, flush=True)
    r256 = bench_one(parser.parse_args(["--resolution", "256"]))
    print("bench row 3/3: 512px PAB 2/6/4 (accelerated serving mode)",
          file=sys.stderr, flush=True)
    rpab = bench_one(parser.parse_args(["--pab", "2", "6", "4"]))
    out = dict(r512)
    out["detail"] = dict(r512["detail"])
    out["detail"]["modes"] = {
        "512px_parity_ddim50": _mode_summary(r512),
        "256px_parity_ddim50": _mode_summary(r256),
        "512px_pab_2_6_4": _mode_summary(rpab),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
