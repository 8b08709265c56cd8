"""Quality probe for the accelerated sampling modes (VERDICT r3 task 8).

PAB / ToMe / FreeU / DPM++-20 / limited-interval guidance all ship with
parity-when-off tests and measured speedups, but their *generation impact*
needs a harness: this tool runs each mode at a MATCHED x_T / conditioning /
prompt against the parity sampler (DDIM, full CFG, no accel) and reports

  - latent deviation: RMSE, max|Δ|, and relative RMSE (normalized by the
    parity latents' std — the scale-free number to compare across modes);
  - measured wall-clock speedup vs the parity sampler (same protocol as
    bench.py: warm compile, median of --iters, scalar-fetch sync);

one JSON line per mode plus a ranking table.  With real weights (task 6
runbook) the same matched-seed harness feeds CLIPSIM/FVD; with random
weights the latent deviation already RANKS the modes — deviation is
measured against what the parity sampler would have produced from the
identical noise, which is exactly the quantity a real-weights FVD drift
tracks.

  python tools/quality_probe.py --resolution 512 --iters 3        # TPU
  python tools/quality_probe.py --tiny --iters 1                  # CPU CI
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--num_frames", type=int, default=12)
    parser.add_argument("--cond_frames", type=int, default=2)
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--dpm_steps", type=int, default=20)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--modes", default="pab,tome,freeu,dpm++,gi",
                        help="comma list of: pab tome freeu dpm++ gi")
    parser.add_argument("--tiny", action="store_true",
                        help="toy-scale model on CPU (CI drive)")
    parser.add_argument("--out", default=None,
                        help="write the full probe report (rows + summary) "
                             "to this JSON file (the committed artifact)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from seervideoldm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop
    from seervideoldm_tpu.diffusion.dpm_solver import dpm_solver_sample_loop
    from seervideoldm_tpu.diffusion.pab import PABConfig, build_pab_schedule
    from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule
    from seervideoldm_tpu.models.fstext import FSTextTransformer
    from seervideoldm_tpu.models.unet3d import SEER_UNET_SD15_CONFIG, SeerUNet, SeerUNetConfig
    from seervideoldm_tpu.utils.inits import jit_init

    if args.tiny:
        args.resolution, args.num_frames, args.cond_frames = 32, 4, 1
        args.ddim_steps, args.dpm_steps = 8, 4
        dtype = jnp.float32
        base_cfg = SeerUNetConfig(
            block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
            cross_attention_dim=8, attention_head_dim=2)
        ctx_dim = 8
    else:
        dtype = jnp.bfloat16
        base_cfg = SEER_UNET_SD15_CONFIG
        ctx_dim = 768
    latent = args.resolution // 8
    f1, f = args.cond_frames, args.num_frames
    f2, b = f - f1, 1

    fstext_kwargs = dict(num_frames=f, dtype=dtype)
    if args.tiny:
        fstext_kwargs.update(n_heads=2, num_layers=1, in_channels=ctx_dim,
                             out_channels=ctx_dim, cross_attention_dim=ctx_dim)
    fstext = FSTextTransformer(**fstext_kwargs)
    ctx_len = 4 if args.tiny else 77
    rng = jax.random.PRNGKey(0)
    k1, k3, k4 = jax.random.split(rng, 3)
    clip_emb = jax.random.normal(k1, (b, ctx_len, ctx_dim), dtype)
    x_T = jax.random.normal(k3, (b, f2, latent, latent, 4), dtype)
    x0_emb = jax.random.normal(k4, (b, f1, latent, latent, 4), dtype) * 0.2

    def build_unet(cfg):
        return SeerUNet(config=cfg, dtype=dtype)

    unet = build_unet(base_cfg)
    unet_params = jit_init(lambda k: unet.init(
        k, jnp.zeros((1, f, 8, 8, 4), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, f, clip_emb.shape[1], ctx_dim), dtype), 0), k4)
    fstext_params = jit_init(
        lambda k: fstext.init(k, jnp.zeros((1, clip_emb.shape[1], ctx_dim),
                                           dtype)), k4)
    cast = lambda t: jax.tree.map(lambda p: p.astype(dtype), t)  # noqa: E731
    unet_params, fstext_params = cast(unet_params), cast(fstext_params)

    # the zero-initialized proj_out of every SpatialTransformer3D (identity
    # fresh-temporal-layer parity) annihilates attention deltas at random
    # init — PAB/ToMe would measure rmse 0.0 vacuously.  Give proj_out small
    # random weights so attention-path changes reach the latents (same trick
    # as tests/test_pab.py::_randomize_proj_out).
    key_po = [jax.random.PRNGKey(7)]

    def _randomize_proj_out(p, path=""):
        if isinstance(p, dict):
            return {k: _randomize_proj_out(v, path + "/" + k)
                    for k, v in p.items()}
        if "proj_out" in path:
            key_po[0], sub = jax.random.split(key_po[0])
            return jax.random.normal(sub, p.shape, p.dtype) * 0.05
        return p

    unet_params = _randomize_proj_out(unet_params)

    schedule = DiffusionSchedule.create(1000)

    def make_fn(mode):
        """Return a jittable sampler closure for the named mode."""
        cfg = base_cfg
        steps, loop = args.ddim_steps, ddim_sample_loop
        gi, pab_ranges = None, None
        if mode == "tome":
            cfg = dataclasses.replace(base_cfg, tome_ratio=0.5,
                                      tome_min_tokens=4 if args.tiny else 1024)
        elif mode == "freeu":
            cfg = dataclasses.replace(base_cfg, freeu=(1.2, 1.4, 0.9, 0.2))
        elif mode == "dpm++":
            steps, loop = args.dpm_steps, dpm_solver_sample_loop
        elif mode == "gi":
            gi = (0.15, 0.85)
        elif mode == "pab":
            pab_ranges = (2, 6, 4)
        m_unet = build_unet(cfg)
        tables = schedule.ddim_tables(steps, eta=0.0)
        pab_schedule = None
        if pab_ranges:
            pab_schedule = build_pab_schedule(
                len(tables.timesteps),
                PABConfig(*pab_ranges))

        def fn(unet_params, fstext_params, x_T, x0_emb, clip_emb):
            context = fstext.apply({"params": fstext_params}, clip_emb)
            uncond = jnp.broadcast_to(clip_emb[:, None],
                                      (b, f, *clip_emb.shape[1:]))

            def unet_apply(x, t, ctx, cf):
                return m_unet.apply({"params": unet_params}, x, t, ctx, cf)

            pab = None
            if pab_schedule is not None:
                # pab_apply must close over fn's TRACED unet_params, not
                # the host tree — a make_fn-level closure bakes the 2.2 GB
                # bf16 param tree into the program as constants and the
                # relay rejects the module (broken pipe, /tmp/qprobe.log)
                def pab_apply(x, t, ctx, cf, st, flags):
                    out, mut = m_unet.apply(
                        {"params": unet_params, "pab": st},
                        x, t, ctx, cf, pab=flags, mutable=["pab"])
                    return out, mut["pab"]

                pab = (*pab_schedule, pab_apply)

            return loop(
                unet_apply, x_T, tables, context, x0_emb=x0_emb,
                uncond_context=uncond, guidance_scale=7.5,
                guidance_interval=gi,
                **({"pab": pab} if pab is not None else {}),
            )

        return fn

    def run(fn):
        jit_fn = jax.jit(fn)
        out = jit_fn(unet_params, fstext_params, x_T, x0_emb, clip_emb)
        float(out.mean())  # compile + sync
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = jit_fn(unet_params, fstext_params, x_T, x0_emb, clip_emb)
            float(out.mean())
            times.append(time.perf_counter() - t0)
        return np.asarray(out, dtype=np.float32), float(np.median(times))

    parity, t_parity = run(make_fn("parity"))
    parity_std = float(parity.std())
    rows = []
    for mode in [m.strip() for m in args.modes.split(",") if m.strip()]:
        out, t_mode = run(make_fn(mode))
        diff = out - parity
        row = {
            "mode": mode,
            "rmse": float(np.sqrt(np.mean(diff ** 2))),
            "maxdiff": float(np.abs(diff).max()),
            "rel_rmse": float(np.sqrt(np.mean(diff ** 2)) / parity_std),
            "speedup": round(t_parity / t_mode, 4),
            "latency_s": round(t_mode, 4),
            "steps": args.dpm_steps if mode == "dpm++" else args.ddim_steps,
        }
        rows.append(row)
        print(json.dumps(row))

    rows.sort(key=lambda r: r["rel_rmse"])
    summary = {
        "parity_latency_s": round(t_parity, 4),
        "parity_std": parity_std,
        "protocol": {"resolution": args.resolution, "frames": f,
                     "ddim_steps": args.ddim_steps, "cfg_scale": 7.5,
                     "matched_x_T": True},
        "ranking_by_deviation": [r["mode"] for r in rows],
        "ranking_by_speedup": [r["mode"] for r in
                               sorted(rows, key=lambda r: -r["speedup"])],
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump({"modes": rows, **summary}, fp, indent=1)


if __name__ == "__main__":
    main()
