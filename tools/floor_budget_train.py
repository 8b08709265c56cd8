"""Train-side floor budget (VERDICT r4 task 2): why is train MFU 0.17 when
the sampler runs at 0.46?

Decomposes the 256px-recipe bare train step (b=1, f=12, save_attn remat —
TRAINBENCH.json's compute floor) the same way tools/floor_budget.py does
the sampling step:

1. whole-step measurements across batch/accum layouts at FIXED global
   batch (b=1 accum 2 vs b=2 accum 1 vs b=4) — is the recipe's b=1
   latency-bound?
2. remat recompute cost: save_attn vs none vs block at the same shape;
3. optimizer+EMA cost: full step minus a grad-only step (same vjp, no
   optax/EMA update);
4. per-site fwd+bwd measurements vs analytic floors with documented
   backward multipliers: frozen sites (spatial/text attention, resnets)
   backprop activations only (dgrad, x2 the forward matmuls); trainable
   sites (temporal attention, and FSText outside this table) also produce
   weight grads (x3); flash-style attention backwards recompute scores and
   probabilities in-kernel (~x3.5 the forward attention matmuls, softmax
   x2).  Sites are measured WITHOUT remat (the step-level remat row prices
   that separately).

Reference bar: the 4x3090 recipe, /root/reference/configs/train.yaml:10-13.
Run on the real chip:  python tools/floor_budget_train.py [--json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.cache import enable_compilation_cache

import floor_budget as fb  # lin/attn_mm/occ/resnet_floor/softmax calib


def bench_calls(fn, args_, iters=3, n1=3, n2=9):
    """Per-call seconds via a two-N delta over REPEATED jitted calls
    (each call syncs on a scalar).  For whole-step timing the scan trick
    does not apply (the optimizer state threads through), so we amortize
    dispatch by calling in a tight loop and differencing call counts."""

    def timed(n):
        out = None
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args_)
            jax.block_until_ready(out)
            float(jax.tree.leaves(out)[0].sum()
                  if hasattr(jax.tree.leaves(out)[0], "sum") else 0.0)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    fn(*args_)  # warm
    return max(timed(n2) - timed(n1), 1e-9) / (n2 - n1)


def bench_scan_vjp(apply_fn, params, x, wrt_params, iters=3):
    """Two-N scan delta of one fwd+bwd through the site."""

    def timed(n_inner):
        @jax.jit
        def scanned(params, x):
            def body(h, _):
                if wrt_params:
                    def loss(p, hh):
                        return jnp.sum(apply_fn(p, hh).astype(jnp.float32) ** 2)

                    gp, gh = jax.grad(loss, argnums=(0, 1))(params, h)
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(gp))
                    return (gh + (s * 1e-20).astype(h.dtype)).astype(h.dtype), ()

                def loss(hh):
                    return jnp.sum(apply_fn(params, hh).astype(jnp.float32) ** 2)

                return jax.grad(loss)(h).astype(h.dtype), ()

            h, _ = jax.lax.scan(body, x, None, length=n_inner)
            return jnp.sum(h.astype(jnp.float32))

        float(scanned(params, x))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(scanned(params, x))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    lo, hi = 5, 15
    return max(timed(hi) - timed(lo), 1e-9) / (hi - lo)


def build_step(b, f, f1, latent, remat, with_opt=True):
    from seervideoldm_tpu.models.fstext import FSTextTransformer
    from seervideoldm_tpu.models.unet3d import SeerUNet
    from seervideoldm_tpu.training.optim import build_optimizer, trainable_mask
    from seervideoldm_tpu.training.trainer import (TrainState, make_train_step,
                                                   partition_params)

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    remat_arg = False if remat == "none" else (
        True if remat == "block" else remat)
    unet = SeerUNet(dtype=dtype, remat=remat_arg)
    fstext = FSTextTransformer(num_frames=f, dtype=dtype)
    unet_params = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, f, 8, 8, 4), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, f, 77, 768), dtype), f1,
    )["params"])(rng)
    fstext_params = jax.jit(
        lambda k: fstext.init(k, jnp.zeros((1, 77, 768), dtype))["params"]
    )(rng)
    params = {"unet": unet_params, "fstext": fstext_params}

    class M:
        pass

    models = M()
    models.unet, models.fstext = unet, fstext
    trainable, frozen = partition_params(params, trainable_mask(params))
    tx, _ = build_optimizer(trainable, 1e-4, warmup_steps=1,
                            total_steps=1000, partitioned=True)
    state = TrainState.create(trainable, tx)
    step = make_train_step(models, tx, cond_frames=f1, frozen_params=frozen)
    f2 = f - f1
    batch = {
        "latents_x0": jax.random.normal(rng, (b, f1, latent, latent, 4), dtype),
        "latents": jax.random.normal(rng, (b, f2, latent, latent, 4), dtype),
        "clip_emb": jax.random.normal(rng, (b, 77, 768), dtype),
    }
    return models, state, step, batch, trainable, frozen


def time_step(step, state, batch, iters=3):
    st = state
    st, m = step(st, batch, jax.random.PRNGKey(1))
    float(m["loss"])
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        st, m = step(st, batch, jax.random.PRNGKey(2 + i))
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--cond_frames", type=int, default=2)
    parser.add_argument("--json", action="store_true")
    parser.add_argument("--skip_sites", action="store_true")
    parser.add_argument("--sections", default="1,2,3,4",
                        help="comma list of sections to run (1=batch "
                             "layouts, 2=remat, 3=optimizer, 4=sites) — "
                             "resume after a relay failure without "
                             "re-measuring completed sections")
    parser.add_argument("--batches", default="1,2,4",
                        help="section-1 batch sizes")
    parser.add_argument("--remat", default="save_attn",
                        help="section-1 remat policy (section 2 sweeps its "
                             "own)")
    args = parser.parse_args()
    sections = {s.strip() for s in args.sections.split(",")}
    batches = [int(x) for x in args.batches.split(",") if x.strip()]
    enable_compilation_cache()
    from seervideoldm_tpu.utils.cache import set_compile_effort

    set_compile_effort("fast")

    f, f1 = args.frames, args.cond_frames
    latent = args.resolution // 8
    out = {"resolution": args.resolution, "frames": f}

    # ---- 1. batch/accum layouts at fixed global batch 2 ----
    step_ms = {}
    print(f"== whole-step timings ({args.remat} remat) ==", flush=True)
    for b in batches if "1" in sections else ():
        try:
            _, state, step, batch, _, _ = build_step(
                b, f, f1, latent, args.remat)
            dt = time_step(step, state, batch)
            step_ms[b] = dt * 1e3
            print(f"b={b}: {dt*1e3:8.1f} ms/step  "
                  f"{dt*1e3/b:8.1f} ms/sample", flush=True)
            del state, step, batch
        except Exception as e:
            print(f"b={b}: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
    out["step_ms_by_batch"] = {str(k): round(v, 1)
                               for k, v in step_ms.items()}
    if 1 in step_ms and 2 in step_ms:
        out["accum2_vs_b2_speedup"] = round(2 * step_ms[1] / step_ms[2], 3)
        print(f"opt-step at global batch 2: accum x2 of b=1 = "
              f"{2*step_ms[1]:.1f} ms vs one b=2 step = {step_ms[2]:.1f} ms "
              f"({out['accum2_vs_b2_speedup']}x)", flush=True)

    # ---- 2. remat recompute cost (b=1) ----
    print("== remat policies (b=1) ==", flush=True)
    remat_ms = {}
    for remat in ("save_attn", "block", "none") if "2" in sections else ():
        try:
            _, state, step, batch, _, _ = build_step(1, f, f1, latent, remat)
            dt = time_step(step, state, batch)
            remat_ms[remat] = dt * 1e3
            print(f"remat={remat}: {dt*1e3:8.1f} ms/step", flush=True)
            del state, step, batch
        except Exception as e:
            print(f"remat={remat}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    out["remat_ms"] = {k: round(v, 1) for k, v in remat_ms.items()}

    # ---- 3. optimizer + EMA cost: step minus grad-only ----
    print("== optimizer/EMA cost ==", flush=True)
    if "3" in sections:
        models, state, step, batch, trainable, frozen = build_step(
            1, f, f1, latent, "save_attn")
        base = time_step(step, state, batch)
        # Free EVERYTHING from the step before the probe: with the fp32
        # masters + Adam moments + frozen tree + executables resident,
        # the next allocation on the 16 GB chip dies — through the relay
        # the OOM surfaces as an opaque "TPU backend error
        # (InvalidArgument)" on every subsequent dispatch.  The probe
        # rebuilds only the trees it needs (6.4 GB peak) from shapes.
        import gc

        tshapes = jax.eval_shape(lambda t: t, trainable)
        del models, state, step, batch, trainable, frozen
        gc.collect()
        # Optimizer + state-update cost measured DIRECTLY: a jitted
        # tx.update → apply_updates → global_norm over the real 406M-param
        # trainable tree with a synthetic gradient tree.  (A step-minus-
        # grad-only subtraction was tried first; the second 860M-backward
        # executable dies in the relay with an opaque TPU InvalidArgument
        # even with scalar-reduced outputs, while the full train step —
        # identical backward, same output sizes — runs fine.  The direct
        # probe is the cleaner number anyway: no subtraction noise, and it
        # prices exactly the elementwise Adam/clip/global-norm walk that
        # the table's "optimizer" row means.)
        import optax

        from seervideoldm_tpu.training.optim import build_optimizer

        opt_ms = None
        try:
            params = jax.jit(
                lambda: jax.tree.map(
                    lambda s: jnp.full(s.shape, 1e-2, s.dtype), tshapes))()
            grads = jax.jit(
                lambda: jax.tree.map(
                    lambda s: jnp.full(s.shape, 1e-4, s.dtype), tshapes))()
            tx2, _ = build_optimizer(params, 1e-4, warmup_steps=1,
                                     total_steps=1000, partitioned=True)
            opt_state = jax.jit(tx2.init)(params)

            @jax.jit
            def opt_apply(params, opt_state, grads):
                updates, opt_state = tx2.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                return new_params, opt_state, optax.global_norm(grads)

            p2, o2, gn = opt_apply(params, opt_state, grads)
            float(gn)
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                p2, o2, gn = opt_apply(params, opt_state, grads)
                float(gn)
                ts.append(time.perf_counter() - t0)
            opt_ms = float(np.median(ts)) * 1e3
            del p2, o2, grads, params, opt_state
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(f"opt-apply probe failed: {type(e).__name__}: {str(e)[:600]}",
                  flush=True)
        out["step_ms"] = round(base * 1e3, 1)
        if opt_ms is not None:
            out["optimizer_ema_ms"] = round(opt_ms, 1)
            print(f"full step {base*1e3:.1f} ms, optimizer/clip/state update "
                  f"(direct jitted probe, 406M fp32 + Adam) = {opt_ms:.1f} ms "
                  f"({opt_ms/(base*1e3)*100:.1f}% of the step)", flush=True)

    # ---- 4. per-site fwd+bwd vs floors ----
    if not args.skip_sites and "4" in sections:
        print("== per-site fwd+bwd (no remat; b=1 shapes) ==", flush=True)
        from seervideoldm_tpu.models.resnet3d import ResnetBlock3D
        from seervideoldm_tpu.models.transformer3d import SpatialTransformer3D

        sm = fb.softmax_s_per_elem()
        print(f"VMEM softmax: {sm*1e12:.2f} ps/element", flush=True)
        dtype = jnp.bfloat16
        rng = jax.random.PRNGKey(0)
        b = 1
        heads, L = 8, 2
        boc = (320, 640, 1280, 1280)
        hw = latent
        ctx = jax.random.normal(rng, (b, f, 77, 768), dtype)
        rows = []
        total_sites = 0.0
        for lvl, c in enumerate(boc[:-1]):
            d = c // heads
            s = hw * hw
            bf = b * f
            x_site = jax.random.normal(rng, (b, f, hw, hw, c), dtype)
            temb = jax.random.normal(rng, (b, 1280), dtype)
            n_attn = L + (L + 1)

            resnet = ResnetBlock3D(in_channels=c, out_channels=c,
                                   temb_channels=1280, dtype=dtype)
            p = jax.tree.map(lambda q: q.astype(dtype),
                             resnet.init(rng, x_site, temb))
            t_res = bench_scan_vjp(
                lambda p, h: resnet.apply(p, h, temb), p, x_site, False)

            text_attn = SpatialTransformer3D(
                c, heads, d, depth=1, context_dim=768,
                text_frame_condition=True, dtype=dtype)
            p = jax.tree.map(lambda q: q.astype(dtype),
                             text_attn.init(rng, x_site, ctx))
            t_text = bench_scan_vjp(
                lambda p, h: text_attn.apply(p, h, ctx), p, x_site, False)

            temp_attn = SpatialTransformer3D(c, heads, d, depth=1,
                                             temporal=True, causal=True,
                                             dtype=dtype)
            p = jax.tree.map(lambda q: q.astype(dtype),
                             temp_attn.init(rng, x_site))
            t_temp = bench_scan_vjp(
                lambda p, h: temp_attn.apply(p, h), p, x_site, True)

            # floors: frozen linears x2, trainable linears x3, attention
            # matmuls x3.5 (flash recompute), softmax x2, resnet x2
            fl_text = (2.0 * (fb.lin(bf * s, c, c) * 6
                              + fb.lin(bf * 77, 768, c) * 2
                              + fb.lin(bf * s, c, 4 * c) * 2
                              + fb.lin(bf * s, 4 * c, c))
                       + 3.5 * (fb.attn_mm(bf * heads, s, s, d)
                                + fb.attn_mm(bf * heads, s, 77, d))
                       + 2 * sm * (bf * heads * s * (s + 77)) * 1e3)
            ws = 8 if hw // 8 >= 4 else 4
            if hw <= 4:
                n_t = m_t = f * s
                groups = b * heads
            else:
                n_t = m_t = f * ws * ws
                groups = b * heads * s // (ws * ws)
            fl_temp = (3.0 * (fb.lin(bf * s, c, c) * 6
                              + fb.lin(bf * s, c, 4 * c) * 2
                              + fb.lin(bf * s, 4 * c, c))
                       + 3.5 * fb.attn_mm(groups, n_t, m_t, d) * 0.5
                       + 2 * sm * (groups * n_t * m_t) * 0.5 * 1e3)
            fl_res = 2.0 * fb.resnet_floor(bf * s, c, c)
            rows.append(dict(
                level=f"L{lvl}", res_ms=t_res * 1e3, res_floor=fl_res,
                text_ms=t_text * 1e3, text_floor=fl_text,
                temp_ms=t_temp * 1e3, temp_floor=fl_temp,
                n_attn=n_attn, n_res=L + L + 1))
            total_sites += (n_attn * (t_text + t_temp) * 1e3
                            + (L + L + 1) * t_res * 1e3)
            hw //= 2
        print(f"{'site':<16}{'ms':>8}{'floor':>8}{'act/floor':>10}")
        for r in rows:
            for kind in ("res", "text", "temp"):
                print(f"{r['level']+' '+kind:<16}{r[kind+'_ms']:>8.2f}"
                      f"{r[kind+'_floor']:>8.2f}"
                      f"{r[kind+'_ms']/r[kind+'_floor']:>10.2f}")
        out["site_rows"] = rows
        out["sites_sum_ms"] = round(total_sites, 1)
        print(f"sum of L0-L2 sites (fwd+bwd, no remat): {total_sites:.1f} ms "
              f"vs remat=none step {remat_ms.get('none', float('nan')):.1f} "
              f"ms (residual: L3+mid, fstext, loss/eps glue)", flush=True)

    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
