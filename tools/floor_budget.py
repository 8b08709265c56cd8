"""Per-site 512px floor budget (VERDICT r3 task 1).

ONE table at the final config (b=2 CFG-doubled, f=12, 512px, production
dispatch thresholds) whose rows sum to the measured whole-UNet step, with
each attention site's matmul floor vs actual — bounding how much headroom
remains at this architecture/precision.

Per-site actuals are measured exactly like tools/profile_blocks.py
(single-dispatch lax.scan of N inner applications so the ~31 ms relay
dispatch overhead amortizes to noise).  Floors are analytic matmul times
from utils/flops.py's per-op counts at v5e bf16 peak, derated by MXU lane
occupancy on the attention matmuls' d_head dimension
(occ = d / (ceil(d/128)*128): d=40 -> 31%, d=80 -> 62.5%, d=160 -> 62.5%),
plus a MEASURED pure-softmax scan at the site's score shape (the VPU work
no matmul scheduling can remove).

Run on the real chip:  python tools/floor_budget.py
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.cache import enable_compilation_cache

N_INNER = 20
PEAK = 197e12  # v5e bf16
HBM_BW = 819e9  # v5e HBM bandwidth


def bench_scan(apply_fn, params, x, iters=3):
    """True seconds per application via a two-N scan delta.

    A single N-amortized scan still carries the fixed ~31-40 ms relay
    dispatch+sync cost divided by N (~1.8 ms/site phantom at N=20 — larger
    than a whole GroupNorm).  Timing N=10 and N=50 and dividing the delta
    by 40 cancels the fixed cost exactly (STATUS r3 'measurement honesty'
    note, now enforced by the harness instead of footnoted)."""

    def timed(n_inner):
        @jax.jit
        def scanned(params, x):
            def body(h, _):
                return apply_fn(params, h).astype(h.dtype), ()

            h, _ = jax.lax.scan(body, x, None, length=n_inner)
            return jnp.sum(h.astype(jnp.float32))

        float(scanned(params, x))  # compile+warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(scanned(params, x))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    lo, hi = 10, 50
    return max(timed(hi) - timed(lo), 1e-9) / (hi - lo)


def occ(d: int) -> float:
    """MXU lane occupancy of a matmul whose contraction/minor dim is d."""
    return d / (math.ceil(d / 128) * 128)


def lin(tokens: float, din: int, dout: int) -> float:
    """Analytic ms of a (tokens, din) @ (din, dout) matmul at derated peak."""
    fl = 2.0 * tokens * din * dout
    return fl / (PEAK * min(occ(din), occ(dout))) * 1e3


def attn_mm(bh: float, n: float, m: float, d: int) -> float:
    """ms of QK^T + P@V at d-occupancy-derated peak."""
    fl = 2.0 * bh * n * m * d * 2
    return fl / (PEAK * occ(d)) * 1e3


def hbm_ms(elems: float, n_passes: float, bytes_per: int = 2) -> float:
    """ms to move elems*bytes_per bytes n_passes times at HBM bandwidth."""
    return elems * bytes_per * n_passes / HBM_BW * 1e3


def resnet_floor(tokens: float, cin: int, cout: int) -> float:
    """Analytic resnet-block floor: both 3x3 convs (+ the 1x1 shortcut when
    cin != cout) as matmuls at occupancy-derated peak, PLUS the unavoidable
    HBM passes of the two fp32-GN islands and the residual add.

    The convs' own input/output traffic overlaps the MXU (they are
    compute-bound at these channel widths), so only the NON-conv passes
    count as bandwidth floor: GN1 read+write over cin, GN2 read+write over
    cout, residual read of x (cin) + final write (cout).  SiLU and the
    temb broadcast-add fuse into their neighbors.  models/resnet3d.py."""
    mm = lin(tokens, 9 * cin, cout) + lin(tokens, 9 * cout, cout)
    if cin != cout:
        mm += lin(tokens, cin, cout)
    bw = (hbm_ms(tokens * cin, 2) + hbm_ms(tokens * cout, 2)
          + hbm_ms(tokens * cin, 1) + hbm_ms(tokens * cout, 1))
    return mm + bw


def softmax_s_per_elem(iters=3) -> float:
    """Measured seconds/element of a VMEM-RESIDENT fp32 softmax pass
    (max, exp(s-m), sum) — the VPU work the flash kernels pay per score.

    A standalone jnp.softmax over an HBM array measures BANDWIDTH, not the
    VPU: the kernels' scores never leave VMEM.  This pallas microbench
    loads one (512, 4096) fp32 block (8 MB) and re-softmaxes it in VMEM
    REPS times; the per-element time is the calibration constant used for
    every site's softmax floor.
    """
    from functools import partial

    from jax.experimental import pallas as pl

    rows, cols = 256, 2048  # 2 MB block: input + exp temporaries fit VMEM

    def kernel(x_ref, o_ref, *, reps):
        def body(i, s):
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=1, keepdims=True)
            # feed the result back so iterations can't be elided
            return e / jnp.where(l == 0.0, 1.0, l) + 1e-6

        s = jax.lax.fori_loop(0, reps, body, x_ref[...])
        o_ref[...] = jnp.sum(s, axis=1, keepdims=True)

    def timed(reps):
        run = jax.jit(pl.pallas_call(
            partial(kernel, reps=reps),
            out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ))
        x = jax.random.normal(jax.random.PRNGKey(0), (rows, cols),
                              jnp.float32)
        float(jnp.sum(run(x)))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.sum(run(x)))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # two-point delta cancels the fixed dispatch/sync cost per jitted call
    # (~31 ms through the relay — larger than the small-REPS kernel itself)
    lo, hi = 2048, 8192
    dt = timed(hi) - timed(lo)
    return max(dt, 1e-9) / ((hi - lo) * rows * cols)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--batch", type=int, default=2,
                        help="CFG-doubled UNet batch")
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    enable_compilation_cache()

    from seervideoldm_tpu.models.resnet3d import ResnetBlock3D
    from seervideoldm_tpu.models.transformer3d import SpatialTransformer3D
    from seervideoldm_tpu.models.unet3d import SeerUNet

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    b, f = args.batch, args.frames
    latent = args.resolution // 8
    boc = (320, 640, 1280, 1280)
    heads = 8
    L = 2  # layers_per_block

    # ---- whole-UNet measured step (the number the rows must sum to) ----
    unet = SeerUNet(dtype=dtype)
    x = jax.random.normal(rng, (b, f, latent, latent, 4), dtype)
    ctx = jax.random.normal(rng, (b, f, 77, 768), dtype)
    t_arr = jnp.full((b,), 500, jnp.int32)
    from seervideoldm_tpu.utils.inits import jit_init

    up = jit_init(lambda k: unet.init(
        k, jnp.zeros((1, f, 8, 8, 4), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, f, 77, 768), dtype), 0), rng)
    up = jax.tree.map(lambda p: p.astype(dtype), up)

    def unet_timed(n_inner):
        @jax.jit
        def unet_scan(params, x):
            def body(h, _):
                out = unet.apply({"params": params}, h, t_arr, ctx, 0)
                return out.astype(h.dtype), ()

            h, _ = jax.lax.scan(body, x, None, length=n_inner)
            return jnp.sum(h.astype(jnp.float32))

        float(unet_scan(up, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(unet_scan(up, x))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # two-N delta (see bench_scan): cancels the fixed relay dispatch cost
    step_ms = (unet_timed(15) - unet_timed(5)) / 10 * 1e3
    print(f"whole UNet forward: {step_ms:.1f} ms", flush=True)

    # ---- VPU softmax calibration (VMEM-resident, see softmax_s_per_elem)
    sm_per_elem = softmax_s_per_elem()
    print(f"VMEM softmax: {sm_per_elem*1e12:.2f} ps/element", flush=True)

    # ---- per-site measurements + analytic floors ----
    rows = []
    hw = latent
    for lvl, c in enumerate(boc[:-1]):
        d = c // heads
        s = hw * hw
        bf = b * f
        # site counts in a full forward: down L + up (L+1) triplets
        n_attn = L + (L + 1)
        # resnets: down L (+1ch-change) + up (L+1) with concat inputs
        x_site = jax.random.normal(rng, (b, f, hw, hw, c), dtype)
        temb = jax.random.normal(rng, (b, 1280), dtype)

        resnet = ResnetBlock3D(in_channels=c, out_channels=c,
                               temb_channels=1280, dtype=dtype)
        p = jax.tree.map(lambda q: q.astype(dtype),
                         resnet.init(rng, x_site, temb))
        t_res = bench_scan(lambda p, h: resnet.apply(p, h, temb), p, x_site)

        # up-path resnet: concat skip doubles the input channels
        resnet_up = ResnetBlock3D(in_channels=2 * c, out_channels=c,
                                  temb_channels=1280, dtype=dtype)
        x_up = jnp.concatenate([x_site, x_site], axis=-1)
        p_up = jax.tree.map(lambda q: q.astype(dtype),
                            resnet_up.init(rng, x_up, temb))

        t_res_up = bench_scan(
            lambda p, h, _m=resnet_up, _t=temb: _m.apply(
                p, jnp.concatenate([h, h], -1), _t),
            p_up, x_site)

        text_attn = SpatialTransformer3D(c, heads, d, depth=1,
                                         context_dim=768,
                                         text_frame_condition=True,
                                         dtype=dtype)
        p = jax.tree.map(lambda q: q.astype(dtype),
                         text_attn.init(rng, x_site, ctx))
        t_text = bench_scan(lambda p, h: text_attn.apply(p, h, ctx), p,
                            x_site)

        temp_attn = SpatialTransformer3D(c, heads, d, depth=1, temporal=True,
                                         causal=True, dtype=dtype)
        p = jax.tree.map(lambda q: q.astype(dtype),
                         temp_attn.init(rng, x_site))
        t_temp = bench_scan(lambda p, h: temp_attn.apply(p, h), p, x_site)

        # --- analytic floors ---
        # text site: proj_in/out (1x1 conv = linear) + self qkv/out +
        # self-attn + cross q/out + cross kv + cross-attn + GEGLU FF
        fl_text = (lin(bf * s, c, c) * 2          # proj_in + proj_out
                   + lin(bf * s, c, c) * 4        # self q,k,v,out
                   + attn_mm(bf * heads, s, s, d)
                   + lin(bf * s, c, c) * 2        # cross q,out
                   + lin(bf * 77, 768, c) * 2     # cross k,v
                   + attn_mm(bf * heads, s, 77, d)
                   + lin(bf * s, c, 4 * c) * 2 + lin(bf * s, 4 * c, c))
        sm_text = sm_per_elem * (bf * heads * s * s) * 1e3
        # temporal site: window ws=8 at hw>=32 else 4; full if hw<=4
        if hw <= 4:
            n_t, m_t, groups = f * s, f * s, b * heads
        else:
            ws = 8 if hw // 8 >= 4 else 4
            n_t = m_t = f * ws * ws
            groups = b * heads * s // (ws * ws)
        fl_temp = (lin(bf * s, c, c) * 2
                   + lin(bf * s, c, c) * 4
                   + attn_mm(groups, n_t, m_t, d) * 0.5  # causal half
                   + lin(bf * s, c, 4 * c) * 2 + lin(bf * s, 4 * c, c))
        sm_temp = sm_per_elem * (groups * n_t * m_t) * 0.5 * 1e3

        rows.append(dict(level=f"L{lvl}", hw=hw, ch=c, d=d,
                         n_triplets=n_attn,
                         res_down_ms=t_res * 1e3, res_up_ms=t_res_up * 1e3,
                         res_down_floor_ms=resnet_floor(bf * s, c, c),
                         res_up_floor_ms=resnet_floor(bf * s, 2 * c, c),
                         text_ms=t_text * 1e3, temp_ms=t_temp * 1e3,
                         text_floor_ms=fl_text + sm_text,
                         temp_floor_ms=fl_temp + sm_temp,
                         text_sm_ms=sm_text, temp_sm_ms=sm_temp))
        hw //= 2

    # L3 + mid at hw (now latent/8)
    c = boc[-1]
    d = c // heads
    x_site = jax.random.normal(rng, (b, f, hw, hw, c), dtype)
    temb = jax.random.normal(rng, (b, 1280), dtype)
    resnet = ResnetBlock3D(in_channels=c, out_channels=c, temb_channels=1280,
                           dtype=dtype)
    p = jax.tree.map(lambda q: q.astype(dtype),
                     resnet.init(rng, x_site, temb))
    t_res3 = bench_scan(lambda p, h: resnet.apply(p, h, temb), p, x_site)
    text_attn = SpatialTransformer3D(c, heads, d, depth=1, context_dim=768,
                                     text_frame_condition=True, dtype=dtype)
    p = jax.tree.map(lambda q: q.astype(dtype),
                     text_attn.init(rng, x_site, ctx))
    t_text3 = bench_scan(lambda p, h: text_attn.apply(p, h, ctx), p, x_site)
    temp_attn = SpatialTransformer3D(c, heads, d, depth=1, temporal=True,
                                     causal=True, dtype=dtype)
    p = jax.tree.map(lambda q: q.astype(dtype),
                     temp_attn.init(rng, x_site))
    t_temp3 = bench_scan(lambda p, h: temp_attn.apply(p, h), p, x_site)

    # ---- assemble the budget ----
    total = 0.0
    print(f"\nper-site budget @ {args.resolution}px b={b} f={f} "
          f"(counts x measured ms):")
    print(f"{'site':<22}{'count':>6}{'ms/site':>9}{'total':>8}"
          f"{'floor':>8}{'act/floor':>10}")
    for r in rows:
        n_down, n_up = L, L + 1
        res_total = n_down * r["res_down_ms"] + n_up * r["res_up_ms"]
        res_floor = (n_down * r["res_down_floor_ms"]
                     + n_up * r["res_up_floor_ms"])
        text_total = r["n_triplets"] * r["text_ms"]
        temp_total = r["n_triplets"] * r["temp_ms"]
        total += res_total + text_total + temp_total
        print(f"{r['level']+' resnet':<22}{n_down+n_up:>6}"
              f"{(res_total/(n_down+n_up)):>9.2f}{res_total:>8.1f}"
              f"{res_floor:>8.1f}{res_total/res_floor:>10.2f}")
        print(f"{r['level']+' text-attn':<22}{r['n_triplets']:>6}"
              f"{r['text_ms']:>9.2f}{text_total:>8.1f}"
              f"{r['n_triplets']*r['text_floor_ms']:>8.1f}"
              f"{r['text_ms']/r['text_floor_ms']:>10.2f}")
        print(f"{r['level']+' temporal-attn':<22}{r['n_triplets']:>6}"
              f"{r['temp_ms']:>9.2f}{temp_total:>8.1f}"
              f"{r['n_triplets']*r['temp_floor_ms']:>8.1f}"
              f"{r['temp_ms']/r['temp_floor_ms']:>10.2f}")
    # L3: down 2 + up 3 resnets; mid: 2 resnets + 1 attn pair
    n_res3 = L + (L + 1) + 2
    l3_res = n_res3 * t_res3 * 1e3
    mid_attn = (t_text3 + t_temp3) * 1e3
    # mid attn floors at the deepest hw (c=1280, d=160)
    s3 = hw * hw
    bf = b * f
    fl_text3 = (lin(bf * s3, c, c) * 2 + lin(bf * s3, c, c) * 4
                + attn_mm(bf * heads, s3, s3, d)
                + lin(bf * s3, c, c) * 2 + lin(bf * 77, 768, c) * 2
                + attn_mm(bf * heads, s3, 77, d)
                + lin(bf * s3, c, 4 * c) * 2 + lin(bf * s3, 4 * c, c)
                + sm_per_elem * (bf * heads * s3 * s3) * 1e3)
    if hw <= 4:
        n_t3, m_t3, groups3 = f * s3, f * s3, b * heads
    else:
        ws3 = 8 if hw // 8 >= 4 else 4
        n_t3 = m_t3 = f * ws3 * ws3
        groups3 = b * heads * s3 // (ws3 * ws3)
    fl_temp3 = (lin(bf * s3, c, c) * 2 + lin(bf * s3, c, c) * 4
                + attn_mm(groups3, n_t3, m_t3, d) * 0.5
                + lin(bf * s3, c, 4 * c) * 2 + lin(bf * s3, 4 * c, c)
                + sm_per_elem * (groups3 * n_t3 * m_t3) * 0.5 * 1e3)
    fl_res3 = resnet_floor(bf * s3, c, c)
    mid_floor = fl_text3 + fl_temp3
    total += l3_res + mid_attn
    print(f"{'L3+mid resnet':<22}{n_res3:>6}{t_res3*1e3:>9.2f}"
          f"{l3_res:>8.1f}{n_res3*fl_res3:>8.1f}"
          f"{t_res3*1e3/fl_res3:>10.2f}")
    print(f"{'mid attn pair':<22}{1:>6}{mid_attn:>9.2f}{mid_attn:>8.1f}"
          f"{mid_floor:>8.1f}{mid_attn/mid_floor:>10.2f}")
    residual = step_ms - total
    print(f"{'SUM of isolated sites':<22}{'':>6}{'':>9}{total:>8.1f}")
    print(f"{'measured in-graph step':<22}{'':>6}{'':>9}{step_ms:>8.1f}")
    print(f"{'in-graph/isolated':<22}{'':>6}{'':>9}"
          f"{step_ms/total:>8.2f}")
    if residual >= 0:
        print(f"residual (conv_in/out, samplers, temb, GN): "
              f"{residual:.1f} ms ({100*residual/step_ms:.1f}%)")
    else:
        print("isolated-site sum EXCEEDS the fused step: each single-block "
              "scan pays its own HBM boundary traffic exposed, while the "
              "fused graph pipelines one block's DMA under its neighbors' "
              "compute — per-site ms are upper bounds; shares are what "
              "matter.")

    # headroom: actual-vs-floor gap summed over attention sites.  Scaled by
    # the in-graph/isolated ratio this bounds what better attention code
    # could recover inside the fused step; the floor itself (matmuls at
    # occupancy-derated peak + VMEM softmax) is unreachable by scheduling
    # alone.
    gap = sum(r["n_triplets"] * (r["text_ms"] - r["text_floor_ms"]
                                 + r["temp_ms"] - r["temp_floor_ms"])
              for r in rows)
    gap += mid_attn - mid_floor
    res_gap = sum(L * (r["res_down_ms"] - r["res_down_floor_ms"])
                  + (L + 1) * (r["res_up_ms"] - r["res_up_floor_ms"])
                  for r in rows)
    res_gap += n_res3 * (t_res3 * 1e3 - fl_res3)
    scale = step_ms / total
    floor_sum = total - gap - res_gap
    print(f"\nattention actual-minus-floor: {gap:.1f} ms isolated, "
          f"~{gap*scale:.1f} ms in-graph "
          f"({100*gap*scale/step_ms:.1f}% of the step)")
    print(f"resnet actual-minus-floor: {res_gap:.1f} ms isolated, "
          f"~{res_gap*scale:.1f} ms in-graph "
          f"({100*res_gap*scale/step_ms:.1f}% of the step)")
    print(f"every-row floor sum: {floor_sum:.1f} ms -> step/floor = "
          f"{step_ms/floor_sum:.3f} (slack {100*(step_ms-floor_sum*scale)/step_ms:.1f}%"
          f" in-graph)")
    if args.json:
        print(json.dumps({"step_ms": step_ms, "site_sum_ms": total,
                          "residual_ms": residual, "attn_headroom_ms": gap,
                          "attn_headroom_ingraph_ms": gap * scale,
                          "resnet_headroom_ms": res_gap,
                          "floor_sum_ms": floor_sum,
                          "sm_ps_per_elem": sm_per_elem * 1e12,
                          "rows": rows}))


if __name__ == "__main__":
    main()
