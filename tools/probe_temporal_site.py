"""Decompose the L0 temporal-attention site's 12.2 ms (floor-budget row)
into its components, separating parity-required VPU work (fp32 GN/LN
islands, rotary) from genuinely attackable overhead.

Components measured at the production 512px-L0 shape (b=2 CFG, f=12,
64x64, c=320, heads=8, d=40, ws=8), each with the two-N scan delta
harness (fixed relay dispatch cost cancels exactly):

  site     full SpatialTransformer3D(temporal=True)    (the budget row)
  wta      WindowTemporalAttention module (LN excluded)
  kernel   fused SWAT kernel alone (pre-rotated, rot_dim=0)
  rotary   apply_rotary on q AND k at (b, heads, n, d)
  qkvo     the 4 dense projections (to_q/to_k/to_v/to_out)
  gn       fp32-island GroupNorm at (b, f, h, w, c)
  ln       fp32-island LayerNorm at (b, n, c)
  ff       fused-GEGLU FeedForward at (b, n, c)
  projio   proj_in + proj_out 1x1 convs

Run on the real chip:  python tools/probe_temporal_site.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.cache import enable_compilation_cache


def bench_scan(apply_fn, params, x, iters=3):
    def timed(n_inner):
        @jax.jit
        def scanned(params, x):
            def body(h, _):
                return apply_fn(params, h).astype(h.dtype), ()

            h, _ = jax.lax.scan(body, x, None, length=n_inner)
            return jnp.sum(h.astype(jnp.float32))

        float(scanned(params, x))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(scanned(params, x))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    lo, hi = 10, 50
    return max(timed(hi) - timed(lo), 1e-9) / (hi - lo)


def main():
    enable_compilation_cache()
    from seervideoldm_tpu.models.transformer3d import (FeedForward,
                                                       SpatialTransformer3D)
    from seervideoldm_tpu.ops.attention import WindowTemporalAttention
    from seervideoldm_tpu.ops.norms import GroupNorm, LayerNorm
    from seervideoldm_tpu.ops.pallas.swat_attention import swat_attention
    from seervideoldm_tpu.ops.rotary import apply_rotary, rotary_freqs

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    b, f, hw, c, heads = 2, 12, 64, 320, 8
    d = c // heads
    n = f * hw * hw
    ws = 8
    scale = d ** -0.5

    x5 = jax.random.normal(rng, (b, f, hw, hw, c), dtype)
    x3 = x5.reshape(b, n, c)
    qk = jax.random.normal(rng, (b, heads, n, d), dtype)
    grid5 = jax.random.normal(rng, (b * heads, f, hw, hw, d), dtype)

    res = {}

    site = SpatialTransformer3D(c, heads, d, depth=1, temporal=True,
                                causal=True, dtype=dtype)
    p = jax.tree.map(lambda q: q.astype(dtype), site.init(rng, x5))
    res["site"] = bench_scan(lambda p, h: site.apply(p, h), p, x5)

    wta = WindowTemporalAttention(query_dim=c, heads=heads, dim_head=d,
                                  causal=True, dtype=dtype)
    p = jax.tree.map(lambda q: q.astype(dtype), wta.init(rng, x5))
    res["wta"] = bench_scan(lambda p, h: wta.apply(p, h), p, x5)

    res["kernel"] = bench_scan(
        lambda p, h: swat_attention(h, h, h, scale, True, ws, 0),
        {}, grid5)

    freqs = rotary_freqs(jnp.arange(n), min(32, d))

    def rot2(_, h):
        return apply_rotary(h, freqs) + apply_rotary(h + 1, freqs)

    res["rotary"] = bench_scan(rot2, {}, qk)

    import flax.linen as nn

    class QKVO(nn.Module):
        @nn.compact
        def __call__(self, h):
            q = nn.Dense(c, use_bias=False, dtype=dtype, name="q")(h)
            k = nn.Dense(c, use_bias=False, dtype=dtype, name="k")(h)
            v = nn.Dense(c, use_bias=False, dtype=dtype, name="v")(h)
            return nn.Dense(c, use_bias=True, dtype=dtype, name="o")(q * k + v)

    m = QKVO()
    p = jax.tree.map(lambda q: q.astype(dtype), m.init(rng, x3))
    res["qkvo"] = bench_scan(lambda p, h: m.apply(p, h), p, x3)

    gn = GroupNorm(num_groups=32, dtype=dtype)
    p = gn.init(rng, x5)
    res["gn"] = bench_scan(lambda p, h: gn.apply(p, h), p, x5)

    ln = LayerNorm()
    p = ln.init(rng, x3)
    res["ln"] = bench_scan(lambda p, h: ln.apply(p, h), p, x3)

    ff = FeedForward(c, dtype=dtype)
    p = jax.tree.map(lambda q: q.astype(dtype), ff.init(rng, x3))
    res["ff"] = bench_scan(lambda p, h: ff.apply(p, h), p, x3)

    for k, v in res.items():
        print(f"{k:8s} {v*1e3:7.3f} ms")
    acc = (res["wta"] + 2 * res["ln"] + res["ff"] + res["gn"])
    print(f"wta+2ln+ff+gn = {acc*1e3:.3f} vs site {res['site']*1e3:.3f} "
          f"(residual = proj_in/out + adds: {(res['site']-acc)*1e3:.3f})")
    inner = (res["kernel"] + res["rotary"] + res["qkvo"])
    print(f"kernel+rotary+qkvo = {inner*1e3:.3f} vs wta {res['wta']*1e3:.3f} "
          f"(residual = split/merge + windows: {(res['wta']-inner)*1e3:.3f})")


if __name__ == "__main__":
    main()
