"""Probe the temporal/text site glue: GN + proj_in/proj_out 1x1 convs.

The temporal-site decomposition (tools/probe_temporal_site.py) leaves a
~2.2 ms residual = GN + two 1x1 convs + residual adds at 512px-L0, vs a
~0.6 ms analytic floor.  This probe measures: the 1x1 InflatedConv alone,
an einsum equivalent, the composed GN->proj_in chain, and a full
mini-wrapper (GN -> proj_in -> identity -> zero proj_out + residual) to
see what XLA fuses and where the time actually goes.

Run on the real chip:  python tools/probe_proj_glue.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import flax.linen as nn
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

    return max(timed(50) - timed(10), 1e-9) / 40


def main():
    enable_compilation_cache()
    from seervideoldm_tpu.ops.conv import InflatedConv
    from seervideoldm_tpu.ops.norms import GroupNorm

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    b, f, hw, c = 2, 12, 64, 320
    x5 = jax.random.normal(rng, (b, f, hw, hw, c), dtype)

    res = {}

    conv = InflatedConv(c, (1, 1), padding=0, dtype=dtype)
    p = jax.tree.map(lambda q: q.astype(dtype), conv.init(rng, x5))
    res["conv1x1"] = bench_scan(lambda p, h: conv.apply(p, h), p, x5)

    class EinsumProj(nn.Module):
        @nn.compact
        def __call__(self, h):
            w = self.param("w", nn.initializers.lecun_normal(), (c, c),
                           jnp.float32).astype(dtype)
            bb = self.param("b", nn.initializers.zeros, (c,),
                            jnp.float32).astype(dtype)
            return jnp.einsum("bfhwc,cd->bfhwd", h, w) + bb

    m = EinsumProj()
    p = jax.tree.map(lambda q: q.astype(dtype), m.init(rng, x5))
    res["einsum1x1"] = bench_scan(lambda p, h: m.apply(p, h), p, x5)

    class GnProj(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = GroupNorm(num_groups=32, dtype=dtype)(h)
            return InflatedConv(c, (1, 1), padding=0, dtype=dtype)(h)

    m = GnProj()
    p = jax.tree.map(lambda q: q.astype(dtype), m.init(rng, x5))
    res["gn+proj"] = bench_scan(lambda p, h: m.apply(p, h), p, x5)

    class Wrapper(nn.Module):
        """The SpatialTransformer3D shell with an identity block inside."""

        @nn.compact
        def __call__(self, h):
            res_in = h
            y = GroupNorm(num_groups=32, dtype=dtype)(h)
            y = InflatedConv(c, (1, 1), padding=0, name="proj_in",
                             dtype=dtype)(y)
            y = InflatedConv(c, (1, 1), padding=0, name="proj_out",
                             dtype=dtype)(y)
            return y + res_in

    m = Wrapper()
    p = jax.tree.map(lambda q: q.astype(dtype), m.init(rng, x5))
    res["wrapper"] = bench_scan(lambda p, h: m.apply(p, h), p, x5)

    for k, v in res.items():
        print(f"{k:10s} {v*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
