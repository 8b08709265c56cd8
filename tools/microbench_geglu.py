"""Microbench the fused GEGLU feed-forward kernel vs the unfused XLA chain.

Shapes = the production FF sites from the 512px floor budget (STATUS
round-4 item 10): spatial/text blocks run FF over (b*f, h*w, c) tokens,
temporal blocks over (b*h*w, f, c).  Two-N scan deltas cancel the fixed
relay dispatch cost (same harness as tools/floor_budget.py).

Run on the real chip: python tools/microbench_geglu.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from seervideoldm_tpu.ops.pallas.geglu_ff import (
    _reference, geglu_ff, geglu_ff_supported)


def timed_scan(fn, x, args, n):
    @jax.jit
    def run(x):
        def body(c, _):
            # feed output back (bf16 c-dim matches) to serialize iterations
            return fn(c, *args), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    run(x).block_until_ready()
    t0 = time.perf_counter()
    run(x).block_until_ready()
    return time.perf_counter() - t0


def delta_ms(fn, x, args, n1=8, n2=24):
    t1 = timed_scan(fn, x, args, n1)
    t2 = timed_scan(fn, x, args, n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    sites = [
        # (label, n_tokens, c)   b=2 CFG, f=12, 512px latents 64x64
        ("L0 spatial 512px", 2 * 12 * 64 * 64, 320),
        ("L0 temporal 512px", 2 * 64 * 64, 320),   # f=12 padded? n=8192*12? temporal FF is over (b*h*w, f, c) flattened -> n=2*4096*12
        ("L1 spatial 512px", 2 * 12 * 32 * 32, 640),
        ("L1 temporal 512px", 2 * 32 * 32 * 12, 640),
        ("L2 spatial 512px", 2 * 12 * 16 * 16, 1280),
    ]
    # fix the L0 temporal row: tokens = b*h*w*f
    sites[1] = ("L0 temporal 512px", 2 * 64 * 64 * 12, 320)

    results = []
    for label, n, c in sites:
        inner = 4 * c
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, c), jnp.bfloat16) * 0.5
        w1 = jax.random.normal(key, (c, 2 * inner), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
        w2 = jax.random.normal(key, (inner, c), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((c,), jnp.bfloat16)
        args = (w1, b1, w2, b2)
        sup = geglu_ff_supported(n, c, inner, x.dtype)
        xla_ms = delta_ms(_reference, x, args)
        fused_ms = delta_ms(geglu_ff, x, args) if sup else None
        # correctness spot check on chip
        if sup:
            ref = _reference(x, *args).astype(jnp.float32)
            out = geglu_ff(x, *args).astype(jnp.float32)
            rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        else:
            rel = None
        row = {"site": label, "n": n, "c": c, "supported": sup,
               "xla_ms": round(xla_ms, 3),
               "fused_ms": round(fused_ms, 3) if fused_ms else None,
               "speedup": round(xla_ms / fused_ms, 3) if fused_ms else None,
               "max_rel_err": rel}
        print(json.dumps(row))
        results.append(row)


if __name__ == "__main__":
    main()
