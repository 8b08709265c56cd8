"""Microbench the fused LN->GEGLU-FF->residual kernel (ln_geglu_ff) vs
the unfused LayerNorm + geglu_ff-kernel + residual-add chain it replaces.

Every transformer FF site reads ``x + FF(LN(x))`` (transformer3d.py), so
the fused kernel's LN prologue and residual epilogue save two full HBM
round trips per site at zero extra traffic.  Shapes = the production FF
sites from the 512px floor budget.  Two-N scan deltas cancel the fixed
relay dispatch cost (same harness as tools/floor_budget.py).

Run on the real chip: python tools/microbench_ln_ff.py [--res 256]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from seervideoldm_tpu.ops.pallas.geglu_ff import (
    _LN_EPS, geglu_ff, geglu_ff_supported, ln_geglu_ff)


def timed_scan(fn, x, args, n):
    @jax.jit
    def run(x):
        def body(c, _):
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


def unfused(x, gamma, beta, w1, b1, w2, b2):
    """ops/norms.LayerNorm numerics + the r4 fused-GEGLU kernel + residual
    add — exactly what the FF sites ran before the ln fusion."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    ln = (x32 - mean) / jnp.sqrt(var + _LN_EPS)
    ln = (ln * gamma + beta).astype(x.dtype)
    return geglu_ff(ln, w1, b1, w2, b2) + x


def main():
    res = 256 if "--res" in sys.argv and "256" in sys.argv else 512
    hw = 32 if res == 256 else 64
    b, f = 2, 12
    sites = [
        (f"L0 {res}px", b * f * hw * hw, 320),
        (f"L1 {res}px", b * f * (hw // 2) ** 2, 640),
    ]
    rng = jax.random.PRNGKey(0)
    rows = []
    for label, n, c in sites:
        inner = 4 * c
        if not geglu_ff_supported(n, c, inner, jnp.bfloat16):
            print(f"{label}: unsupported, skipped")
            continue
        ks = jax.random.split(rng, 6)
        x = jax.random.normal(ks[0], (n, c), jnp.bfloat16)
        gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
        beta = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
        w1 = jax.random.normal(ks[3], (c, 2 * inner), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
        w2 = jax.random.normal(ks[4], (inner, c), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((c,), jnp.bfloat16)
        args = (gamma, beta, w1, b1, w2, b2)
        t_un = delta_ms(unfused, x, args)
        t_f = delta_ms(ln_geglu_ff, x, args)
        rows.append({"site": label, "n": n, "c": c,
                     "unfused_ms": round(t_un, 3),
                     "fused_ms": round(t_f, 3),
                     "speedup": round(t_un / t_f, 3)})
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
