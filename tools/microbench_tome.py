"""Microbench: ToMe merge/attend/unmerge vs full attention at the 512px-L0
spatial self-attention shape.

Times the full BasicTextTransformerBlock3D self-attention site components
at (b·f=24, 64x64 tokens, c=320, 8 heads x d40): the flash self-attention at
N=4096 vs N=4096·(1-r) plus the ToMe matching/merge/unmerge overhead.
Carry-chained scan (N iters) so per-dispatch relay cost amortizes out.

Run on the real chip:  python tools/microbench_tome.py [--ratio 0.5]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def amortized(fn, x, iters):
    """Carry-chain fn over iters inside one jit; returns seconds/iter."""

    def run(x0):
        def step(carry, _):
            return fn(carry), ()

        out, _ = jax.lax.scan(step, x0, None, length=iters)
        return out.mean()

    jit_run = jax.jit(run)
    float(jit_run(x))  # compile + sync
    t0 = time.perf_counter()
    float(jit_run(x))
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bf", type=int, default=24)
    parser.add_argument("--hw", type=int, default=64)
    parser.add_argument("--dim", type=int, default=320)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--ratio", type=float, default=0.5)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from seervideoldm_tpu.ops.attention import dot_product_attention
    from seervideoldm_tpu.ops.tome import bipartite_soft_matching_2d

    dtype = jnp.bfloat16
    bf, hw, c, heads = args.bf, args.hw, args.dim, args.heads
    d = c // heads
    n = hw * hw
    r = int(args.ratio * n)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bf, n, c), dtype)

    def attn(tokens):
        nt = tokens.shape[1]
        q = tokens.reshape(bf, nt, heads, d).transpose(0, 2, 1, 3)
        out = dot_product_attention(q, q, q, scale=d**-0.5)
        return out.transpose(0, 2, 1, 3).reshape(bf, nt, c)

    def full(tokens):
        return attn(tokens) * 0.999 + tokens * 0.001  # keep the carry moving

    def tome(tokens):
        merge, unmerge = bipartite_soft_matching_2d(tokens, hw, hw, r)
        return unmerge(attn(merge(tokens))) * 0.999 + tokens * 0.001

    def match_only(tokens):
        merge, unmerge = bipartite_soft_matching_2d(tokens, hw, hw, r)
        return unmerge(merge(tokens)) * 0.999 + tokens * 0.001

    t_full = amortized(full, x, args.iters)
    t_tome = amortized(tome, x, args.iters)
    t_match = amortized(match_only, x, args.iters)
    print(f"shape: bf={bf} n={n} c={c} heads={heads} d={d} r={r}")
    print(f"full attention      : {t_full * 1e3:8.2f} ms")
    print(f"tome merge+attn+unm : {t_tome * 1e3:8.2f} ms"
          f"  ({t_full / t_tome:.2f}x)")
    print(f"match+merge+unmerge : {t_match * 1e3:8.2f} ms (overhead floor)")


if __name__ == "__main__":
    main()
