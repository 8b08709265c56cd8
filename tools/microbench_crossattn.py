"""Microbench: per-frame text cross-attention at the 512px L0 hot shape.

q: (b·f·heads, 4096, 40), kv: 77 CLIP tokens — a degenerate q-bound shape
(VERDICT r3 item #4; reference hot spot ``seer/models/attention.py:308-327``).
Compares the flash Pallas kernel vs the XLA einsum path vs einsum without
head split (packed logits), carry-chained to prevent scan hoisting.

Run on the real chip:  python tools/microbench_crossattn.py
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")  # run as `python tools/microbench_crossattn.py`

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])  # relay sync
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0)


def chain(body, n_iter):
    """Carry-chain body over n_iter iterations inside one jit."""

    def run(q, k, v):
        def step(carry, _):
            out = body(carry, k, v)
            return out, ()

        out, _ = jax.lax.scan(step, q, None, length=n_iter)
        return out.mean()

    return jax.jit(run)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bf", type=int, default=24)  # b(CFG)=2 x f=12
    parser.add_argument("--seq", type=int, default=4096)
    parser.add_argument("--kv", type=int, default=77)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--dim_head", type=int, default=40)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from seervideoldm_tpu.ops.pallas.flash_attention import flash_attention

    dtype = jnp.bfloat16
    bf, n, m, h, d = args.bf, args.seq, args.kv, args.heads, args.dim_head
    scale = d**-0.5
    rng = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (bf, h, n, d), dtype)
    k = jax.random.normal(kk, (bf, h, m, d), dtype)
    v = jax.random.normal(kv_, (bf, h, m, d), dtype)

    def flash_body(q, k, v):
        return flash_attention(q, k, v, scale, False).astype(q.dtype)

    def einsum_body(q, k, v):
        logits = jnp.einsum("...nd,...md->...nm", q, k,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("...nm,...md->...nd", p, v)

    def einsum_f32softmax_body(q, k, v):
        # variant: keep p in fp32 for the second matmul
        logits = jnp.einsum("...nd,...md->...nm", q, k,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("...nm,...md->...nd", p,
                          v.astype(jnp.float32)).astype(q.dtype)

    results = {}
    for name, body in (("flash", flash_body), ("einsum", einsum_body),
                       ("einsum_f32pv", einsum_f32softmax_body)):
        fn = chain(body, args.iters)
        dt = timed(fn, q, k, v)
        per_call = dt / args.iters * 1000
        results[name] = per_call
        print(f"{name:16s}: {per_call:8.3f} ms/call")

    best = min(results, key=results.get)
    print(f"best: {best} ({results[best]:.3f} ms)")


if __name__ == "__main__":
    main()
