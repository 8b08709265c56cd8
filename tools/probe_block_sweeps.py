"""Block-size sweeps for the two remaining hot kernels at 512px-L0.

1. Fused GEGLU FF: token-block bt (the shipped _pick_blocks caps at 512).
2. Flash spatial self-attention: the q-block score budget (shipped 4 MB
   -> bq=256 at kv=4096).

Run on the real chip:  python tools/probe_block_sweeps.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import seervideoldm_tpu.ops.pallas.flash_attention as fa
import seervideoldm_tpu.ops.pallas.geglu_ff as G
from seervideoldm_tpu.utils.cache import enable_compilation_cache


def timed_scan(fn, x, n, iters=3):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, time.perf_counter() - t0)
    return best


def per_apply(fn, x):
    return (timed_scan(fn, x, 50) - timed_scan(fn, x, 10)) / 40


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)

    # --- GEGLU at the L0 FF shape (tokens 98304, c 320, inner 1280) ---
    n, c = 98304, 320
    inner = 4 * c
    x = jnp.asarray(rng.randn(n, c), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(c, 2 * inner) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(inner, c) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.bfloat16)

    orig_pick = G._pick_blocks
    for bt in (256, 512, 1024, 2048):
        G._pick_blocks = lambda n_, c_, i_, _bt=bt: (_bt, i_)
        try:
            t = per_apply(lambda h: G.geglu_ff(h, w1, b1, w2, b2)
                          .astype(h.dtype), x)
            print(f"geglu bt={bt:5d}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"geglu bt={bt:5d}: FAILED {type(e).__name__}", flush=True)
        finally:
            G._pick_blocks = orig_pick

    # --- flash spatial self-attn at L0 (192 x 4096 x 40) ---
    q = jnp.asarray(rng.randn(192, 4096, 40), jnp.bfloat16)
    orig = fa._SCORE_BYTES_BUDGET
    for mb in (2, 4, 8, 16):
        fa._SCORE_BYTES_BUDGET = mb * 1024 * 1024
        try:
            t = per_apply(lambda h: fa.flash_attention(
                h, h, h, 40 ** -0.5, False).astype(h.dtype), q)
            bq = max(128, min(4096,
                              (fa._SCORE_BYTES_BUDGET // (4 * 4096))
                              // 128 * 128))
            print(f"flash budget={mb:2d}MB (bq={bq}): {t*1e3:7.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"flash budget={mb:2d}MB: FAILED {type(e).__name__}",
                  flush=True)
        finally:
            fa._SCORE_BYTES_BUDGET = orig


if __name__ == "__main__":
    main()
