"""One-off probe: does the fused GEGLU kernel win at the c=1280 FF sites?

The shipped dispatch caps resident weights at 12 MB so c=1280 (39 MB
W1+W2) falls back to XLA.  v5e has 128 MB VMEM/core, so a single-shot
variant with ~55 MB resident is worth measuring before committing to a
weight-streaming kernel.  This monkeypatches the budgets and times the
production L2/L3 shapes (512px, b=2 CFG): kernel vs unfused XLA.

Run on the real chip:  python tools/probe_geglu_1280.py

MEASURED (2026-08-19, v5e): REJECTED.  Warm-cache reruns show the
single-shot kernel at ~1.0x the XLA chain (L2-spatial 1.700 -> 1.652 ms,
L2-temporal 1.639 -> 1.623; a first cold run's 1.18x did not reproduce),
and the L3 shape fails Mosaic's 16 MB scoped-vmem stack limit (37.5 MB
request).  At c=1280 the (tokens, 2*inner) intermediate is small relative
to the weight traffic, so XLA is already at the HBM floor; the 12 MB
weight-residency cap in ops/pallas/geglu_ff.py stays.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import seervideoldm_tpu.ops.pallas.geglu_ff as G
from seervideoldm_tpu.utils.cache import enable_compilation_cache


def timed_scan(fn, x, args, n):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c, *args), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c

    run(x).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def per_apply(fn, x, args):
    tA = timed_scan(fn, x, args, 10)
    tB = timed_scan(fn, x, args, 50)
    return (tB - tA) / 40


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    mult = 4
    for label, n, c in [("L2-spatial", 2 * 12 * 256, 1280),
                        ("L3-spatial", 2 * 12 * 64, 1280),
                        ("L2-temporal", 2 * 256 * 12, 1280)]:
        inner = mult * c
        x = jnp.asarray(rng.randn(n, c), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(c, 2 * inner) * 0.02, jnp.bfloat16)
        b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(inner, c) * 0.02, jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.bfloat16)
        args = (w1, b1, w2, b2)

        t_ref = per_apply(G._reference, x, args)

        # raise budgets so the kernel path engages at c=1280
        old_budget = G._W_VMEM_BUDGET
        G._W_VMEM_BUDGET = 80 * 1024 * 1024
        orig_pick = G._pick_blocks

        def patched_pick(n_, c_, inner_):
            budget = 100 * 1024 * 1024
            w_bytes = (c_ * 2 * inner_ + inner_ * c_) * 2
            for bt in (512, 256, 128):
                if n_ % bt != 0:
                    continue
                for ic in (inner_, inner_ // 2, inner_ // 4, G._INNER_BLOCK):
                    if ic <= 0 or inner_ % ic != 0 or ic % 128 != 0:
                        continue
                    per_tok = 8 * c_ + 10 * ic + (4 * c_ if ic < inner_ else 0)
                    if w_bytes + bt * per_tok <= budget:
                        return bt, ic
            return None, None

        G._pick_blocks = patched_pick
        try:
            sup = G.geglu_ff_supported(n, c, inner, x.dtype)
            if not sup:
                print(f"{label}: kernel unsupported even with raised budget")
                continue
            try:
                t_k = per_apply(G.geglu_ff, x, args)
                bt, ic = patched_pick(n, c, inner)
                print(f"{label}: n={n} c={c} XLA {t_ref*1e3:.3f} ms  "
                      f"kernel {t_k*1e3:.3f} ms  speedup {t_ref/t_k:.2f}x  "
                      f"(bt={bt}, ic={ic})")
            except Exception as e:  # VMEM OOM etc.
                print(f"{label}: kernel failed: {type(e).__name__}: {e}")
        finally:
            G._W_VMEM_BUDGET = old_budget
            G._pick_blocks = orig_pick


if __name__ == "__main__":
    main()
