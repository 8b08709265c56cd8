"""Sweep the SWAT forward kernel's per-fori-iteration slice width
(_SLICE_TARGET): columns of w processed per loop step.

Bigger slices mean fewer fori_loop iterations and fewer dynamic-index
stores (better DMA pipelining) at the cost of more VMEM stack per
iteration — the per-window loop overhead the r4 verdict flagged.
Parity-neutral: the slice width only changes how the SAME per-window
computations are batched into loop iterations.

Run on the real chip:  python tools/probe_swat_slice.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import seervideoldm_tpu.ops.pallas.swat_attention as swat
from seervideoldm_tpu.ops.rotary import rotary_tables
from seervideoldm_tpu.utils.cache import enable_compilation_cache


def bench(fn, x, iters=3):
    def timed(n_inner):
        @jax.jit
        def scanned(x):
            def body(h, _):
                return fn(h).astype(h.dtype), ()

            h, _ = jax.lax.scan(body, x, None, length=n_inner)
            return jnp.sum(h.astype(jnp.float32))

        float(scanned(x))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(scanned(x))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    return max(timed(50) - timed(10), 1e-9) / 40


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    default = swat._SLICE_TARGET
    for label, bh, f, hw, d in [("L0", 16, 12, 64, 40), ("L1", 16, 12, 32, 80)]:
        ws = 8
        x = jax.random.normal(rng, (bh, f, hw, hw, d), jnp.bfloat16)
        cos, sin = rotary_tables(f, hw, hw, d, min(32, d))
        scale = d ** -0.5
        base = None
        for target in (8, 16, 32, 64):
            if target > hw:
                continue
            swat._SLICE_TARGET = target
            try:
                t = bench(lambda h: swat.swat_attention_tables(
                    h, h, h, cos, sin, scale, True, ws), x)
            except Exception as e:
                print(f"{label} sw={target}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            finally:
                swat._SLICE_TARGET = default
            if base is None:
                base = t
            print(f"{label} sw={target:3d}: {t*1e3:7.3f} ms "
                  f"({'%.2fx' % (base / t)})", flush=True)


if __name__ == "__main__":
    main()
