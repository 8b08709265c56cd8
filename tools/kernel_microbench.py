"""Microbenchmarks for the Pallas attention kernels at the 512px hot shapes.

Times kernel variants in isolation (single-dispatch lax.scan amortization,
scalar-sync — the axon relay rules from profile_blocks) to guide the perf
pass: mask elision, softmax construction, rotary table precompute.

Run: python tools/kernel_microbench.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.cache import enable_compilation_cache

N_INNER = 20


def bench(fn, x, *extra, iters=3):
    """Median seconds per application; ``fn(x, *extra)`` must preserve x's
    shape so the scan can CHAIN the carry — an unchained body is loop-
    invariant and XLA hoists it, leaving only dispatch overhead."""

    @jax.jit
    def scanned(x, *extra):
        def body(h, _):
            return fn(h, *extra).astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, None, length=N_INNER)
        return jnp.sum(h.astype(jnp.float32))

    float(scanned(x, *extra))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(scanned(x, *extra))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / N_INNER


def main():
    enable_compilation_cache()
    import importlib

    # NB: `from seervideoldm_tpu.ops.pallas import flash_attention` yields the
    # re-exported *function*, not the module
    fa = importlib.import_module("seervideoldm_tpu.ops.pallas.flash_attention")
    swat = importlib.import_module("seervideoldm_tpu.ops.pallas.swat_attention")

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    # --- 512px L0 spatial self-attention: (b*f*heads, 4096, 40) ---
    B, S, D = 2 * 12 * 8, 4096, 40
    q = jax.random.normal(rng, (B, S, D), dtype)
    t = bench(lambda h: fa.flash_attention(h, h, h, D**-0.5, False), q)
    print(f"flash self 4096x40: {t*1e3:.2f} ms", flush=True)

    # roofline reference: the two attention matmuls alone via XLA einsum
    def matmuls_only(q):
        s = jnp.einsum("bnd,bmd->bnm", q, q, preferred_element_type=jnp.float32)
        return jnp.einsum("bnm,bmd->bnd", s.astype(dtype), q,
                          preferred_element_type=jnp.float32).astype(dtype)

    t = bench(matmuls_only, q)
    print(f"xla matmuls only  : {t*1e3:.2f} ms", flush=True)

    def xla_softmax_attn(q):
        s = jnp.einsum("bnd,bmd->bnm", q, q,
                       preferred_element_type=jnp.float32) * D**-0.5
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", p.astype(dtype), q,
                          preferred_element_type=jnp.float32).astype(dtype)

    t = bench(xla_softmax_attn, q)
    print(f"xla full attention: {t*1e3:.2f} ms", flush=True)

    # cross-attention shape: kv=77
    kv = jax.random.normal(rng, (B, 77, D), dtype)
    t = bench(lambda h, kv: fa.flash_attention(h, kv, kv, D**-0.5, False), q, kv)
    print(f"flash cross 4096x77: {t*1e3:.2f} ms", flush=True)

    # --- 512px L0 SWAT: (b*heads, 12, 64, 64, 40), ws=8 ---
    qs = jax.random.normal(rng, (16, 12, 64, 64, 40), dtype)
    t = bench(lambda x: swat.swat_attention(x, x, x, 40**-0.5, True, 8, 32), qs)
    print(f"swat fused 64x64 ws8: {t*1e3:.2f} ms", flush=True)

    t = bench(lambda x: swat._unfused_reference(x, x, x, 40**-0.5, True, 8, 32), qs)
    print(f"swat unfused (XLA) : {t*1e3:.2f} ms", flush=True)

    # production dispatch since r3: rotary applied in XLA (fused elementwise
    # pass), kernel runs with rot_dim=0 (ops/attention.py:265-285)
    from seervideoldm_tpu.ops.rotary import apply_rotary, rotary_freqs

    n = 12 * 64 * 64
    freqs = rotary_freqs(jnp.arange(n), 32)

    def prerot_swat(x):
        flat = x.reshape(16, n, 40)
        xr = apply_rotary(flat, freqs).astype(dtype).reshape(x.shape)
        return swat.swat_attention(xr, xr, x, 40**-0.5, True, 8, 0)

    t = bench(prerot_swat, qs)
    print(f"swat fused + XLA pre-rotate (prod): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
