"""Fused GEGLU feed-forward: x@W1 -> split -> hidden*gelu(gate) -> @W2.

The XLA path materializes the (tokens, 2*inner) GEGLU intermediate in HBM
(503 MB at 512px-L0), reads it back for the gate/product, and writes the
(tokens, inner) product again before the down-projection — the dominant
above-floor cost of every FeedForward site in the floor budget
(STATUS round-4 item 10).  This kernel keeps the whole chain VMEM-resident
per token block: HBM traffic drops to one read of x + one write of the
output + one streaming pass over the weights.

Reference semantics: ``seer/models/attention.py:705-793`` (GEGLU ff.net.0
-> product -> ff.net.2), numerics mirroring the flax/XLA path (bf16 matmul
inputs, f32 accumulation, bf16 bias/product epilogue).

gelu: Mosaic has no erf/erfc lowering, so the kernel evaluates the
Abramowitz-Stegun 7.1.26 rational approximation (max abs error 1.5e-7 in
erf, well below bf16's ~4e-3 resolution — outputs round to the same bf16
almost everywhere).  The XLA fallback and the custom_vjp backward use the
exact erf.

Autodiff: custom_vjp — forward runs the kernel (TPU) or the XLA reference
(elsewhere / unsupported shapes); backward is always the exact-erf XLA
chain rule, recomputing the intermediates (flash-style: nothing beyond the
inputs is saved).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

# weights for every program stay resident across the token-block grid; cap
# their footprint so c=1280 sites (26 MB W1) fall back to XLA
_W_VMEM_BUDGET = 12 * 1024 * 1024
_TOKEN_BLOCK = 512
_INNER_BLOCK = 256


def _erf_as(z: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 erf approximation (f32, |err| <= 1.5e-7)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-az * az))


def _gelu_approx_f32(z: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * z * (1.0 + _erf_as(z * np.float32(1.0 / math.sqrt(2.0))))


def _kernel(x_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref, b2_ref,
            o_ref, *, inner: int, ic: int):
    x = x_ref[...]  # (bt, c) bf16

    def chunk(lo, width):
        # mirror the XLA Dense epilogue: f32 accumulation, bf16 output +
        # bf16 bias add
        h = jax.lax.dot(x, w1h_ref[:, pl.ds(lo, width)],
                        preferred_element_type=jnp.float32)
        h = h.astype(x.dtype) + b1h_ref[0, pl.ds(lo, width)][None, :]
        g = jax.lax.dot(x, w1g_ref[:, pl.ds(lo, width)],
                        preferred_element_type=jnp.float32)
        g = g.astype(x.dtype) + b1g_ref[0, pl.ds(lo, width)][None, :]
        a = h.astype(jnp.float32) * _gelu_approx_f32(g.astype(jnp.float32))
        return jax.lax.dot(a.astype(x.dtype), w2_ref[pl.ds(lo, width), :],
                           preferred_element_type=jnp.float32)

    if ic >= inner:
        # single shot: three fat matmuls, nothing chunked
        acc = chunk(0, inner)
    else:
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        acc = jax.lax.fori_loop(
            0, inner // ic, lambda i, a: a + chunk(i * ic, ic), acc)
    o_ref[...] = acc.astype(o_ref.dtype) + b2_ref[0][None, :]


def _reference(x, w1, b1, w2, b2):
    """Exact-erf XLA path, numerics of GEGLU(nn.Dense) + nn.Dense."""
    inner = w2.shape[0]
    pre = (x @ w1).astype(x.dtype) + b1.astype(x.dtype)
    h, g = pre[..., :inner], pre[..., inner:]
    a = h * jax.nn.gelu(g, approximate=False)
    return (a @ w2).astype(x.dtype) + b2.astype(x.dtype)


def _pick_blocks(n: int, c: int, inner: int):
    """Largest (token block, inner chunk) whose working set fits VMEM.

    Prefers the single-shot form (ic == inner: three fat matmuls, no chunk
    loop) — the chunked loop's thin matmuls measured ~15% slower at the
    L0 shape."""
    budget = 14 * 1024 * 1024
    w_bytes = (c * 2 * inner + inner * c) * 2
    for bt in (512, 256, 128):
        if n % bt != 0:
            continue
        for ic in (inner, inner // 2, inner // 4, _INNER_BLOCK):
            if ic <= 0 or inner % ic != 0 or ic % 128 != 0:
                continue
            # x + out (double-buffered bf16) + f32 acc + f32 h,g + bf16 a
            per_tok = 8 * c + 10 * ic + (4 * c if ic < inner else 0)
            if w_bytes + bt * per_tok <= budget:
                return bt, ic
    return None, None


def geglu_ff_supported(n: int, c: int, inner: int, dtype) -> bool:
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    if dtype != jnp.bfloat16:
        return False
    if inner % _INNER_BLOCK != 0:
        return False
    if n % 256 != 0:
        return False
    w_bytes = (c * 2 * inner + inner * c) * 2
    return w_bytes <= _W_VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def geglu_ff(x, w1, b1, w2, b2):
    """(n, c) bf16 -> (n, c); w1 (c, 2*inner) [hidden; gate], w2 (inner, c)."""
    return _geglu_ff_fwd_impl(x, w1, b1, w2, b2)


def _geglu_ff_fwd_impl(x, w1, b1, w2, b2):
    n, c = x.shape
    inner = w2.shape[0]
    if not geglu_ff_supported(n, c, inner, x.dtype):
        return _reference(x, w1, b1, w2, b2)
    bt, ic = _pick_blocks(n, c, inner)
    if bt is None:
        return _reference(x, w1, b1, w2, b2)
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h, b1g = b1[None, :inner].astype(x.dtype), b1[None, inner:].astype(x.dtype)
    b2r = b2[None, :].astype(x.dtype)
    grid = (n // bt,)
    return pl.pallas_call(
        functools.partial(_kernel, inner=inner, ic=ic),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((inner, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
    )(x, w1h, b1h, w1g, b1g, w2, b2r)


def _fwd(x, w1, b1, w2, b2):
    return _geglu_ff_fwd_impl(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(res, dy):
    """Exact-erf XLA backward, intermediates recomputed (flash-style)."""
    x, w1, b1, w2, b2 = res
    inner = w2.shape[0]
    f32 = jnp.float32
    pre = (x @ w1).astype(x.dtype) + b1.astype(x.dtype)
    h, g = pre[..., :inner], pre[..., inner:]
    g32 = g.astype(f32)
    gg = jax.nn.gelu(g32, approximate=False)
    a = (h.astype(f32) * gg).astype(x.dtype)

    dy32 = dy.astype(f32)
    db2 = jnp.sum(dy32, axis=0).astype(b2.dtype)
    dw2 = (a.T @ dy).astype(w2.dtype)
    da = (dy @ w2.T).astype(f32)
    dh = da * gg
    # gelu'(z) = 0.5 (1 + erf(z/sqrt2)) + z exp(-z^2/2)/sqrt(2 pi)
    gprime = (0.5 * (1.0 + jax.lax.erf(g32 * np.float32(1 / math.sqrt(2.0))))
              + g32 * jnp.exp(-0.5 * g32 * g32)
              * np.float32(1.0 / math.sqrt(2.0 * math.pi)))
    dg = da * h.astype(f32) * gprime
    dpre = jnp.concatenate([dh, dg], axis=-1).astype(x.dtype)
    db1 = jnp.sum(dpre.astype(f32), axis=0).astype(b1.dtype)
    dw1 = (x.T @ dpre).astype(w1.dtype)
    dx = (dpre @ w1.T).astype(x.dtype)
    return dx, dw1, db1, dw2, db2


geglu_ff.defvjp(_fwd, _bwd)
