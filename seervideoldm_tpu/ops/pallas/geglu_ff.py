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
# Working-set planning budget + the matching Mosaic scoped-vmem limit.
# Mosaic's default scoped budget is 16 MB but v5e has 128 MB of VMEM; the
# LN-fused variant's fp32 prologue temporaries pushed the c=640 site into
# the ~15%-slower chunked form under the old 14 MB plan.  Swept on-chip
# (/tmp sweep, STATUS r5): bt=512 single-shot wins at BOTH kernel sites —
# L1 1.640 ms (vs 1.743 chunked bt=256, 1.689 unfused chain) and L0
# 2.412 — so the plan budget admits bt=512 at c=640 (28 MB working set)
# and the Mosaic limit matches what the sweep compiled under.
_PLAN_BUDGET = 30 * 1024 * 1024
_VMEM_LIMIT = 96 * 1024 * 1024
# LN-fusion channel gate, measurement-driven (tools/microbench_ln_ff.py):
# at c=320 the fused LN prologue + residual epilogue wins consistently
# (2.42 vs 2.55-3.00 ms, +7..24%); at c=640 it is inside run-to-run noise
# and trends NEGATIVE (1.73 vs 1.56-1.69) — the serial LN prologue eats
# the pipelining slack the bigger weight stream needs.  Sites above the
# gate keep the LayerNorm + plain-geglu_ff chain.
_LN_FUSE_MAX_C = 320


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


def _ff_core(x, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref, *, inner: int,
             ic: int, out_shape):
    """x@W1h/W1g -> h*gelu(g) -> @W2 over a VMEM-resident token block,
    chunked along inner when the single-shot working set would not fit."""

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
        return chunk(0, inner)
    acc = jnp.zeros(out_shape, jnp.float32)
    return jax.lax.fori_loop(
        0, inner // ic, lambda i, a: a + chunk(i * ic, ic), acc)


def _kernel(x_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref, b2_ref,
            o_ref, *, inner: int, ic: int):
    x = x_ref[...]  # (bt, c) bf16
    acc = _ff_core(x, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref,
                   inner=inner, ic=ic, out_shape=o_ref.shape)
    o_ref[...] = acc.astype(o_ref.dtype) + b2_ref[0][None, :]


def _kernel_ln(x_ref, g_ref, bt_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref,
               w2_ref, b2_ref, o_ref, *, inner: int, ic: int, eps: float):
    """Fused pre-LayerNorm prologue + residual epilogue around _ff_core.

    The FF sites all compute ``x + FF(LN(x))`` (transformer3d.py): the
    residual IS the kernel's own input block, so fusing both ends costs
    ZERO extra HBM traffic and saves two full round trips per site — the
    LN output write+read and the residual add's re-read of x.  LN numerics
    mirror ops/norms.LayerNorm: fp32 stats over the channel axis, affine
    in fp32, cast back to the compute dtype (bf16) for the matmuls."""
    xb = x_ref[...]  # (bt, c) bf16
    x32 = xb.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    cen = x32 - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    ln = cen * jax.lax.rsqrt(var + eps)
    ln = ln * g_ref[0][None, :] + bt_ref[0][None, :]
    x = ln.astype(xb.dtype)
    acc = _ff_core(x, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref,
                   inner=inner, ic=ic, out_shape=o_ref.shape)
    o_ref[...] = (acc.astype(o_ref.dtype) + b2_ref[0][None, :]) + xb


def _kernel_ln_proj(x_ref, g_ref, bt_ref, w1h_ref, b1h_ref, w1g_ref,
                    b1g_ref, w2_ref, b2_ref, w3_ref, b3_ref, res_ref,
                    o_ref, *, inner: int, ic: int, eps: float):
    """_kernel_ln extended with the transformer tail: the site's
    zero-initialized 1x1 ``proj_out`` matmul and the OUTER residual add
    (transformer3d.py::SpatialTransformer3D).  The temporal sites read
    ``x_in + proj_out(x + FF(LN(x)))`` after the attention residual; fusing
    the tail removes the intermediate's HBM round trip plus the separate
    proj_out read/write and residual re-read — three full passes over the
    (tokens, c) activations per site (floor-budget 'glue' rows,
    FLOORBUDGET.json).  W3 adds only c*c*2 bytes of resident VMEM (200 KB
    at c=320, the only gated-in width)."""
    xb = x_ref[...]  # (bt, c) bf16
    x32 = xb.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    cen = x32 - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    ln = cen * jax.lax.rsqrt(var + eps)
    ln = ln * g_ref[0][None, :] + bt_ref[0][None, :]
    x = ln.astype(xb.dtype)
    acc = _ff_core(x, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref,
                   inner=inner, ic=ic, out_shape=o_ref.shape)
    y = (acc.astype(xb.dtype) + b2_ref[0][None, :]) + xb
    z = jax.lax.dot(y, w3_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (z.astype(o_ref.dtype) + b3_ref[0][None, :]) + res_ref[...]


def _reference(x, w1, b1, w2, b2):
    """Exact-erf XLA path, numerics of GEGLU(nn.Dense) + nn.Dense."""
    inner = w2.shape[0]
    pre = (x @ w1).astype(x.dtype) + b1.astype(x.dtype)
    h, g = pre[..., :inner], pre[..., inner:]
    a = h * jax.nn.gelu(g, approximate=False)
    return (a @ w2).astype(x.dtype) + b2.astype(x.dtype)


def _pick_blocks(n: int, c: int, inner: int, ln: bool = False,
                 proj: bool = False):
    """Largest (token block, inner chunk) whose working set fits VMEM.

    Prefers the single-shot form (ic == inner: three fat matmuls, no chunk
    loop) — the chunked loop's thin matmuls measured ~15% slower at the
    L0 shape."""
    budget = _PLAN_BUDGET
    w_bytes = (c * 2 * inner + inner * c) * 2
    if proj:
        w_bytes += c * c * 2  # resident W3 (proj_out)
    for bt in (512, 256, 128):
        if n % bt != 0:
            continue
        for ic in (inner, inner // 2, inner // 4, _INNER_BLOCK):
            if ic <= 0 or inner % ic != 0 or ic % 128 != 0:
                continue
            # x + out (double-buffered bf16) + f32 acc + f32 h,g + bf16 a
            per_tok = 8 * c + 10 * ic + (4 * c if ic < inner else 0)
            if ln:
                per_tok += 8 * c  # fp32 x32/centered LN temporaries
            if proj:
                # res block (bf16, double-buffered) + y bf16 + z f32
                per_tok += 4 * c + 2 * c + 4 * c
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
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
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


_LN_EPS = 1e-5  # ops/norms.LayerNorm default (torch parity)


def _ln_reference(x, gamma, beta, w1, b1, w2, b2):
    """Exact-erf XLA path for x + FF(LN(x)) — numerics of
    ops/norms.LayerNorm (fp32 island) -> GEGLU FeedForward -> residual."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    ln = (x32 - mean) / jnp.sqrt(var + _LN_EPS)
    ln = ln * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return _reference(ln.astype(x.dtype), w1, b1, w2, b2) + x


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ln_geglu_ff(x, gamma, beta, w1, b1, w2, b2):
    """x + FF(LN(x)) fused: (n, c) bf16 -> (n, c); gamma/beta fp32 (c,).

    The transformer FF sites all read ``x + FeedForward(LayerNorm(x))``
    (transformer3d.py); fusing the LN prologue and the residual epilogue
    into the GEGLU kernel removes two full HBM round trips per site at
    zero extra traffic — the residual is the kernel's own input block.
    Reference semantics: ``seer/models/attention.py:241-246, 325-327``
    (norm3 -> ff -> residual)."""
    return _ln_geglu_ff_impl(x, gamma, beta, w1, b1, w2, b2)


def ln_geglu_ff_preferred(n: int, c: int, inner: int, dtype) -> bool:
    """Whether the LN-fused kernel is the measured winner at this site;
    callers keeping checkpoints interchangeable should otherwise run the
    LayerNorm + FeedForward chain (which still dispatches the plain
    geglu_ff kernel where supported)."""
    return c <= _LN_FUSE_MAX_C and geglu_ff_supported(n, c, inner, dtype)


def _ln_geglu_ff_impl(x, gamma, beta, w1, b1, w2, b2):
    n, c = x.shape
    inner = w2.shape[0]
    if not geglu_ff_supported(n, c, inner, x.dtype):
        return _ln_reference(x, gamma, beta, w1, b1, w2, b2)
    bt, ic = _pick_blocks(n, c, inner, ln=True)
    if bt is None:
        return _ln_reference(x, gamma, beta, w1, b1, w2, b2)
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h = b1[None, :inner].astype(x.dtype)
    b1g = b1[None, inner:].astype(x.dtype)
    b2r = b2[None, :].astype(x.dtype)
    g32 = gamma[None, :].astype(jnp.float32)
    bt32 = beta[None, :].astype(jnp.float32)
    grid = (n // bt,)
    return pl.pallas_call(
        functools.partial(_kernel_ln, inner=inner, ic=ic, eps=_LN_EPS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((inner, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, g32, bt32, w1h, b1h, w1g, b1g, w2, b2r)


def _ln_fwd(x, gamma, beta, w1, b1, w2, b2):
    return (_ln_geglu_ff_impl(x, gamma, beta, w1, b1, w2, b2),
            (x, gamma, beta, w1, b1, w2, b2))


def _ln_bwd(res, dy):
    """Exact-erf XLA backward through LN + FF + residual, intermediates
    recomputed (flash-style: only the inputs are saved)."""
    _, vjp = jax.vjp(_ln_reference, *res)
    return vjp(dy)


ln_geglu_ff.defvjp(_ln_fwd, _ln_bwd)


def _ln_proj_reference(x, gamma, beta, w1, b1, w2, b2, w3, b3, res):
    """Exact-erf XLA path for res + proj(x + FF(LN(x))) — the numerics of
    the unfused chain: LN/FF/residual (above), then the 1x1 proj_out
    matmul (bf16 inputs, f32 accumulation, bf16 bias add — nn.Conv
    epilogue) and the outer residual add in bf16."""
    y = _ln_reference(x, gamma, beta, w1, b1, w2, b2)
    z = jnp.dot(y, w3.astype(y.dtype),
                preferred_element_type=jnp.float32)
    return (z.astype(x.dtype) + b3.astype(x.dtype)) + res


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ln_geglu_ff_proj(x, gamma, beta, w1, b1, w2, b2, w3, b3, res):
    """res + proj(x + FF(LN(x))) fused — the whole transformer-site tail.

    ``x``: (n, c) bf16 post-attention hidden states; ``w3``/``b3``: the
    site's zero-initialized 1x1 proj_out (kernel reshaped (c, c)); ``res``:
    (n, c) the site's outer residual (SpatialTransformer3D input).
    Removes three HBM passes over the (n, c) activations vs chaining
    ln_geglu_ff + XLA proj_out + add (reference semantics:
    ``seer/models/attention.py:126-151`` proj_out + residual)."""
    return _ln_proj_impl(x, gamma, beta, w1, b1, w2, b2, w3, b3, res)


def ln_geglu_ff_proj_preferred(n: int, c: int, inner: int, dtype) -> bool:
    """Same measured channel gate as the LN fusion (c <= 320: the L0
    sites, where the whole-site tail fusion wins; c=640 keeps XLA)."""
    return c <= _LN_FUSE_MAX_C and geglu_ff_supported(n, c, inner, dtype)


def _ln_proj_impl(x, gamma, beta, w1, b1, w2, b2, w3, b3, res):
    n, c = x.shape
    inner = w2.shape[0]
    if not geglu_ff_supported(n, c, inner, x.dtype):
        return _ln_proj_reference(x, gamma, beta, w1, b1, w2, b2, w3, b3, res)
    bt, ic = _pick_blocks(n, c, inner, ln=True, proj=True)
    if bt is None:
        return _ln_proj_reference(x, gamma, beta, w1, b1, w2, b2, w3, b3, res)
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h = b1[None, :inner].astype(x.dtype)
    b1g = b1[None, inner:].astype(x.dtype)
    b2r = b2[None, :].astype(x.dtype)
    b3r = b3[None, :].astype(x.dtype)
    g32 = gamma[None, :].astype(jnp.float32)
    bt32 = beta[None, :].astype(jnp.float32)
    grid = (n // bt,)
    return pl.pallas_call(
        functools.partial(_kernel_ln_proj, inner=inner, ic=ic, eps=_LN_EPS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((inner, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((c, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, g32, bt32, w1h, b1h, w1g, b1g, w2, b2r,
      w3.astype(x.dtype), b3r, res)


def _ln_proj_fwd(x, gamma, beta, w1, b1, w2, b2, w3, b3, res):
    return (_ln_proj_impl(x, gamma, beta, w1, b1, w2, b2, w3, b3, res),
            (x, gamma, beta, w1, b1, w2, b2, w3, b3, res))


def _ln_proj_bwd(saved, dy):
    """Exact-erf XLA backward through LN + FF + residual + proj + outer
    residual, intermediates recomputed (flash-style)."""
    _, vjp = jax.vjp(_ln_proj_reference, *saved)
    return vjp(dy)


ln_geglu_ff_proj.defvjp(_ln_proj_fwd, _ln_proj_bwd)
