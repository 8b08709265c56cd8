"""Fused flash attention for TPU (Pallas).

One kernel covers the model's three attention shapes (SURVEY §2.3):

- per-frame spatial self-attention (seq = h*w up to 4096, the 512px hot spot);
- per-frame text cross-attention (kv = 77 CLIP tokens);
- SWAT windowed causal spatio-temporal attention (seq = f·win², causal
  lower-triangular over f-major window tokens).

Online-softmax streaming over K/V blocks: logits never hit HBM.  fp32
accumulation for max/denominator/output; inputs stay bf16 on the MXU.
Causal blocks above the diagonal are skipped entirely (not just masked).

The public wrapper pads seq and head_dim to hardware tiles, dispatches the
grid over (batch·heads, q-blocks, kv-blocks), and exposes a ``custom_vjp``
with a **fused Pallas backward**: one program per batch·head row keeps K/V
resident in VMEM and walks q blocks, recomputing the softmax from (q, k)
per block — neither forward nor backward ever materializes seq² logits in
HBM, and no extra residuals (O/logsumexp) are saved.  Sequences beyond the
single-shot regime fall back to an einsum recompute under XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e30

# Test hook: run kernels in the Pallas interpreter (works on CPU).
_INTERPRET = False
# Force the einsum path (e.g. when lowering for a backend that cannot
# compile Mosaic kernels, like bench.py's CPU FLOP-count probe).
_DISABLE = False


def flash_attention_available() -> bool:
    if _DISABLE:
        return False
    return _INTERPRET or (_HAS_PLTPU and jax.default_backend() in ("tpu", "axon"))


def _block_sizes(q_len: int, kv_len: int) -> tuple[int, int]:
    bq = min(512, max(128, 1 << int(np.ceil(np.log2(max(q_len, 1))))))
    bq = min(bq, 512)
    bk = min(512, max(128, 1 << int(np.ceil(np.log2(max(kv_len, 1))))))
    bk = min(bk, 512)
    return bq, bk


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            scale: float, causal: bool, q_len: int, kv_len: int,
            bq: int, bk: int, num_kv: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    i = pl.program_id(1)

    def compute():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)

        rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = cols < kv_len
        if causal:
            mask = jnp.logical_and(mask, cols <= rows)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0][:, None]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # (bq, 1)
        p = jnp.exp(s - m_new)  # (bq, bk) fp32
        l_new = l_scr[:, 0][:, None] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    if causal:
        # skip fully-masked blocks above the diagonal
        @pl.when(j * bk <= i * bq + (bq - 1))
        def _():
            compute()
    else:
        compute()

    @pl.when(j == num_kv - 1)
    def _finish():
        denom = l_scr[:, 0][:, None]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _kernel_single(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                   q_len: int, kv_len: int, bq: int, num_q: int):
    """One program per (batch*heads) row: K/V stay resident while a
    ``fori_loop`` walks q blocks.  At this model's sequence lengths
    (kv <= 4096) the fp32 score block (bq x kv_pad <= 8 MB) fits VMEM, so
    streaming/online-softmax is pure overhead -- and one program per row
    amortizes per-program latency over all q blocks.

    Perf notes (512px L0 shape, 192x4096x40):
    - the column mask is elided when kv needs no padding and not causal
      (saves iota/compare/select passes over (bq, kv) per block);
    - softmax normalization happens AFTER p@v on the (bq, d) output
      (divides d lanes instead of kv);
    (A software-pipelined variant issuing block i+1's scores matmul before
    block i's softmax measured SLOWER — 18.0 vs 14.9 ms at the L0 shape —
    Mosaic does not overlap them and the fatter live set forces smaller
    blocks; keep the straight-line loop.)"""
    k = k_ref[0]  # (kv_pad, d)
    v = v_ref[0]
    kv_pad = k.shape[0]
    need_mask = causal or kv_len != kv_pad

    def scores(i):
        q = q_ref[0, pl.ds(i * bq, bq), :]  # (bq, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, kv_pad)
        if need_mask:
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, kv_pad), 1)
            mask = cols < kv_len
            if causal:
                rows = i * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, kv_pad), 0)
                mask = jnp.logical_and(mask, cols <= rows)
            s = jnp.where(mask, s, NEG_INF)
        return s

    def body(i, _):
        s = scores(i)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)  # unnormalized probabilities
        l = jnp.sum(e, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, d)
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, pl.ds(i * bq, bq), :] = (pv / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_q, body, 0)


# fp32 scores for one q block must fit comfortably in VMEM
_SINGLE_SHOT_MAX_KV = 4096
_SCORE_BYTES_BUDGET = 4 * 1024 * 1024  # plus like-sized softmax temporaries


def _flash_forward(q, k, v, scale: float, causal: bool):
    """q: (B, Sq, D), k/v: (B, Skv, D) -- B = batch*heads folded.

    head_dim is never padded: a block whose last dim equals the array dim is
    tile-legal and Mosaic's internal lane padding is free."""
    batch, q_len, d = q.shape
    kv_len = k.shape[1]

    if kv_len <= _SINGLE_SHOT_MAX_KV:
        kv_pad = int(np.ceil(kv_len / 128)) * 128
        # largest q block whose fp32 scores fit the budget
        bq = max(128, min(4096, (_SCORE_BYTES_BUDGET // (4 * kv_pad)) // 128 * 128))
        q_pad = int(np.ceil(q_len / bq)) * bq
        num_q = q_pad // bq
        qp = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        out = pl.pallas_call(
            functools.partial(
                _kernel_single, scale=scale, causal=causal,
                q_len=q_len, kv_len=kv_len, bq=bq, num_q=num_q,
            ),
            grid=(batch,),
            in_specs=[
                pl.BlockSpec((1, q_pad, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, kv_pad, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, kv_pad, d), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, q_pad, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, q_pad, d), q.dtype),
            compiler_params=None if _INTERPRET else pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=_INTERPRET,
        )(qp, kp, vp)
        return out[:, :q_len, :]

    bq, bk = _block_sizes(q_len, kv_len)
    q_pad = int(np.ceil(q_len / bq)) * bq
    qp = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
    num_q = q_pad // bq
    # long-sequence fallback: streamed online softmax over kv blocks
    kv_pad = int(np.ceil(kv_len / bk)) * bk
    kp = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    num_kv = kv_pad // bk
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, causal=causal, q_len=q_len, kv_len=kv_len,
            bq=bq, bk=bk, num_kv=num_kv,
        ),
        grid=(batch, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, q_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp)
    return out[:, :q_len, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: float, causal: bool = False):
    """Fused attention. q: (..., Sq, D), k/v: (..., Skv, D); leading dims fold.

    Causal = lower-triangular over the (f-major) token order — the SWAT /
    xformers semantics (SURVEY §2.5.1).
    """
    lead = q.shape[:-2]
    qf = q.reshape((-1,) + q.shape[-2:])
    kf = k.reshape((-1,) + k.shape[-2:])
    vf = v.reshape((-1,) + v.shape[-2:])
    out = _flash_forward(qf, kf, vf, scale, causal)
    return out.reshape(lead + out.shape[-2:])


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                dk_scr, dv_scr, *, scale: float, causal: bool,
                q_len: int, kv_len: int, bq: int, num_q: int):
    """One program per (batch·head) row: K/V resident, loop over q blocks.

    Per block the softmax is *recomputed* from (q, k) — all of K is here so
    the row max/denominator are exact without a saved logsumexp.  ``delta``
    uses the identity rowsum(p·dp) = rowsum(g·o), so O isn't needed either.
    Zero-padded g rows contribute nothing to dk/dv (contraction over rows),
    and padded kv columns carry zero v/g so their ds is zero — padding is
    self-masking except for the logits column mask, applied explicitly.
    """
    k = k_ref[0]  # (kv_pad, d)
    v = v_ref[0]
    kv_pad = k.shape[0]
    need_mask = causal or kv_len != kv_pad  # same elision as the forward

    dk_scr[:] = jnp.zeros_like(dk_scr)
    dv_scr[:] = jnp.zeros_like(dv_scr)

    def body(i, _):
        q = q_ref[0, pl.ds(i * bq, bq), :]  # (bq, d)
        g = g_ref[0, pl.ds(i * bq, bq), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, kv_pad) fp32
        if need_mask:
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, kv_pad), 1)
            mask = cols < kv_len
            if causal:
                rows = i * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, kv_pad), 0)
                mask = jnp.logical_and(mask, cols <= rows)
            s = jnp.where(mask, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)  # (bq, kv_pad) fp32

        g32 = g.astype(jnp.float32)
        dv_scr[:] += jax.lax.dot_general(
            p, g32, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # p^T g -> (kv_pad, d)
        dp = jax.lax.dot_general(
            g32, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, kv_pad)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # (bq, 1)
        ds = p * (dp - delta) * scale  # (bq, kv_pad) fp32
        # fp32 ds for dq too — matching dk/dv and the einsum fallback; a
        # bf16 cast here gave dq systematically lower precision than its
        # siblings for no measured speedup (ds already lives in VMEM fp32)
        dq_ref[0, pl.ds(i * bq, bq), :] = jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_scr[:] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # ds^T q -> (kv_pad, d)
        return 0

    jax.lax.fori_loop(0, num_q, body, 0)
    dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
    dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# fp32 (bq, kv_pad) temporaries (s/p/dp/ds) dominate backward VMEM; keep
# their combined footprint under ~6 MB of the ~16 MB/core budget
_BWD_TEMPS_BYTES = 6 * 1024 * 1024


def _flash_backward(q, k, v, g, scale: float, causal: bool):
    """Fused backward for the single-shot regime. q/g: (B, Sq, D)."""
    batch, q_len, d = q.shape
    kv_len = k.shape[1]
    kv_pad = int(np.ceil(kv_len / 128)) * 128
    bq = max(64, min(1024, (_BWD_TEMPS_BYTES // (4 * 4 * kv_pad)) // 64 * 64))
    q_pad = int(np.ceil(q_len / bq)) * bq
    num_q = q_pad // bq
    qp = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, q_pad - q_len), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    q_spec = pl.BlockSpec((1, q_pad, d), lambda b: (b, 0, 0))
    kv_spec = pl.BlockSpec((1, kv_pad, d), lambda b: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, causal=causal,
            q_len=q_len, kv_len=kv_len, bq=bq, num_q=num_q,
        ),
        grid=(batch,),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((batch, kv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((batch, kv_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((kv_pad, d), jnp.float32) if _HAS_PLTPU else None,
            pltpu.VMEM((kv_pad, d), jnp.float32) if _HAS_PLTPU else None,
        ],
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp, gp)
    return dq[:, :q_len], dk[:, :kv_len], dv[:, :kv_len]


def _fwd(q, k, v, scale, causal):
    return flash_attention(q, k, v, scale, causal), (q, k, v)


def _bwd(scale, causal, residuals, g):
    q, k, v = residuals
    kv_len = k.shape[-2]
    if kv_len <= _SINGLE_SHOT_MAX_KV and flash_attention_available():
        lead = q.shape[:-2]
        qf = q.reshape((-1,) + q.shape[-2:])
        kf = k.reshape((-1,) + k.shape[-2:])
        vf = v.reshape((-1,) + v.shape[-2:])
        gf = g.reshape((-1,) + g.shape[-2:])
        dq, dk, dv = _flash_backward(qf, kf, vf, gf, scale, causal)
        return (dq.reshape(lead + dq.shape[-2:]),
                dk.reshape(lead + dk.shape[-2:]),
                dv.reshape(lead + dv.shape[-2:]))
    return _bwd_einsum(scale, causal, residuals, g)


def _bwd_einsum(scale, causal, residuals, g):
    """Exact backward by recomputation with einsum (XLA fuses well here)."""
    q, k, v = residuals
    logits = jnp.einsum("...nd,...md->...nm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        n, m = logits.shape[-2], logits.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        # top-left tril (cols <= rows) — the mask the forward kernels apply;
        # a bottom-aligned tril here would differentiate a different
        # function for rectangular causal inputs
        logits = jnp.where(cols <= rows, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("...nm,...nd->...md", p, g32)
    dp = jnp.einsum("...nd,...md->...nm", g32, v32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("...nm,...md->...nd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("...nm,...nd->...md", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
