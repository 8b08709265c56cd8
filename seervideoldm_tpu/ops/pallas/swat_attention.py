"""Fully-fused SWAT windowed causal spatio-temporal attention (Pallas).

One kernel per (batch·head, window) fuses everything the reference does in
five separate passes (``seer/models/attention.py:632-703``):

1. **windowing by BlockSpec** — each grid cell's block IS one ``ws×ws``
   spatial window across all frames; the reference's 7-D partition/reverse
   transposes never touch HBM;
2. **in-kernel rotary** — per-token positions are reconstructed from the
   grid indices (position = frame·h·w + row·w + col, the f-major
   full-resolution flattening the reference applies *before* windowing);
   interleaved-pair rotation is done with ``pltpu.roll`` (no sub-128
   reshapes);
3. **causal attention** — lower-triangular over the f-major window token
   order (xformers ``LowerTriangularMask`` parity), fp32 softmax, MXU
   matmuls.

Tokens per window = f·ws² (≤ ~1k at reference scales) so a window's scores
fit VMEM — no streaming needed.  Backward: a **fused Pallas kernel** that
recomputes rotary + softmax per window and produces dq/dk/dv with the
rotary adjoint applied in-kernel (RHᵀ = −RH and sin/cos are pair-constant,
so de-rotation is ``t·cos − rotate_half(t)·sin``); window gradients never
leave VMEM.  Falls back to XLA recompute off-TPU.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ..rotary import apply_rotary, rotary_freqs
from ..windows import window_partition, window_reverse

NEG_INF = -1e30

# Causal frame-block decomposition: target rows per group.  Parity-neutral
# — BITWISE: a row's scores contract over d only and its softmax always
# sees the same visible prefix, so grouping changes matmul tiling, not
# values.  Swept on-chip (tools/probe_swat_gsz.py): 256 beats 128 by
# 1.26x at 512px-L0 (4.26 -> 3.38 ms) and 1.23x at L1; 64/384/768 worse.
_GROUP_ROWS = 256

# Forward per-fori-iteration slice width target (columns of w processed
# per loop step).  Bigger slices amortize loop/DMA-index overhead against
# more VMEM stack (statically-unrolled windows + static output stores the
# DMA pipeliner can schedule).  Swept on-chip (tools/probe_swat_slice.py):
# 64 = whole strip in ONE static body — L1 kernel 0.901 -> 0.688 ms
# (1.31x), L0 3.353 -> 3.263 ms (1.03x); parity-neutral (the slice width
# only batches the same per-window computations).  The r2-era "unrolled
# loop OOMs the stack" no longer holds with the grouped-causal
# decomposition's smaller temporaries.
_SLICE_TARGET = 64

# Test hook: interpreter mode (CPU).
_INTERPRET = False
# Force the unfused XLA path (see flash_attention._DISABLE).
_DISABLE = False


def swat_attention_available() -> bool:
    if _DISABLE:
        return False
    return _INTERPRET or (_HAS_PLTPU and jax.default_backend() in ("tpu", "axon"))


def _slice_width(w: int, ws: int) -> int:
    """Columns per forward fori_loop iteration: a multiple of ws (windows
    split statically inside the slice), dividing w exactly, and 8-aligned
    unless a single slice covers all of w (Mosaic dynamic sublane indices
    must be multiples of 8; the single-slice case indexes statically).
    Largest such width <= max(_SLICE_TARGET, ws); falls back to the
    historical min(max(ws, 8), w) when no candidate qualifies."""
    cands = [sw for sw in range(ws, w + 1, ws)
             if w % sw == 0 and (sw % 8 == 0 or sw == w)
             and sw <= max(_SLICE_TARGET, ws)]
    return max(cands) if cands else min(max(ws, 8), w)


def _rotate_half_roll(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotate using roll: out[2i]=-x[2i+1], out[2i+1]=x[2i]."""
    n = x.shape[-1]
    if _INTERPRET:
        fwd = jnp.roll(x, -1, axis=-1)
        bwd = jnp.roll(x, 1, axis=-1)
    else:
        # pltpu.roll requires non-negative shift: roll(-1) == roll(n-1)
        axis = x.ndim - 1
        fwd = pltpu.roll(x, n - 1, axis)
        bwd = pltpu.roll(x, 1, axis)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane % 2 == 0, -fwd, bwd)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
            f: int, ws: int, h: int, w: int, rot_dim: int, d_pad: int,
            theta: float):
    """Block = one full-width row of windows (1, f, ws, w, d) — Mosaic needs
    the last two block dims (w, d) tile-aligned.  One program handles the
    whole strip, looping windows with ``fori_loop`` so the VMEM stack only
    ever holds ONE window's temporaries (an unrolled loop OOMs the stack,
    one-window-per-program drowns in per-program overhead)."""
    wi = pl.program_id(1)
    tokens = f * ws * ws
    nw = w // ws

    if rot_dim > 0:
        lane = jax.lax.broadcasted_iota(jnp.int32, (tokens, d_pad), 1)
        pair = (lane // 2).astype(jnp.float32)
        inv_freq = jnp.exp(pair * (-2.0 * math.log(theta) / rot_dim))
        in_rot = lane < rot_dim

        tok = jax.lax.broadcasted_iota(jnp.int32, (tokens, d_pad), 0)
        frame = tok // (ws * ws)
        rem = tok % (ws * ws)
        row_in_win = rem // ws
        col_in_win = rem % ws

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 1)
    tril = cols_t <= rows_t

    # Mosaic requires dynamic sublane indices to be multiples of 8: slice
    # 8-aligned chunks of the w axis and split windows statically inside.
    sw = _slice_width(w, ws)
    wins_per_slice = sw // ws

    def body(c, _):
        chunk_q = q_ref[0, :, :, pl.ds(c * sw, sw), :]
        chunk_k = k_ref[0, :, :, pl.ds(c * sw, sw), :]
        chunk_v = v_ref[0, :, :, pl.ds(c * sw, sw), :]
        outs = []
        for sub in range(wins_per_slice):
            j_col = c * sw + sub * ws  # window's first column in w

            def window(chunk):
                return chunk[:, :, sub * ws : (sub + 1) * ws, :].reshape(
                    tokens, d_pad
                )

            if rot_dim > 0:
                pos = (frame * (h * w) + (wi * ws + row_in_win) * w
                       + (j_col + col_in_win)).astype(jnp.float32)
                phase = pos * inv_freq
                # pass-through lanes (>= rot_dim) folded into the tables:
                # cos=1, sin=0 there, so `t*cos + rh(t)*sin` applies
                # everywhere without a separate select per rotate
                cos = jnp.where(in_rot, jnp.cos(phase), 1.0)
                sin = jnp.where(in_rot, jnp.sin(phase), 0.0)

                def rotate(t):
                    t32 = t.astype(jnp.float32)
                    return t32 * cos + _rotate_half_roll(t32) * sin

                q = rotate(window(chunk_q)).astype(chunk_q.dtype)
                k = rotate(window(chunk_k)).astype(chunk_k.dtype)
            else:
                # rot_dim == 0: caller pre-rotated q/k in XLA (fused into
                # the projection epilogue) — in-kernel trig measured 36% of
                # this kernel's runtime at the 512px L0 shape (probe r3)
                q = window(chunk_q)
                k = window(chunk_k)
            v_win = window(chunk_v)

            def softmax_pv(s, vis_v):
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                l = jnp.sum(e, axis=-1, keepdims=True)
                # unnormalized exp; normalize AFTER p@v on the d lanes
                return jax.lax.dot_general(
                    e.astype(vis_v.dtype), vis_v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) / l

            if causal and f > 1:
                # Causal frame-block decomposition: frame-row group g only
                # attends tokens < its end, so compute S over the visible
                # prefix instead of the full (tokens, tokens) square and
                # skip the masked upper half entirely — 2x fewer matmul
                # passes and exp/mask lanes at f=12 (tril is f-major:
                # whole past frames fully visible, tril inside the group).
                gsz = max(1, _GROUP_ROWS // (ws * ws))
                group_outs = []
                start = 0
                while start < f:
                    gf = min(gsz, f - start)
                    row0 = start * ws * ws
                    rows_n = gf * ws * ws
                    ncols = row0 + rows_n
                    s = jax.lax.dot_general(
                        q[row0 : row0 + rows_n], k[:ncols],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale
                    rg = row0 + jax.lax.broadcasted_iota(
                        jnp.int32, (rows_n, ncols), 0)
                    cg = jax.lax.broadcasted_iota(
                        jnp.int32, (rows_n, ncols), 1)
                    s = jnp.where(cg <= rg, s, NEG_INF)
                    group_outs.append(softmax_pv(s, v_win[:ncols]))
                    start += gf
                out = jnp.concatenate(group_outs, axis=0)
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                if causal:
                    s = jnp.where(tril, s, NEG_INF)
                out = softmax_pv(s, v_win)
            outs.append(out.reshape(f, ws, ws, d_pad))
        merged = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
        o_ref[0, :, :, pl.ds(c * sw, sw), :] = merged.astype(o_ref.dtype)
        return 0

    if w // sw == 1:
        body(0, 0)  # static index keeps Mosaic's alignment prover happy
    else:
        jax.lax.fori_loop(0, w // sw, body, 0)


def _kernel_tab(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
                scale: float, causal: bool, f: int, ws: int,
                w: int, d_pad: int):
    """Table-rotary variant of ``_kernel``: q/k arrive UN-rotated and the
    fp32 cos/sin tables (f, h, w, d) stream in with the window BlockSpec —
    vs re-reading and re-writing whole q/k tensors in an XLA pre-pass
    (whose ``jnp.roll``s materialize fp32 copies in HBM: 2.14 ms of the
    12.26 ms 512px-L0 temporal site, tools/probe_temporal_site.py).  No
    in-kernel trig (that variant measured 36% of kernel runtime) and no
    angle-addition factoring (fp32 phase rounding deviates at bf16 level
    for production positions): the tables ARE ``apply_rotary``'s values.
    The fp32 table blocks lane-pad 40→128, so the kernel raises
    ``vmem_limit_bytes`` above Mosaic's 16 MB default (v5e has 128 MB).
    Numerics identical to ``apply_rotary`` -> ``_kernel(rot_dim=0)``:
    fp32 rotate, bf16 cast, bf16 MXU matmuls."""
    tokens = f * ws * ws

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 1)
    tril = cols_t <= rows_t

    sw = _slice_width(w, ws)
    wins_per_slice = sw // ws

    def body(c, _):
        chunk_q = q_ref[0, :, :, pl.ds(c * sw, sw), :]
        chunk_k = k_ref[0, :, :, pl.ds(c * sw, sw), :]
        chunk_v = v_ref[0, :, :, pl.ds(c * sw, sw), :]
        chunk_cos = cos_ref[:, :, pl.ds(c * sw, sw), :]  # (f, ws, sw, d)
        chunk_sin = sin_ref[:, :, pl.ds(c * sw, sw), :]
        outs = []
        for sub in range(wins_per_slice):
            def window(chunk):
                return chunk[..., :, sub * ws : (sub + 1) * ws, :].reshape(
                    tokens, d_pad
                )

            cos = window(chunk_cos)  # (tokens, d) fp32
            sin = window(chunk_sin)

            def rotate(t):
                t32 = t.astype(jnp.float32)
                return (t32 * cos + _rotate_half_roll(t32) * sin).astype(
                    t.dtype)

            q = rotate(window(chunk_q))
            k = rotate(window(chunk_k))
            v_win = window(chunk_v)

            def softmax_pv(s, vis_v):
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                l = jnp.sum(e, axis=-1, keepdims=True)
                return jax.lax.dot_general(
                    e.astype(vis_v.dtype), vis_v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) / l

            if causal and f > 1:
                # causal frame-block decomposition — see _kernel
                gsz = max(1, _GROUP_ROWS // (ws * ws))
                group_outs = []
                start = 0
                while start < f:
                    gf = min(gsz, f - start)
                    row0 = start * ws * ws
                    rows_n = gf * ws * ws
                    ncols = row0 + rows_n
                    s = jax.lax.dot_general(
                        q[row0 : row0 + rows_n], k[:ncols],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale
                    rg = row0 + jax.lax.broadcasted_iota(
                        jnp.int32, (rows_n, ncols), 0)
                    cg = jax.lax.broadcasted_iota(
                        jnp.int32, (rows_n, ncols), 1)
                    s = jnp.where(cg <= rg, s, NEG_INF)
                    group_outs.append(softmax_pv(s, v_win[:ncols]))
                    start += gf
                out = jnp.concatenate(group_outs, axis=0)
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                if causal:
                    s = jnp.where(tril, s, NEG_INF)
                out = softmax_pv(s, v_win)
            outs.append(out.reshape(f, ws, ws, d_pad))
        merged = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
        o_ref[0, :, :, pl.ds(c * sw, sw), :] = merged.astype(o_ref.dtype)
        return 0

    if w // sw == 1:
        body(0, 0)
    else:
        jax.lax.fori_loop(0, w // sw, body, 0)


# Table-kernel VMEM cap: the fp32 table blocks lane-pad d→128 (3.1 MB each
# at 512px-L0, double-buffered) on top of the q/k/v/o strips — ~26 MB of
# blocks, over Mosaic's 16 MB default scoped budget but a fifth of the
# chip's 128 MB VMEM.
_TAB_VMEM_LIMIT = 64 * 1024 * 1024


def _check_window_divisible(shape, ws: int) -> None:
    """Loud guard: the kernel grids tile (h, w) into exact ws-windows; a
    non-divisible spatial dim would leave remainder rows/columns of the
    output UNWRITTEN (silent garbage).  Dispatchers (ops/attention.py)
    check this before selecting the kernel; calling directly with a bad
    shape is a programming error."""
    _, _, h, w, _ = shape
    if h % ws or w % ws:
        raise ValueError(
            f"SWAT kernel needs h % ws == 0 and w % ws == 0; got "
            f"h={h}, w={w}, ws={ws} — use the XLA windowed path instead")


def _swat_forward_tab(q, k, v, cos, sin, scale: float, causal: bool, ws: int):
    """Table-rotary forward. q/k/v: (B, f, h, w, d) un-rotated; cos/sin:
    fp32 (f, h, w, d) from ``ops.rotary.rotary_tables``."""
    batch, f, h, w, d = q.shape
    grid = (batch, h // ws)
    spec = pl.BlockSpec((1, f, ws, w, d), lambda b, i: (b, 0, i, 0, 0))
    tspec = pl.BlockSpec((f, ws, w, d), lambda b, i: (0, i, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _kernel_tab, scale=scale, causal=causal, f=f, ws=ws, w=w, d_pad=d,
        ),
        grid=grid,
        in_specs=[spec, spec, spec, tspec, tspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((batch, f, h, w, d), q.dtype),
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_TAB_VMEM_LIMIT,
        ),
        interpret=_INTERPRET,
    )(q, k, v, cos, sin)


def _bwd_kernel_tab(q_ref, k_ref, v_ref, cos_ref, sin_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, *, scale: float,
                    causal: bool, f: int, ws: int, w: int, d_pad: int,
                    sw: int):
    """Table-rotary fused backward: re-rotate q/k from the tables,
    recompute softmax, de-rotate dq/dk with the adjoint (t·cos −
    rotate_half(t)·sin — RHᵀ = −RH, tables pair-constant; same identity as
    ``_bwd_kernel``)."""
    tokens = f * ws * ws
    wins = sw // ws

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 1)
    tril = cols_t <= rows_t

    dqs, dks, dvs = [], [], []
    for sub in range(wins):
        def window(ref):  # (1, f, ws, sw, d) block -> (tokens, d)
            return ref[0, :, :, pl.ds(sub * ws, ws), :].reshape(tokens, d_pad)

        def window_tab(ref):  # (f, ws, sw, d) block -> (tokens, d)
            return ref[:, :, pl.ds(sub * ws, ws), :].reshape(tokens, d_pad)

        cos = window_tab(cos_ref)  # (tokens, d) fp32
        sin = window_tab(sin_ref)

        def rotate(t):
            t32 = t.astype(jnp.float32)
            return t32 * cos + _rotate_half_roll(t32) * sin

        def derotate(t32):
            return t32 * cos - _rotate_half_roll(t32) * sin

        qr = rotate(window(q_ref))  # fp32 (tokens, d)
        kr = rotate(window(k_ref))
        v32 = window(v_ref).astype(jnp.float32)
        g32 = window(g_ref).astype(jnp.float32)

        if causal and f > 1:
            gsz = max(1, _GROUP_ROWS // (ws * ws))
            dv_acc = jnp.zeros((tokens, d_pad), jnp.float32)
            dk_acc = jnp.zeros((tokens, d_pad), jnp.float32)
            dq_groups = []
            start = 0
            while start < f:
                gf = min(gsz, f - start)
                row0 = start * ws * ws
                rows_n = gf * ws * ws
                ncols = row0 + rows_n
                qg = qr[row0 : row0 + rows_n]
                gg = g32[row0 : row0 + rows_n]
                kp = kr[:ncols]
                vp = v32[:ncols]
                s = jax.lax.dot_general(
                    qg, kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                rg = row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (rows_n, ncols), 0)
                cg = jax.lax.broadcasted_iota(jnp.int32, (rows_n, ncols), 1)
                s = jnp.where(cg <= rg, s, NEG_INF)
                p = jax.nn.softmax(s, axis=-1)
                dv_c = jax.lax.dot_general(
                    p, gg, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    gg, vp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(p * dp, axis=-1, keepdims=True)
                ds = p * (dp - delta) * scale
                dq_groups.append(jax.lax.dot_general(
                    ds, kp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
                dk_c = jax.lax.dot_general(
                    ds, qg, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if ncols < tokens:
                    pad = jnp.zeros((tokens - ncols, d_pad), jnp.float32)
                    dv_c = jnp.concatenate([dv_c, pad], axis=0)
                    dk_c = jnp.concatenate([dk_c, pad], axis=0)
                dv_acc = dv_acc + dv_c
                dk_acc = dk_acc + dk_c
                start += gf
            dq = derotate(jnp.concatenate(dq_groups, axis=0))
            dk = derotate(dk_acc)
            dv = dv_acc
        else:
            s = jax.lax.dot_general(
                qr, kr, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale
            if causal:
                s = jnp.where(tril, s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            dv = jax.lax.dot_general(
                p, g32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                g32, v32, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            )
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            dq = derotate(jax.lax.dot_general(
                ds, kr, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ))
            dk = derotate(jax.lax.dot_general(
                ds, qr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ))
        shape5 = (f, ws, ws, d_pad)
        dqs.append(dq.reshape(shape5))
        dks.append(dk.reshape(shape5))
        dvs.append(dv.reshape(shape5))

    cat = lambda xs: (jnp.concatenate(xs, axis=2) if len(xs) > 1 else xs[0])  # noqa: E731
    dq_ref[0] = cat(dqs).astype(dq_ref.dtype)
    dk_ref[0] = cat(dks).astype(dk_ref.dtype)
    dv_ref[0] = cat(dvs).astype(dv_ref.dtype)


def _swat_backward_tab(q, k, v, cos, sin, g, scale: float,
                       causal: bool, ws: int):
    batch, f, h, w, d = q.shape
    sw = _bwd_strip_width(w, ws)
    assert sw is not None and w % sw == 0 and h % ws == 0
    grid = (batch, h // ws, w // sw)
    spec = pl.BlockSpec((1, f, ws, sw, d), lambda b, i, c: (b, 0, i, c, 0))
    tspec = pl.BlockSpec((f, ws, sw, d), lambda b, i, c: (0, i, c, 0))
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_tab, scale=scale, causal=causal, f=f, ws=ws, w=w,
            d_pad=d, sw=sw,
        ),
        grid=grid,
        in_specs=[spec, spec, spec, tspec, tspec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((batch, f, h, w, d), t.dtype)
                   for t in (q, k, v)],
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_TAB_VMEM_LIMIT,
        ),
        interpret=_INTERPRET,
    )(q, k, v, cos, sin, g)


def _unfused_reference_tab(q, k, v, cos, sin, scale, causal, ws):
    """XLA path with table-rotation semantics (backward fallback + tests)."""
    batch, f, h, w, d = q.shape

    def rot(t):
        t32 = t.astype(jnp.float32)
        n_ = t32.shape[-1]
        fwd = jnp.roll(t32, -1, axis=-1)
        bwd = jnp.roll(t32, 1, axis=-1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_,), 0)
        rh = jnp.where(lane % 2 == 0, -fwd, bwd)
        return (t32 * cos[None] + rh * sin[None]).astype(t.dtype)

    qr = rot(q)
    kr = rot(k)
    if ws is None or h <= 4:
        n = f * h * w
        flat = lambda t: t.reshape(batch, n, d)  # noqa: E731
        qw, kw, vw = flat(qr), flat(kr), flat(v)
    else:
        qw = window_partition(qr, ws)
        kw = window_partition(kr, ws)
        vw = window_partition(v, ws)
    logits = jnp.einsum("bnd,bmd->bnm", qw, kw,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        t = qw.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        logits = jnp.where(cols <= rows, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1).astype(vw.dtype)
    ow = jnp.einsum("bnm,bmd->bnd", p, vw)
    if ws is None or h <= 4:
        return ow.reshape(batch, f, h, w, d)
    return window_reverse(ow, ws, f, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def swat_attention_tables(q, k, v, cos, sin, scale: float, causal: bool,
                          ws: int):
    """Fused table-rotary window causal attention.  q/k/v: (B, f, h, w, d)
    UN-rotated; cos/sin fp32 (f, h, w, d) from ``ops.rotary.rotary_tables``.
    The rotation rides the kernel as table inputs instead of an XLA
    pre-rotation pass over the full q/k tensors."""
    _check_window_divisible(q.shape, ws)
    return _swat_forward_tab(q, k, v, cos, sin, scale, causal, ws)


def _fwd_tab(q, k, v, cos, sin, scale, causal, ws):
    return (swat_attention_tables(q, k, v, cos, sin, scale, causal, ws),
            (q, k, v, cos, sin))


def _bwd_tab(scale, causal, ws, residuals, g):
    q, k, v, cos, sin = residuals
    # table grads: positions are constants — zeros, DCE'd by XLA
    zt = (jnp.zeros_like(cos), jnp.zeros_like(sin))
    _, _, h, w, _ = q.shape
    if (swat_attention_available() and h % ws == 0
            and _bwd_strip_width(w, ws) is not None):
        dq, dk, dv = _swat_backward_tab(q, k, v, cos, sin, g, scale, causal,
                                        ws)
        return (dq, dk, dv) + zt

    def f(q, k, v):
        return _unfused_reference_tab(q, k, v, cos, sin, scale, causal, ws)

    _, vjp = jax.vjp(f, q, k, v)
    return tuple(vjp(g)) + zt


swat_attention_tables.defvjp(_fwd_tab, _bwd_tab)


def _swat_forward(q, k, v, scale: float, causal: bool, ws: int, rot_dim: int,
                  theta: float = 10000.0):
    """q/k/v: (B, f, h, w, d) -> same shape; B = batch*heads folded."""
    batch, f, h, w, d = q.shape
    # no head_dim padding: block last dim == array dim is tile-legal and
    # avoids 3x MXU waste at d=40 (Mosaic pads lanes internally for free)
    d_pad = d

    grid = (batch, h // ws)
    spec = pl.BlockSpec((1, f, ws, w, d_pad), lambda b, i: (b, 0, i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, causal=causal, f=f, ws=ws, h=h, w=w,
            rot_dim=rot_dim, d_pad=d_pad, theta=theta,
        ),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((batch, f, h, w, d_pad), q.dtype),
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, causal: bool, f: int, ws: int, h: int, w: int,
                rot_dim: int, d_pad: int, sw: int, theta: float):
    """Block = (1, f, ws, sw, d): a ``sw``-wide slice of one window row;
    grid (batch, h//ws, w//sw).  Per window: re-rotate q/k, recompute the
    softmax (tokens ≤ f·ws² fit VMEM), form ds, then de-rotate dq/dk with
    the rotary adjoint.  All window gradients are local to the block — no
    cross-program accumulation."""
    wi = pl.program_id(1)
    ci = pl.program_id(2)
    tokens = f * ws * ws
    wins = sw // ws

    if rot_dim > 0:
        lane = jax.lax.broadcasted_iota(jnp.int32, (tokens, d_pad), 1)
        pair = (lane // 2).astype(jnp.float32)
        inv_freq = jnp.exp(pair * (-2.0 * math.log(theta) / rot_dim))
        in_rot = lane < rot_dim

        tok = jax.lax.broadcasted_iota(jnp.int32, (tokens, d_pad), 0)
        frame = tok // (ws * ws)
        rem = tok % (ws * ws)
        row_in_win = rem // ws
        col_in_win = rem % ws

    rows_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (tokens, tokens), 1)
    tril = cols_t <= rows_t

    dqs, dks, dvs = [], [], []
    for sub in range(wins):
        j_col = ci * sw + sub * ws
        if rot_dim > 0:
            pos = (frame * (h * w) + (wi * ws + row_in_win) * w
                   + (j_col + col_in_win)).astype(jnp.float32)
            phase = pos * inv_freq
            cos = jnp.cos(phase)
            sin = jnp.sin(phase)

            def rotate(t):
                t32 = t.astype(jnp.float32)
                return jnp.where(in_rot, t32 * cos + _rotate_half_roll(t32) * sin, t32)

            def derotate(t32):
                return jnp.where(in_rot, t32 * cos - _rotate_half_roll(t32) * sin, t32)
        else:
            # rot_dim == 0: q/k arrive pre-rotated from the caller; dq/dk
            # leave un-derotated and XLA's autodiff of the caller-side
            # apply_rotary supplies the adjoint.
            def rotate(t):
                return t.astype(jnp.float32)

            def derotate(t32):
                return t32

        def window(ref):
            return ref[0, :, :, pl.ds(sub * ws, ws), :].reshape(tokens, d_pad)

        qr = rotate(window(q_ref))  # fp32 (tokens, d)
        kr = rotate(window(k_ref))
        v32 = window(v_ref).astype(jnp.float32)
        g32 = window(g_ref).astype(jnp.float32)

        if causal and f > 1:
            # Causal frame-block decomposition (mirrors the forward): each
            # frame-row group only sees its column prefix, so every matmul
            # (S, dv, dp, dq, dk) runs over [0:ncols] instead of the full
            # square — ~2x fewer MXU passes at f=12.  dk/dv accumulate over
            # groups into fp32 (tokens, d) buffers via zero-padded adds
            # (static shapes; Mosaic lowers concat-with-zeros for free).
            gsz = max(1, _GROUP_ROWS // (ws * ws))
            dv_acc = jnp.zeros((tokens, d_pad), jnp.float32)
            dk_acc = jnp.zeros((tokens, d_pad), jnp.float32)
            dq_groups = []
            start = 0
            while start < f:
                gf = min(gsz, f - start)
                row0 = start * ws * ws
                rows_n = gf * ws * ws
                ncols = row0 + rows_n
                qg = qr[row0 : row0 + rows_n]
                gg = g32[row0 : row0 + rows_n]
                kp = kr[:ncols]
                vp = v32[:ncols]
                s = jax.lax.dot_general(
                    qg, kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                rg = row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (rows_n, ncols), 0)
                cg = jax.lax.broadcasted_iota(jnp.int32, (rows_n, ncols), 1)
                s = jnp.where(cg <= rg, s, NEG_INF)
                p = jax.nn.softmax(s, axis=-1)
                dv_c = jax.lax.dot_general(
                    p, gg, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    gg, vp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(p * dp, axis=-1, keepdims=True)
                ds = p * (dp - delta) * scale
                dq_groups.append(jax.lax.dot_general(
                    ds, kp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
                dk_c = jax.lax.dot_general(
                    ds, qg, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if ncols < tokens:
                    pad = jnp.zeros((tokens - ncols, d_pad), jnp.float32)
                    dv_c = jnp.concatenate([dv_c, pad], axis=0)
                    dk_c = jnp.concatenate([dk_c, pad], axis=0)
                dv_acc = dv_acc + dv_c
                dk_acc = dk_acc + dk_c
                start += gf
            dq = derotate(jnp.concatenate(dq_groups, axis=0))
            dk = derotate(dk_acc)
            dv = dv_acc
        else:
            s = jax.lax.dot_general(
                qr, kr, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) * scale
            if causal:
                s = jnp.where(tril, s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1)

            dv = jax.lax.dot_general(
                p, g32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                g32, v32, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            )
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            dq = derotate(jax.lax.dot_general(
                ds, kr, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ))
            dk = derotate(jax.lax.dot_general(
                ds, qr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ))
        shape5 = (f, ws, ws, d_pad)
        dqs.append(dq.reshape(shape5))
        dks.append(dk.reshape(shape5))
        dvs.append(dv.reshape(shape5))

    cat = lambda xs: (jnp.concatenate(xs, axis=2) if len(xs) > 1 else xs[0])  # noqa: E731
    dq_ref[0] = cat(dqs).astype(dq_ref.dtype)
    dk_ref[0] = cat(dks).astype(dk_ref.dtype)
    dv_ref[0] = cat(dvs).astype(dv_ref.dtype)


def _bwd_strip_width(w: int, ws: int) -> int | None:
    """Widest strip <= 16 that is a whole number of windows AND divides w.

    Both constraints matter: strips must align to window boundaries (the
    kernel splits them statically into ``ws`` sub-windows) and must tile w
    exactly — with w % sw != 0 the trailing columns would belong to no grid
    cell and dq/dk/dv there would be uninitialized garbage."""
    for sw in range(min(16, w), 0, -1):
        if sw % ws == 0 and w % sw == 0:
            return sw
    return None


def _swat_backward(q, k, v, g, scale: float, causal: bool, ws: int,
                   rot_dim: int, theta: float = 10000.0):
    """Fused SWAT backward. q/k/v/g: (B, f, h, w, d) -> (dq, dk, dv)."""
    batch, f, h, w, d = q.shape
    sw = _bwd_strip_width(w, ws)  # narrow strips keep 7 live blocks in VMEM
    assert sw is not None and w % sw == 0 and h % ws == 0
    grid = (batch, h // ws, w // sw)
    spec = pl.BlockSpec((1, f, ws, sw, d), lambda b, i, c: (b, 0, i, c, 0))
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, causal=causal, f=f, ws=ws, h=h, w=w,
            rot_dim=rot_dim, d_pad=d, sw=sw, theta=theta,
        ),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((batch, f, h, w, d), t.dtype)
                   for t in (q, k, v)],
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_INTERPRET,
    )(q, k, v, g)


def _unfused_reference(q, k, v, scale, causal, ws, rot_dim):
    """The XLA path with identical semantics (used for backward + testing)."""
    batch, f, h, w, d = q.shape
    n = f * h * w
    freqs = rotary_freqs(jnp.arange(n), rot_dim)
    flat = lambda t: t.reshape(batch, n, d)  # noqa: E731
    qr = apply_rotary(flat(q), freqs).reshape(batch, f, h, w, d)
    kr = apply_rotary(flat(k), freqs).reshape(batch, f, h, w, d)
    qw = window_partition(qr, ws)
    kw = window_partition(kr, ws)
    vw = window_partition(v, ws)
    logits = jnp.einsum("bnd,bmd->bnm", qw, kw,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        t = qw.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        logits = jnp.where(cols <= rows, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1).astype(vw.dtype)
    ow = jnp.einsum("bnm,bmd->bnd", p, vw)
    return window_reverse(ow, ws, f, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def swat_attention(q, k, v, scale: float, causal: bool, ws: int, rot_dim: int):
    """Fused rotary+window+causal attention. q/k/v: (B, f, h, w, d)."""
    _check_window_divisible(q.shape, ws)
    return _swat_forward(q, k, v, scale, causal, ws, rot_dim)


def _fwd(q, k, v, scale, causal, ws, rot_dim):
    return swat_attention(q, k, v, scale, causal, ws, rot_dim), (q, k, v)


def _bwd(scale, causal, ws, rot_dim, residuals, g):
    q, k, v = residuals
    _, _, h, w, _ = q.shape
    if (swat_attention_available() and h % ws == 0
            and _bwd_strip_width(w, ws) is not None):
        return _swat_backward(q, k, v, g, scale, causal, ws, rot_dim)

    def f(q, k, v):
        return _unfused_reference(q, k, v, scale, causal, ws, rot_dim)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


swat_attention.defvjp(_fwd, _bwd)
