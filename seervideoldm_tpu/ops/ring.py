"""Ring attention over the frame ('seq') mesh axis for the SWAT temporal
attention.

Beyond the reference (SURVEY §5 long-context row: "if ever needed, shard
frames across devices with a collective-permute ring").  Under sequence
parallelism the video activations keep their frame axis sharded over the
``seq`` mesh axis; the one op that needs cross-frame visibility is the SWAT
windowed temporal attention (``ops/attention.py::WindowTemporalAttention``,
reference ``seer/models/attention.py:632-703``).  The default GSPMD path
all-gathers the frame axis there, so every device transiently holds the
full-f K/V *and* its attention workspace — the memory ceiling for long
autoregressive rollouts (``pipelines/text_video.py::generate_rollout``).

This module instead keeps every frame shard resident on its own device and
rotates K/V window blocks around the ``seq`` axis with ``ppermute``
(ICI-neighbor traffic), merging per-block partial attention with the online
(flash) softmax recurrence.  Peak memory per device is O(local block), not
O(full sequence); comms volume equals one all-gather but is spread across
ring steps that overlap with the block matmuls.

Causality decomposes exactly over the ring because window tokens are
f-major (``ops/windows.py``) and each rank owns a *contiguous* global frame
range: a source block from rank ``s`` is fully visible when ``s < me``,
lower-triangular when ``s == me``, and fully masked when ``s > me`` — the
same LowerTriangularMask-over-flattened-tokens semantics the reference
executes through xformers (SURVEY §2.5.1).

The backward pass is plain autodiff through the scan with the step body
rematerialized (``jax.checkpoint``): per-step score blocks are recomputed,
never saved, so training memory matches the forward's O(block) profile —
the same recompute strategy as the fused Pallas backward kernels.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_DISABLE = False
_NEG = float(jnp.finfo(jnp.float32).min)


def set_ring_enabled(enabled: bool) -> None:
    """Honor the ``ring_attention`` config knob: force the gather-based
    paths under sequence parallelism when False."""
    global _DISABLE
    _DISABLE = not enabled


def ring_enabled() -> bool:
    return not _DISABLE


def ring_attention_applicable() -> bool:
    """Cheap pre-check for call sites: enabled AND a mesh with a multi-device
    'seq' axis is registered (set_activation_mesh filters to size > 1)."""
    if _DISABLE:
        return False
    from .pallas import get_activation_mesh

    reg = get_activation_mesh()
    return reg is not None and "seq" in reg[1]


def _ring_blocks(qw, kw, vw, scale: float, causal: bool,
                 axis_name: str, axis_size: int):
    """Online-softmax ring attention over already-windowed local tokens.

    qw/kw/vw: (W, t, d) — this rank's window blocks, tokens f-major over a
    contiguous global frame range (rank r owns global window-token range
    [r·t, (r+1)·t)).  Returns (W, t, d) in qw.dtype.
    """
    t = qw.shape[-2]
    me = jax.lax.axis_index(axis_name)
    if causal:
        rows = jnp.arange(t)[:, None]
        cols = jnp.arange(t)[None, :]
        tril = cols <= rows  # local diagonal block of the global tril
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    m0 = jnp.full(qw.shape[:-1], -jnp.inf, jnp.float32)
    l0 = jnp.zeros(qw.shape[:-1], jnp.float32)
    o0 = jnp.zeros(qw.shape, jnp.float32)

    @jax.checkpoint
    def step(carry, r):
        m, l, o, kr, vr = carry
        src = (me - r) % axis_size  # which rank's block we hold this step
        logits = jnp.einsum("wnd,wmd->wnm", qw, kr,
                            preferred_element_type=jnp.float32) * scale
        if causal:
            # src < me: fully visible; src == me: local tril; src > me:
            # fully masked (contributes exp(-inf)=0 — r=0 is always the
            # local block, so m is finite from the first step on and the
            # recurrence never sees -inf - -inf)
            block = jnp.where(
                src < me, jnp.float32(0.0),
                jnp.where(src == me,
                          jnp.where(tril, 0.0, _NEG).astype(jnp.float32),
                          jnp.float32(_NEG)))
            logits = logits + block
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "wnm,wmd->wnd", p.astype(vr.dtype), vr,
            preferred_element_type=jnp.float32)
        kr, vr = jax.lax.ppermute((kr, vr), axis_name, perm)
        return (m_new, l, o, kr, vr), None

    # scan starts on the LOCAL block (r=0: src == me) and walks backwards
    # through earlier ranks as blocks rotate forward around the ring
    (_, l, o, _, _), _ = jax.lax.scan(
        step, (m0, l0, o0, kw, vw), jnp.arange(axis_size))
    return (o / l[..., None]).astype(qw.dtype)


def ring_window_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: float, causal: bool, ws: Optional[int],
) -> Optional[jnp.ndarray]:
    """Frame-sharded SWAT attention: shard_map over the activation mesh with
    the frame axis kept on ``seq`` and a K/V ppermute ring inside.

    q/k/v: (bh, f, h, w, d) with rotary already applied (the caller applies
    it on the f-major full-resolution positions — elementwise, so it runs
    shard-local under GSPMD).  ``ws=None`` means full-frame attention (one
    window of f·h·w tokens).  Returns (bh, f, h, w, d), frame axis still
    sharded, or None when no seq-sharded mesh is registered / shapes do not
    divide — the caller must then take a gather-based path.
    """
    from .pallas import get_activation_mesh
    from .windows import window_partition, window_reverse

    if _DISABLE:
        return None
    reg = get_activation_mesh()
    if reg is None:
        return None
    mesh, axes = reg
    if "seq" not in axes:
        return None
    n_seq = mesh.shape["seq"]
    batch_axes = tuple(a for a in axes if a != "seq")
    bh, f, h, w, d = q.shape
    nb = math.prod(mesh.shape[a] for a in batch_axes) if batch_axes else 1
    if f % n_seq != 0 or bh % nb != 0:
        return None
    if ws is not None and (h % ws or w % ws):
        return None

    spec = P(batch_axes if batch_axes else None, "seq", None, None, None)

    def local_fn(ql, kl, vl):
        # (bh_loc, f_loc, h, w, d) — this rank's contiguous frame shard
        bhl, fl = ql.shape[0], ql.shape[1]
        if ws is None:
            towin = lambda x: x.reshape(bhl, fl * h * w, d)  # noqa: E731
            fromwin = lambda x: x.reshape(bhl, fl, h, w, d)  # noqa: E731
        else:
            towin = lambda x: window_partition(x, ws)  # noqa: E731
            fromwin = lambda x: window_reverse(x, ws, fl, h, w)  # noqa: E731
        out = _ring_blocks(towin(ql), towin(kl), towin(vl), scale, causal,
                           "seq", n_seq)
        return fromwin(out)

    wrapped = jax.shard_map(local_fn, mesh=mesh,
                            in_specs=(spec, spec, spec), out_specs=spec,
                            check_vma=False)
    return wrapped(q, k, v)
