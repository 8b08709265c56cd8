"""Rotary position embedding, rotary-embedding-torch==0.1.5 convention.

The reference wraps ``RotaryEmbedding(min(32, dim_head))`` and calls
``rotate_queries_or_keys`` on ``(batch*heads, seq, head_dim)`` tensors
(``seer/models/attention.py:479-481,528-530,650-651``).  Convention details
that matter for checkpoint parity:

- ``inv_freq[j] = theta^(-2j/rot_dim)`` for ``j < rot_dim/2`` ('lang' freqs,
  theta=10000);
- per-position freqs are duplicated **adjacently/interleaved**
  (``repeat '... n -> ... (n r)', r=2``), and ``rotate_half`` operates on
  interleaved pairs ``(x0, x1) -> (-x1, x0)``;
- only the first ``rot_dim`` channels of the head are rotated; the rest pass
  through unchanged;
- positions are the index along the sequence axis.  In the reference's SWAT
  windowed temporal attention the rotary is applied to the **f-major
  flattened full-resolution sequence** (positions ``frame*(h*w) + row*w +
  col``) *before* window partitioning (``attention.py:650-655``) — so this
  module accepts arbitrary position arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rotary_freqs(positions: jnp.ndarray, rot_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Per-position rotary phases, shape ``positions.shape + (rot_dim,)``.

    Each frequency appears twice adjacently (interleaved-pair convention).
    Computed in fp32.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., rot_dim/2)
    return jnp.repeat(freqs, 2, axis=-1)  # (..., rot_dim), [f0,f0,f1,f1,...]


def rotary_tables(f: int, h: int, w: int, d: int, rot_dim: int,
                  theta: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 (f, h, w, d) cos/sin tables for the f-major full-resolution
    flattening (positions ``frame*(h*w) + row*w + col``), with pass-through
    lanes (>= rot_dim) folded in as cos=1/sin=0.

    EXACTLY ``apply_rotary``'s trig (same ``rotary_freqs`` fp32 phases —
    a factored angle-addition form was tried and rejected: at production
    position magnitudes the fp32 phase-rounding difference reaches the
    bf16 level, breaking parity with the reference's direct trig).
    Factored out so the fused SWAT kernel can consume the rotation as
    table *inputs*: the XLA pre-rotation pass re-reads and re-writes the
    full q/k tensors (its ``jnp.roll``s materialize fp32 copies in HBM —
    measured 2.14 ms/site at 512px-L0, tools/probe_temporal_site.py)
    while these tables are batch·head-invariant and ~8 MB."""
    pos = jnp.arange(f * h * w, dtype=jnp.float32).reshape(f, h, w)
    freqs = rotary_freqs(pos, rot_dim, theta)  # (f, h, w, rot_dim)
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    if d > rot_dim:
        widths = ((0, 0),) * 3 + ((0, d - rot_dim),)
        cos = jnp.pad(cos, widths, constant_values=1.0)
        sin = jnp.pad(sin, widths, constant_values=0.0)
    return cos, sin


def apply_rotary(t: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate the first ``rot_dim`` channels of ``t`` (..., seq, head_dim).

    ``freqs`` has shape broadcastable to ``t.shape[:-1] + (rot_dim,)``.

    TPU-friendly formulation: the interleave-pair `rotate_half` is a lane
    roll + parity select over the FULL head width, with pass-through lanes
    (>= rot_dim) folded into the tables as cos=1/sin=0 — no strided lane
    slicing, no (d/2, 2) relayout, no lane concat.  Measured 2.05 -> ~0.3 ms
    per q/k pair at the 512px-L0 shape (probe r3).  Identical math to the
    reference's interleaved convention (same fp32 trig)."""
    rot_dim = freqs.shape[-1]
    d = t.shape[-1]
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    if d > rot_dim:
        widths = ((0, 0),) * (freqs.ndim - 1) + ((0, d - rot_dim),)
        cos = jnp.pad(cos, widths, constant_values=1.0)
        sin = jnp.pad(sin, widths, constant_values=0.0)
    t32 = t.astype(jnp.float32)
    # rotate_half on interleaved pairs: out[2i] = -x[2i+1], out[2i+1] = x[2i]
    fwd = jnp.roll(t32, -1, axis=-1)
    bwd = jnp.roll(t32, 1, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d,), 0)
    rh = jnp.where(lane % 2 == 0, -fwd, bwd)
    return (t32 * cos + rh * sin).astype(t.dtype)
