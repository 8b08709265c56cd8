"""Token Merging for the spatial self-attention (ToMeSD; beyond reference).

Bolya & Hoffman, "Token Merging for Fast Stable Diffusion" (arXiv
2303.17604): inside each high-resolution transformer block, redundant
spatial tokens are merged via bipartite soft matching before the
self-attention and unmerged after it — training-free, quality-preserving at
moderate ratios, and it attacks exactly the shape that pins our 512px
headline number (seq-4096 d_head-40 spatial self-attention, the largest
line in the STATUS block profile).

The reference has no equivalent; its only sequence-cost levers are SWAT
windows and attention slicing (``seer/models/attention.py:586-620``).

TPU notes:

- every shape is static: the merge count ``r`` is fixed at trace time, the
  dst/src partition is a compile-time constant, and only the *indices* of
  the merged tokens are data-dependent (top-r by best-match similarity) —
  so the whole thing jits into gathers/scatters around a smaller attention;
- the dst set is one token per ``sd x sd`` spatial cell with a
  *deterministic* seeded offset per cell (ToMeSD re-randomizes per call;
  determinism keeps our samplers reproducible and the choice is
  quality-equivalent in their ablations to within noise);
- the similarity matmul runs over the full channel dim (contraction 320+),
  so unlike the d_head-40 attention it tiles the MXU efficiently.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _dst_src_indices(h: int, w: int, sd: int, seed: int = 0):
    """Static dst/src token partition: one dst per ``sd x sd`` cell.

    Deterministic per-(h, w) seeded offsets; returns numpy int32 arrays.
    Falls back to a flat stride when the grid doesn't tile evenly.
    """
    n = h * w
    if h % sd == 0 and w % sd == 0:
        # mask to 32 bits: RandomState rejects seeds >= 2**32 (h=64 overflows)
        rng = np.random.RandomState(
            (seed ^ (h * 73856093) ^ (w * 19349663)) & 0xFFFFFFFF)
        hs, ws = h // sd, w // sd
        di = rng.randint(0, sd, size=(hs, ws))
        dj = rng.randint(0, sd, size=(hs, ws))
        rows = np.arange(hs)[:, None] * sd + di
        cols = np.arange(ws)[None, :] * sd + dj
        dst = (rows * w + cols).reshape(-1)
    else:
        dst = np.arange(0, n, sd * sd)
    mask = np.zeros(n, dtype=bool)
    mask[dst] = True
    src = np.nonzero(~mask)[0]
    return dst.astype(np.int32), src.astype(np.int32)


def bipartite_soft_matching_2d(
    metric: jnp.ndarray,
    h: int,
    w: int,
    r: int,
    sd: int = 2,
) -> Tuple[Optional[Callable], Optional[Callable]]:
    """Build (merge, unmerge) closures from token features.

    ``metric``: (B, N, C) block-input hidden states, N == h*w.  ``r`` tokens
    (capped to the src-set size) are merged into their most-similar dst
    token by cosine similarity.  ``merge(x)`` maps (B, N, C') -> (B, N-r, C')
    with merged dst rows averaged (ToMeSD ``mode="mean"``, dst included);
    ``unmerge(y)`` maps back to (B, N, C'), merged src positions receiving
    their dst row.  Returns (None, None) when r <= 0.
    """
    b, n, _ = metric.shape
    assert n == h * w, f"metric has {n} tokens, expected h*w={h * w}"
    dst_np, src_np = _dst_src_indices(h, w, sd)
    n_dst, n_src = len(dst_np), len(src_np)
    r = min(int(r), n_src)
    if r <= 0:
        return None, None
    dst_idx = jnp.asarray(dst_np)
    src_idx = jnp.asarray(src_np)

    mn = metric.astype(jnp.float32)
    mn = mn / (jnp.linalg.norm(mn, axis=-1, keepdims=True) + 1e-6)
    # bf16 matmul with fp32 accumulation: an fp32xfp32 einsum here would run
    # the MXU at 1/8 throughput and eat the attention win (similarity
    # ranking is insensitive to bf16 inputs at these magnitudes)
    mn = mn.astype(jnp.bfloat16)
    a = jnp.take(mn, src_idx, axis=1)  # (B, n_src, C)
    bm = jnp.take(mn, dst_idx, axis=1)  # (B, n_dst, C)
    scores = jnp.einsum("bic,bjc->bij", a, bm,
                        preferred_element_type=jnp.float32)
    node_max = scores.max(axis=-1)  # (B, n_src)
    node_idx = scores.argmax(axis=-1).astype(jnp.int32)  # matched dst per src
    order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)
    merge_sel = order[:, :r]  # src-set coords of the r merged tokens
    unm_sel = order[:, r:]  # src-set coords of kept tokens
    dst_of_merged = jnp.take_along_axis(node_idx, merge_sel, axis=1)  # (B, r)

    n_unm = n_src - r
    # TPU cost note (tools/microbench_tome.py): batched row gathers/scatters
    # of (B, thousands, C) tensors run ~10x off bandwidth — a naive
    # take_along_axis/at[].set implementation cost 9.75 ms at the 512px-L0
    # shape, erasing the attention win.  So: ONE sorted-row gather in merge,
    # the segment-mean as a one-hot matmul on the MXU, and unmerge as an
    # int32 index build (4 bytes/row to scatter instead of C floats)
    # followed by ONE row gather.
    dst_onehot = None  # built lazily; shared across merge calls per site

    def merge(x: jnp.ndarray) -> jnp.ndarray:
        nonlocal dst_onehot
        xs = jnp.take(x, src_idx, axis=1)
        xd = jnp.take(x, dst_idx, axis=1)
        sorted_src = jnp.take_along_axis(xs, order[..., None], axis=1)
        src_m, unm = sorted_src[:, :r], sorted_src[:, r:]
        if dst_onehot is None:
            dst_onehot = (
                dst_of_merged[..., None] == jnp.arange(n_dst)[None, None, :]
            )
        oh = dst_onehot.astype(src_m.dtype)
        summed = xd.astype(jnp.float32) + jnp.einsum(
            "brd,brc->bdc", oh, src_m, preferred_element_type=jnp.float32
        )
        counts = 1.0 + jnp.sum(dst_onehot, axis=1).astype(jnp.float32)
        xd = (summed / counts[..., None]).astype(x.dtype)
        return jnp.concatenate([unm, xd], axis=1)  # (B, n_unm + n_dst, C)

    def unmerge(y: jnp.ndarray) -> jnp.ndarray:
        # inv[p] = row of y that original position p reads from
        inv = jnp.zeros((b, n), jnp.int32)
        inv = inv.at[:, dst_idx].set(
            jnp.arange(n_unm, n_unm + n_dst, dtype=jnp.int32)[None]
        )
        pos_unm = jnp.take(src_idx, unm_sel)  # (B, n_unm)
        pos_m = jnp.take(src_idx, merge_sel)  # (B, r)
        unm_rows = jnp.broadcast_to(
            jnp.arange(n_unm, dtype=jnp.int32)[None], (b, n_unm)
        )
        inv = jax.vmap(lambda o, i, v: o.at[i].set(v))(inv, pos_unm, unm_rows)
        inv = jax.vmap(lambda o, i, v: o.at[i].set(v))(
            inv, pos_m, n_unm + dst_of_merged
        )
        return jnp.take_along_axis(y, inv[..., None], axis=1)

    return merge, unmerge
