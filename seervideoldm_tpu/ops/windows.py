"""SWAT spatio-temporal window partitioning.

Replicates the reference semantics (``seer/models/attention.py:42-69``):
``window_partition`` maps ``(B, F, H, W, C)`` to ``(nW*B, F*ws*ws, C)`` where
each window's token sequence is **f-major** (all of frame 0's ws² pixels,
then frame 1's, ...), and the window-grid index is *major* relative to batch
(reference permute puts ``(H//ws, W//ws)`` in front of ``B``).

Window-size selection rule (``attention.py:31-34, 661-668``): full-frame
attention when ``h <= MIN_WIN_SIZE``; else window 8 when ``h // 8 >= 4``,
else 4.
"""
from __future__ import annotations

import jax.numpy as jnp

MAX_WIN_SIZE = 8
MAX_RATIO = 4
MIN_WIN_SIZE = 4


def select_window_size(h: int) -> int | None:
    """None means full-frame (no windowing)."""
    if h <= MIN_WIN_SIZE:
        return None
    return MAX_WIN_SIZE if (h // MAX_WIN_SIZE) >= MAX_RATIO else MIN_WIN_SIZE


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, F, H, W, C) -> (nW*B, F*ws*ws, C), window-grid-major ordering."""
    b, f, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, f, h // ws, ws, w // ws, ws, c)
    # reference permute(2, 4, 0, 1, 3, 5, 6): (H//ws, W//ws, B, F, ws, ws, C)
    x = x.transpose(2, 4, 0, 1, 3, 5, 6)
    return x.reshape(-1, f * ws * ws, c)


def window_reverse(windows: jnp.ndarray, window_size: int, f: int, h: int, w: int) -> jnp.ndarray:
    """(nW*B, F*ws*ws, C) -> (B, F, H, W, C)."""
    ws = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(h // ws, w // ws, b, f, ws, ws, c)
    # reference permute(2, 3, 0, 4, 1, 5, 6): (B, F, H//ws, ws, W//ws, ws, C)
    x = x.transpose(2, 3, 0, 4, 1, 5, 6)
    return x.reshape(b, f, h, w, c)
