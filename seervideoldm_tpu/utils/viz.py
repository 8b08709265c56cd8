"""Visualization writers: animated GIFs and annotated PNG grids.

Equivalent of reference ``utils/ddim_sampling_utils.py:46-123``
(``save_visualization`` / ``save_visualization_onegif`` /
``video_tensor_to_gif``), numpy-based.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image


def _to_uint8(video: np.ndarray) -> np.ndarray:
    """(f, h, w, c) float [0,1] -> uint8."""
    return (np.clip(video, 0.0, 1.0) * 255).astype(np.uint8)


def gif_bytes(video: np.ndarray, duration: int = 120, loop: int = 0) -> bytes:
    """In-memory GIF encode (serving path); video: (f, h, w, 3) float [0,1]."""
    import io

    buf = io.BytesIO()
    frames = [Image.fromarray(f) for f in _to_uint8(video)]
    frames[0].save(
        buf, format="GIF", save_all=True, append_images=frames[1:],
        duration=duration, loop=loop, optimize=True,
    )
    return buf.getvalue()


def video_to_gif(video: np.ndarray, path: str, duration: int = 120, loop: int = 0) -> None:
    """video: (f, h, w, 3) float [0,1]."""
    with open(path, "wb") as f:
        f.write(gif_bytes(video, duration=duration, loop=loop))


def _pad(img: np.ndarray, pad: int = 2, value: float = 0.0) -> np.ndarray:
    return np.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), constant_values=value)


def make_grid(videos: np.ndarray, nrow: int = 8) -> np.ndarray:
    """(n, h, w, c) -> tiled grid image (H, W, c), torchvision-like."""
    n, h, w, c = videos.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * h, ncol * w, c), dtype=videos.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = videos[i]
    return grid


def save_visualization(
    samples: np.ndarray,
    recon: Optional[np.ndarray],
    gt: Optional[np.ndarray],
    cond: Optional[np.ndarray],
    results_folder: str,
    global_step: int,
    num_sample_rows: int = 2,
) -> None:
    """Write per-row GIFs + one PNG frame-grid.

    samples/recon/gt: (b, f, h, w, 3) in [0,1]; cond: (b, f1, h, w, 3).
    Rows: generated | VAE reconstruction | ground truth (+ cond frames left).
    """
    os.makedirs(results_folder, exist_ok=True)
    rows = [("sample", samples)]
    if recon is not None:
        rows.append(("recon", recon))
    if gt is not None:
        rows.append(("gt", gt))

    def _tile(vid: np.ndarray) -> np.ndarray:
        """(b, f, h, w, 3) -> (f, i*h, j*w, 3) with i = num_sample_rows —
        the reference's `(i j) c f h w -> c f (i h) (j w)` GIF layout
        (ddim_sampling_utils.py:65); falls back to one row when the batch
        doesn't divide."""
        b, f, h, w, c = vid.shape
        i = num_sample_rows if num_sample_rows and b % num_sample_rows == 0 else 1
        j = b // i
        return (vid.reshape(i, j, f, h, w, c)
                .transpose(2, 0, 3, 1, 4, 5)
                .reshape(f, i * h, j * w, c))

    for name, vid in rows:
        video_to_gif(_tile(vid), os.path.join(results_folder, f"{name}-{global_step}.gif"))

    # PNG grid, reference layout (utils/ddim_sampling_utils.py:73-92): one
    # panel per batch element — [cond frames | GREEN separator |
    # gt/recon/sample rows stacked | RED separator], grey padding between
    # panels.  Green marks the conditioning input, red the panel end.
    def _strip(frames: np.ndarray) -> np.ndarray:
        """(f, h, w, 3) -> (h+4, f*(w+4), 3) with 2px border per frame."""
        return np.concatenate(list(_pad(frames)), axis=1)

    panels = []
    for b in range(samples.shape[0]):
        stack = np.concatenate([_strip(vid[b]) for _, vid in rows], axis=0)
        parts = []
        if cond is not None:
            cond_rep = np.tile(_strip(cond[b]), (len(rows), 1, 1))
            green = np.zeros((stack.shape[0], 4, 3), dtype=stack.dtype)
            green[:, :, 1] = 1.0
            parts += [cond_rep, green]
        red = np.zeros((stack.shape[0], 4, 3), dtype=stack.dtype)
        red[:, :, 0] = 1.0
        parts += [stack, red]
        panel = np.concatenate(parts, axis=1)
        panels.append(np.pad(panel, ((3, 3), (3, 3), (0, 0)), constant_values=0.5))
    grid = np.concatenate(panels, axis=0)
    Image.fromarray(_to_uint8(grid[None])[0]).save(
        os.path.join(results_folder, f"grid-{global_step}.png")
    )


def save_visualization_onegif(
    samples: np.ndarray, cond: np.ndarray, results_folder: str, global_step: int
) -> None:
    """Single-clip variant (reference inference_img path)."""
    os.makedirs(results_folder, exist_ok=True)
    full = np.concatenate([cond, samples], axis=1)  # (b, f1+f2, h, w, 3)
    video_to_gif(full[0], os.path.join(results_folder, f"sample-{global_step}.gif"))
