"""FVD / KVD — VideoGPT protocol (reference ``utils/fvd.py``).

- preprocess: uint8 BTHWC → scale shorter side to 224 (bilinear,
  align_corners=False — matched by jax.image half-pixel 'linear') → center
  crop → [-1, 1] (``fvd.py:7-42``);
- I3D logits in micro-batches of 16 (``fvd.py:124-132``);
- FVD = Fréchet distance with the TF-GAN symmetric-matrix-sqrt
  (``fvd.py:55-108``), computed here via symmetric eigendecomposition;
- KVD = polynomial-kernel MMD (sklearn kernel, ``fvd.py:110-122``);
- cumulative evaluation over growing embedding stacks
  (``utils/compute_fvd.py:28-45``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def preprocess_videos(videos: np.ndarray, resolution: int = 224) -> np.ndarray:
    """uint8 (b, t, h, w, c) -> float32 (b, t, res, res, c) in [-1, 1]."""
    videos = videos.astype(np.float32) / 255.0
    b, t, h, w, c = videos.shape
    scale = resolution / min(h, w)
    if h < w:
        target = (resolution, math.ceil(w * scale))
    else:
        target = (math.ceil(h * scale), resolution)
    # antialias=False: torch F.interpolate(bilinear, align_corners=False)
    # does NOT antialias on downscale; jax.image.resize does by default —
    # with it on, FVD preprocessing diverges from the VideoGPT protocol
    out = jax.image.resize(
        jnp.asarray(videos), (b, t, *target, c), method="linear", antialias=False
    )
    th, tw = target
    h0 = (th - resolution) // 2
    w0 = (tw - resolution) // 2
    out = out[:, :, h0 : h0 + resolution, w0 : w0 + resolution, :]
    return np.asarray((out - 0.5) * 2.0)


def _sym_sqrt(mat: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition.

    Equivalent to the TF-GAN svd-based routine for symmetric matrices
    (``fvd.py:55-60``: eigenvalues below eps pass through unsqrt'ed —
    faithfully reproducing that quirk is unnecessary since such values are
    ~0; we clamp at 0 instead)."""
    vals, vecs = np.linalg.eigh(mat.astype(np.float64))
    vals = np.where(vals < eps, 0.0, np.sqrt(np.maximum(vals, 0.0)))
    return (vecs * vals) @ vecs.T


def frechet_distance(x1: np.ndarray, x2: np.ndarray) -> float:
    """FVD between two embedding stacks (n, d)."""
    x1 = np.asarray(x1, dtype=np.float64).reshape(len(x1), -1)
    x2 = np.asarray(x2, dtype=np.float64).reshape(len(x2), -1)
    m1, m2 = x1.mean(axis=0), x2.mean(axis=0)
    s1 = np.atleast_2d(np.cov(x1, rowvar=False))
    s2 = np.atleast_2d(np.cov(x2, rowvar=False))
    sqrt_s1 = _sym_sqrt(s1)
    sqrt_prod = _sym_sqrt(sqrt_s1 @ s2 @ sqrt_s1)
    trace = np.trace(s1 + s2) - 2.0 * np.trace(sqrt_prod)
    return float(trace + np.sum((m1 - m2) ** 2))


def _polynomial_kernel(x: np.ndarray, y: Optional[np.ndarray] = None,
                       degree: int = 3, gamma: Optional[float] = None,
                       coef0: float = 1.0) -> np.ndarray:
    """sklearn polynomial_kernel defaults (degree 3, gamma 1/d, coef0 1)."""
    y = x if y is None else y
    gamma = gamma if gamma is not None else 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def polynomial_mmd(x: np.ndarray, y: np.ndarray) -> float:
    """KVD: unbiased polynomial-kernel MMD (``fvd.py:110-122``)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    m, n = x.shape[0], y.shape[0]
    k_xx = _polynomial_kernel(x)
    k_yy = _polynomial_kernel(y)
    k_xy = _polynomial_kernel(x, y)
    sum_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    sum_yy = (k_yy.sum() - np.trace(k_yy)) / (n * (n - 1))
    return float(sum_xx + sum_yy - 2 * k_xy.sum() / (m * n))


class FVDEvaluator:
    """Cumulative FVD/KVD over growing real/fake embedding stacks.

    Mirrors ``eval_video_fvd`` (``utils/compute_fvd.py:28-45``): append each
    bucket's I3D embeddings, recompute FVD/KVD on the full stacks.
    """

    def __init__(self, i3d, i3d_params, micro_batch: int = 16):
        self.i3d = i3d
        self.params = i3d_params
        self.micro_batch = micro_batch
        self._logits_fn = jax.jit(lambda p, v: i3d.apply({"params": p}, v))
        self.fake: list[np.ndarray] = []
        self.real: list[np.ndarray] = []

    def embed(self, videos_uint8: np.ndarray) -> np.ndarray:
        """uint8 (b, t, h, w, c) -> (b, 400) I3D logits."""
        if videos_uint8.shape[1] < 9:
            # three stride-2 temporal halvings then a VALID (2,7,7) avg-pool:
            # below 9 frames the pool output is EMPTY and FVD silently NaNs
            raise ValueError(
                f"FVD's I3D needs >= 9 frames, got {videos_uint8.shape[1]} "
                "(the reference protocol uses 16)")
        vids = preprocess_videos(videos_uint8)
        chunks = []
        for i in range(0, len(vids), self.micro_batch):
            chunks.append(np.asarray(
                self._logits_fn(self.params, jnp.asarray(vids[i : i + self.micro_batch]))
            ))
        return np.concatenate(chunks, axis=0)

    def update(self, fake_uint8: np.ndarray, real_uint8: np.ndarray) -> dict:
        self.fake.append(self.embed(fake_uint8))
        self.real.append(self.embed(real_uint8))
        fake = np.concatenate(self.fake, axis=0)
        real = np.concatenate(self.real, axis=0)
        return {
            "fvd": frechet_distance(fake, real),
            "kvd": polynomial_mmd(fake, real),
            "n": len(fake),
        }
