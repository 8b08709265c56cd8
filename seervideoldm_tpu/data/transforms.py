"""Frame loading and video preprocessing.

Parity with the reference data path (``dataset/sthv2.py:50-56,66`` and
``dataset/data_utils.py:21-31``):

- Resize shorter side to ``resolution`` (PIL bilinear) → center crop →
  scale to [-1, 1];
- ``cast_num_frames``: **trilinear temporal resample** (align_corners=False)
  when the clip is longer than ``num_frames``, zero-pad when shorter.

Numpy/PIL only — no torch in the input pipeline.
"""
from __future__ import annotations

import numpy as np
from PIL import Image


def resize_center_crop(img: Image.Image, resolution: int) -> Image.Image:
    """torchvision Resize(resolution) + CenterCrop(resolution) semantics."""
    w, h = img.size
    scale = resolution / min(w, h)
    new_w, new_h = round(w * scale), round(h * scale)
    img = img.resize((new_w, new_h), Image.BILINEAR)
    left = (new_w - resolution) // 2
    top = (new_h - resolution) // 2
    return img.crop((left, top, left + resolution, top + resolution))


def image_to_model_input(img: Image.Image, resolution: int) -> np.ndarray:
    """PIL image -> (res, res, 3) float32 in [-1, 1] — THE normalization
    contract shared by training, inference_img, and serving."""
    img = resize_center_crop(img.convert("RGB"), resolution)
    return np.asarray(img, dtype=np.float32) / 255.0 * 2.0 - 1.0


def load_frame(path: str, resolution: int) -> np.ndarray:
    """Load one frame -> (h, w, 3) float32 in [-1, 1]."""
    with Image.open(path) as img:
        return image_to_model_input(img, resolution)


def _linear_resample(video: np.ndarray, frames: int) -> np.ndarray:
    """Temporal linear interp, torch trilinear align_corners=False semantics.

    video: (f, h, w, c) -> (frames, h, w, c).
    """
    f = video.shape[0]
    # source coordinate of output i: (i + 0.5) * f / frames - 0.5, clamped
    src = (np.arange(frames, dtype=np.float64) + 0.5) * (f / frames) - 0.5
    src = np.clip(src, 0.0, f - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, f - 1)
    w_hi = (src - lo).astype(np.float32).reshape(-1, 1, 1, 1)
    return video[lo] * (1.0 - w_hi) + video[hi] * w_hi


def resample_frames(video: np.ndarray, frames: int) -> np.ndarray:
    """Temporal linear resample in BOTH directions, (f,h,w,c)->(frames,h,w,c).

    Unlike ``cast_num_frames`` (reference parity: zero-pad when growing,
    ``dataset/data_utils.py``), this interpolates when upsampling — used by
    the ``is_cast_frames`` eval knob to run the 16-frame C3D IS on 12-frame
    recipes (the reference simply crashes there)."""
    return _linear_resample(video, frames) if video.shape[0] != frames else video


def cast_num_frames(video: np.ndarray, frames: int) -> np.ndarray:
    """(f, h, w, c) -> (frames, h, w, c): trilinear shrink or zero-pad."""
    f = video.shape[0]
    if f == frames:
        return video
    if f > frames:
        return _linear_resample(video, frames)
    pad = np.zeros((frames - f, *video.shape[1:]), dtype=video.dtype)
    return np.concatenate([video, pad], axis=0)
