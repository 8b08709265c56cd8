"""C3D UCF-101 classifier (video Inception Score network) in Flax.

Port of the reference's chainer C3D (``utils/models/c3d.py``): the only
non-PyTorch compute path in the reference, here unified into JAX.

- ``pre``: RGB→BGR channel swap ×128 (a fixed 1x1x1 conv in the reference,
  ``c3d.py:65-67``) on inputs in [-1, 1];
- resize each frame to 112×112 with align_corners=True bilinear (exactly
  chainer ``F.resize_images``, ``c3d.py:161-166``), then add the bias
  ``128 - mean`` where mean is the UCF-101 mean image cropped to 112
  (``c3d.py:68-71``);
- conv1a(64) pool(1,2,2) conv2a(128) pool conv3a/b(256) pool conv4a/b(512)
  pool conv5a/b(512) pool → fc6(4096) fc7(4096) fc8(101).  Chainer pools use
  ``cover_all=True`` (ceil) — replicated with explicit end-padding.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _resize_bilinear_align_corners(x, out_h: int, out_w: int):
    """Bilinear spatial resize with align_corners=True (chainer
    ``F.resize_images`` semantics): src = i * (in-1)/(out-1).

    x: (b, t, h, w, c)."""
    b, t, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        src = jnp.linspace(0.0, float(n_in - 1), n_out)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(x.dtype)
        return lo, hi, frac

    y0, y1, wy = axis_weights(h, out_h)
    x0, x1, wx = axis_weights(w, out_w)
    top = jnp.take(x, y0, axis=2)
    bot = jnp.take(x, y1, axis=2)
    rows = top * (1.0 - wy)[None, None, :, None, None] + bot * wy[None, None, :, None, None]
    left = jnp.take(rows, x0, axis=3)
    right = jnp.take(rows, x1, axis=3)
    return left * (1.0 - wx)[None, None, None, :, None] + right * wx[None, None, None, :, None]


def _max_pool_ceil(x: jnp.ndarray, kernel, stride) -> jnp.ndarray:
    """Max pool over (t, h, w) with chainer cover_all=True (ceil) semantics."""
    pads = [(0, 0)]
    for dim, k, s in zip(x.shape[1:4], kernel, stride):
        out = -(-max(dim - k, 0) // s) + 1  # cover_all output size
        pad_end = max((out - 1) * s + k - dim, 0)
        pads.append((0, pad_end))
    pads.append((0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *kernel, 1), (1, *stride, 1), padding=pads
    )


class C3D(nn.Module):
    """Input: (b, 16, h, w, 3) in [-1, 1] RGB -> (b, 101) fc8 logits."""

    num_outputs: int = 101
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, padding=1)
        conv = lambda ch, name: nn.Conv(ch, (3, 3, 3), name=name, **kw)  # noqa: E731

        # pre: BGR swap * 128, resize to 112, + (128 - mean)
        x = x[..., ::-1] * 128.0
        b, t, h, w, c = x.shape
        if t != 16:
            # reference contract: the chainer mean image is hard-shaped to 16
            # frames (c3d.py:69 Bias(shape=(3,16,112,112))) — 12-frame IS
            # crashes there too; IS is only defined for 16-frame recipes
            raise ValueError(
                f"C3D inception score requires 16-frame clips, got {t} "
                "(reference chainer C3D mean-image is 16-frame; run IS on "
                "16-frame recipes like bridge/epickitchens)"
            )
        # chainer F.resize_images (reference c3d.py:161-166) is bilinear
        # with ALIGN_CORNERS=True and no antialiasing — neither matches
        # jax.image.resize's half-pixel convention, so resize manually
        x = _resize_bilinear_align_corners(x, 112, 112)
        mean_bias = self.param(
            "mean_bias", nn.initializers.zeros, (16, 112, 112, 3), jnp.float32
        )
        x = x + mean_bias

        x = nn.relu(conv(64, "conv1a")(x))
        x = _max_pool_ceil(x, (1, 2, 2), (1, 2, 2))
        x = nn.relu(conv(128, "conv2a")(x))
        x = _max_pool_ceil(x, (2, 2, 2), (2, 2, 2))
        x = nn.relu(conv(256, "conv3a")(x))
        x = nn.relu(conv(256, "conv3b")(x))
        x = _max_pool_ceil(x, (2, 2, 2), (2, 2, 2))
        x = nn.relu(conv(512, "conv4a")(x))
        x = nn.relu(conv(512, "conv4b")(x))
        x = _max_pool_ceil(x, (2, 2, 2), (2, 2, 2))
        x = nn.relu(conv(512, "conv5a")(x))
        x = nn.relu(conv(512, "conv5b")(x))
        x = _max_pool_ceil(x, (2, 2, 2), (2, 2, 2))
        # chainer flattens (C, T, H, W)-major
        x = x.transpose(0, 4, 1, 2, 3).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc6", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(4096, name="fc7", dtype=self.dtype)(x))
        return nn.Dense(self.num_outputs, name="fc8", dtype=self.dtype)(x)


def load_c3d_params(npz_path: str, mean_path: str, target_params) -> dict:
    """Convert ``conv3d_deepnetA_ucf.npz`` (chainer) + ``mean2.npz``."""
    data = np.load(npz_path)
    out: dict = {}
    for name in ["conv1a", "conv2a", "conv3a", "conv3b", "conv4a", "conv4b",
                 "conv5a", "conv5b"]:
        w = data[f"{name}/W"]  # (out, in, t, h, w)
        out[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": jnp.asarray(data[f"{name}/b"]),
        }
    for name in ["fc6", "fc7", "fc8"]:
        out[name] = {
            "kernel": jnp.asarray(data[f"{name}/W"].T),
            "bias": jnp.asarray(data[f"{name}/b"]),
        }
    mean = np.load(mean_path)["mean"]  # (3, 16, 120, 120)
    mean = mean[:, :, 8 : 8 + 112, 8 : 8 + 112]
    out["mean_bias"] = jnp.asarray((128.0 - mean).transpose(1, 2, 3, 0))
    return out
