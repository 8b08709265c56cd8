"""Inception-v1 I3D (Kinetics-400) in Flax — the FVD embedding network.

Port of the reference's PyTorch I3D (``utils/models/i3d.py``), inference
only: TF-style SAME padding everywhere, BatchNorm in eval mode (folded
statistics), final avg-pool (2,7,7) → 1x1x1 logits conv → spatial squeeze →
time mean, returning 400-dim logits used as FVD embeddings
(``i3d.py:305-315``).

Channels-last videos ``(b, t, h, w, 3)`` in [-1, 1].
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Unit3D(nn.Module):
    """conv3d(SAME, no bias) + eval-mode BN + ReLU (reference Unit3D)."""

    out_channels: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_channels, tuple(self.kernel), strides=tuple(self.stride),
            padding="SAME", use_bias=self.use_bias, dtype=self.dtype, name="conv3d",
        )(x)
        if self.use_batch_norm:
            c = self.out_channels
            scale = self.param("bn_scale", nn.initializers.ones, (c,))
            bias = self.param("bn_bias", nn.initializers.zeros, (c,))
            mean = self.param("bn_mean", nn.initializers.zeros, (c,))
            var = self.param("bn_var", nn.initializers.ones, (c,))
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        if self.activation:
            x = nn.relu(x)
        return x


def _max_pool_same(x: jnp.ndarray, kernel: Sequence[int], stride: Sequence[int]):
    """TF-SAME max pool over (t, h, w) of a (b, t, h, w, c) tensor."""
    dims = (1, *kernel, 1)
    strides = (1, *stride, 1)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, padding="SAME"
    )


class InceptionModule(nn.Module):
    out_channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        oc = self.out_channels
        kw = dict(dtype=self.dtype)
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0", **kw)(x)
        b1 = Unit3D(oc[1], (1, 1, 1), name="b1a", **kw)(x)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b", **kw)(b1)
        b2 = Unit3D(oc[3], (1, 1, 1), name="b2a", **kw)(x)
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b", **kw)(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b", **kw)(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    num_classes: int = 400
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, t, 224, 224, 3) in [-1, 1] -> (b, num_classes) logits."""
        kw = dict(dtype=self.dtype)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7", **kw)(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_2a_3x3
        x = Unit3D(64, (1, 1, 1), name="Conv3d_2b_1x1", **kw)(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3", **kw)(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_3a_3x3
        x = InceptionModule([64, 96, 128, 16, 32, 32], name="Mixed_3b", **kw)(x)
        x = InceptionModule([128, 128, 192, 32, 96, 64], name="Mixed_3c", **kw)(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))  # MaxPool3d_4a_3x3
        x = InceptionModule([192, 96, 208, 16, 48, 64], name="Mixed_4b", **kw)(x)
        x = InceptionModule([160, 112, 224, 24, 64, 64], name="Mixed_4c", **kw)(x)
        x = InceptionModule([128, 128, 256, 24, 64, 64], name="Mixed_4d", **kw)(x)
        x = InceptionModule([112, 144, 288, 32, 64, 64], name="Mixed_4e", **kw)(x)
        x = InceptionModule([256, 160, 320, 32, 128, 128], name="Mixed_4f", **kw)(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))  # MaxPool3d_5a_2x2
        x = InceptionModule([256, 160, 320, 32, 128, 128], name="Mixed_5b", **kw)(x)
        x = InceptionModule([384, 192, 384, 48, 128, 128], name="Mixed_5c", **kw)(x)
        # avg pool (2, 7, 7), stride 1, VALID
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1), padding="VALID"
        ) / (2 * 7 * 7)
        x = Unit3D(self.num_classes, (1, 1, 1), use_batch_norm=False, use_bias=True,
                   activation=False, name="logits", **kw)(x)
        # (b, t', 1, 1, c) -> squeeze spatial, mean over time
        return x.squeeze(axis=(2, 3)).mean(axis=1)


def load_i3d_params(path: str, target_params) -> dict:
    """Convert the reference's ``i3d_pretrained_400.pt`` torch weights.

    Torch conv3d OITHW -> flax THWIO; BN running stats -> folded params.
    """
    from ..io.convert import load_torch_state_dict

    sd = load_torch_state_dict(path)
    out: dict = {}

    def set_path(tree: dict, path: list[str], value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for name, value in sd.items():
        parts = name.split(".")
        # e.g. Mixed_3b.b1a.conv3d.weight / Conv3d_1a_7x7.bn.running_mean
        if parts[-2] == "conv3d" and parts[-1] == "weight":
            set_path(out, parts[:-1] + ["kernel"], value.transpose(2, 3, 4, 1, 0))
        elif parts[-2] == "conv3d" and parts[-1] == "bias":
            set_path(out, parts[:-1] + ["bias"], value)
        elif parts[-2] == "bn":
            leaf = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(parts[-1])
            if leaf:
                set_path(out, parts[:-2] + [leaf], value)
    # sanity: structures AND shapes must match
    missing = []
    bad_shape = []

    def check(src, dst, prefix=""):
        for k, v in src.items():
            if isinstance(v, dict):
                check(v, dst.get(k, {}), prefix + k + "/")
            elif k not in dst:
                missing.append(prefix + k)
            elif tuple(dst[k].shape) != tuple(v.shape):
                bad_shape.append(f"{prefix}{k}: {tuple(dst[k].shape)} != {tuple(v.shape)}")

    check(target_params, out)
    if missing:
        raise ValueError(f"i3d conversion missing {len(missing)} params: {missing[:5]}")
    if bad_shape:
        raise ValueError(f"i3d conversion shape mismatches: {bad_shape[:5]}")
    return out
