"""Inflated (per-frame 2D) convolution, channels-last.

The reference applies every conv per-frame via a ``(b f) c h w`` rearrange
(``seer/models/attention.py:71-77``, ``resnet.py:8-16``).  On TPU we keep
activations channels-last ``(b, f, h, w, c)`` and fold frames into the batch
with a free reshape — the conv itself maps straight onto the MXU with no
layout thrash.  There is no true 3D convolution anywhere in the model.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class InflatedConv(nn.Module):
    """2D conv applied per frame over ``(b, f, h, w, c)`` video tensors.

    Weight layout HWIO (converter transposes torch OIHW).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        x = x.reshape(b * f, h, w, c)
        pad = self.padding
        x = nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        return x.reshape(b, f, *x.shape[1:])
