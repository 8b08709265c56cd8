"""Jit-wrapped flax init.

Always init under jit at real scale: an eager full-scale ``module.init``
dispatches thousands of individual ops (through the TPU relay that is
~10 minutes of pure dispatch latency), and binding the key as a Python
default would embed it as a module constant (the round-1 compile blocker
pattern).  One helper so every entry script uses the same safe form.
"""
from __future__ import annotations

from typing import Callable

import jax


def jit_init(init_fn: Callable[[jax.Array], dict], key: jax.Array):
    """``init_fn(key) -> {"params": ...}`` run under jit; returns params."""
    return jax.jit(lambda k: init_fn(k)["params"])(key)
