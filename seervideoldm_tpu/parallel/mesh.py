"""Device meshes and batch sharding.

The reference's only distribution strategy is DDP over NCCL via accelerate
(SURVEY §2.4); here the equivalent is a 1-D ``data`` mesh with the batch
sharded over it — XLA inserts the gradient ``psum`` over ICI.  An optional
``model`` axis enables tensor-parallel sharding of attention/FFN weights
(see ``sharding.py``) for scales beyond the reference's.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Optional[dict[str, int]] = None) -> Mesh:
    """shape e.g. {"data": 8} or {"data": 4, "model": 2}; default all->data."""
    devices = jax.devices()
    if not shape:
        shape = {"data": len(devices)}
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    if int(np.prod(dims)) != len(devices):
        raise ValueError(f"mesh {shape} does not match {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(dims), axis_names)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
