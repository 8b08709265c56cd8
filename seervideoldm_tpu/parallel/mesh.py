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
    """shape e.g. {"data": 8} or {"data": 4, "model": 2}; default all->data.

    An explicit shape smaller than the device count uses the first
    ``prod(shape)`` devices (debug runs, per-host submeshes); a shape larger
    than the device count is an error.
    """
    devices = jax.devices()
    if not shape:
        shape = {"data": len(devices)}
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    n = int(np.prod(dims))
    if n > len(devices):
        raise ValueError(f"mesh {shape} does not match {len(devices)} devices")
    if n < len(devices) and jax.process_count() > 1:
        # per-host submesh: a multi-process slice of the GLOBAL device list
        # would put process-0's (non-addressable) devices in every host's
        # mesh and crash the first device_put on hosts >= 1
        local = jax.local_devices()
        if n > len(local):
            raise ValueError(
                f"mesh {shape} spans {n} devices — neither this host's "
                f"{len(local)} local devices (per-host submesh) nor all "
                f"{len(devices)} global devices; a partial multi-host mesh "
                "has no well-defined device assignment"
            )
        devices = local
    return Mesh(np.asarray(devices[:n]).reshape(dims), axis_names)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def video_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """(b, f, ...) video activations: batch over 'data', frames over 'seq'.

    Sequence parallelism (beyond the reference, SURVEY §2.4 'optional
    frame-axis sharding'): per-frame ops (convs, spatial/text attention,
    GroupNorm) are frame-local so they compute on f/seq frames per device;
    GSPMD inserts the all-gather only where the temporal attention flattens
    the frame axis.  Pass the result as ``SeerUNet(activation_sharding=...)``
    to anchor the layout at every block boundary."""
    seq = "seq" if "seq" in mesh.axis_names and mesh.shape.get("seq", 1) > 1 else None
    data = "data" if "data" in mesh.axis_names else None
    return NamedSharding(mesh, P(data, seq, *([None] * (ndim - 2))))


def global_batch_array(mesh: Mesh, local) -> jax.Array:
    """Form the GLOBAL batch array from this process's local batch shard.

    Single-controller (1 process): a plain sharded ``device_put``.
    Multi-controller: every process passes its own loader shard and gets
    back one global ``jax.Array`` of shape ``(local_batch · num_processes,
    ...)`` sharded over the ``data`` axis — the JAX equivalent of DDP's
    per-rank DataLoader feeding (reference ``train.py:247-249,265-267``).
    A host-local ``device_put`` here would be undefined for >1 process
    (every process would claim to own the whole batch).
    """
    local = np.asarray(local)
    sharding = batch_sharding(mesh, local.ndim)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def replicate_global(mesh: Mesh, tree):
    """Replicate a host-local pytree onto the (possibly multi-process) mesh.

    Every process must call this with identical values (guaranteed here by
    seeded init).  For >1 process a plain ``device_put`` onto a
    non-addressable sharding is not portable; building the global array from
    process-local data is.
    """
    sharding = replicate(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def shard_global(mesh: Mesh, tree, shardings):
    """Place a host-local pytree onto the mesh with per-leaf shardings.

    Every process passes identical full host values (guaranteed by seeded
    init / collective restore templates); each contributes only the shards
    its addressable devices own, so this works at any process count —
    the sharded-state generalization of ``replicate_global``.
    """
    def put(x, s):
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s,
                                            lambda idx: arr[idx])

    return jax.tree.map(put, tree, shardings)
