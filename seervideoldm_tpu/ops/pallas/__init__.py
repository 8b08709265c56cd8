from .flash_attention import flash_attention, flash_attention_available

# Mesh whose axes shard the attention *batch* dimension, registered by the
# entry points (pipelines/loading.py) whenever activations are sharded.
# pallas_call is an opaque custom call GSPMD cannot partition, so under a
# multi-device mesh the kernels must run inside shard_map (manual
# partitioning over the batch dim — embarrassingly parallel, no collectives
# inside); without this, XLA either rejects the sharded operands or
# replicates the whole computation onto every device.
#
# Process-global BY DESIGN: the CLI pattern is one model stack per process,
# and load_models() (re)sets this on every call — including back to None
# for single-device runs.  Code that builds models by hand on a different
# mesh in the same process must call set_activation_mesh itself (the
# sharded-kernel tests do, with finally-blocks).
_ACTIVATION_MESH = None  # (Mesh, tuple[axis, ...]) or None


_PALLAS_ENABLED = True


def set_pallas_enabled(enabled: bool) -> None:
    """Honor the ``use_pallas_attention`` config knob (config.py): force the
    XLA paths everywhere when False (attention kernels AND the fused
    GEGLU feed-forward)."""
    import importlib

    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(enabled)
    # NB: `from . import flash_attention` would return the re-exported
    # FUNCTION (rebound by the import above), not the module
    _fa = importlib.import_module(f"{__name__}.flash_attention")
    _swat = importlib.import_module(f"{__name__}.swat_attention")
    _fa._DISABLE = not enabled
    _swat._DISABLE = not enabled


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED


def set_activation_mesh(mesh, axes=None) -> None:
    """Register (or clear, with ``mesh=None``) the mesh sharding attention
    batch dims.  ``axes`` defaults to every axis present with size > 1:
    ``data`` (batch), ``seq`` (frames — folded into the batch dim at the
    per-frame attention sites), and ``model`` (tensor parallelism — under
    a TP mesh the head-sharded q/k/v activations reaching a raw
    pallas_call would be just as opaque to GSPMD).  All registered axes
    shard axis 0: shard_map reshards operands to the spec, and the
    attention kernels are pure batch-parallel maps, so ANY axis-0
    partition computes the right answer regardless of how the operands
    were sharded on arrival."""
    global _ACTIVATION_MESH
    if mesh is None:
        _ACTIVATION_MESH = None
        return
    if axes is None:
        axes = tuple(a for a in ("data", "seq", "model")
                     if a in mesh.axis_names and mesh.shape[a] > 1)
    _ACTIVATION_MESH = (mesh, tuple(axes)) if axes else None


def get_activation_mesh():
    return _ACTIVATION_MESH


def maybe_shard_batched(fn, *arrays, replicated=()):
    """Run ``fn(*arrays, *replicated)`` under shard_map over the registered
    activation mesh, sharding ONLY axis 0 of every ``arrays`` operand (and
    of the output, which must have the same axis-0 length); ``replicated``
    operands (e.g. batch-invariant rotary tables) pass through whole on
    every device.  Returns ``None`` when axis 0 does not divide the mesh —
    the caller must then take a GSPMD-partitionable (non-Pallas) path
    instead of calling the kernel raw.

    shard_map reshards the operands to the requested specs, so this is
    correct whatever layout the inputs arrive in (e.g. a frame axis sharded
    over ``seq`` that ``fn`` needs whole: each device then gets a batch
    sub-range of full-length sequences — the same data motion GSPMD's
    all-gather would do, but the fused kernel stays usable)."""
    import math

    import jax
    from jax.sharding import PartitionSpec as P

    reg = _ACTIVATION_MESH
    assert reg is not None, "maybe_shard_batched called with no mesh registered"
    mesh, axes = reg
    total = math.prod(mesh.shape[a] for a in axes)
    b = arrays[0].shape[0]
    if b % total != 0 or any(x.shape[0] != b for x in arrays):
        return None
    spec = lambda nd: P(axes, *([None] * (nd - 1)))  # noqa: E731
    wrapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(tuple(spec(x.ndim) for x in arrays)
                  + tuple(P(*([None] * x.ndim)) for x in replicated)),
        out_specs=spec(arrays[0].ndim),
        check_vma=False,
    )
    return wrapped(*arrays, *replicated)


__all__ = [
    "flash_attention", "flash_attention_available", "set_pallas_enabled",
    "pallas_enabled", "set_activation_mesh", "get_activation_mesh",
    "maybe_shard_batched",
]
