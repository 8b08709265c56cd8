"""JAX → torch checkpoint export (the inverse of ``convert.py``).

Lets a user hand a checkpoint fine-tuned in this framework back to the
PyTorch reference: writes ``pytorch_model.bin`` (SeerUNet) and
``pytorch_model_1.bin`` (FSText) with exactly the names/layouts the
reference's strict ``load_state_dict`` expects
(``/root/reference/inference.py:119-128``).

The torch name set cannot be derived mechanically from a flax tree alone:
genuine underscore-digit attributes (``time_embedding.linear_1``) are
indistinguishable from flattened list indices (``down_blocks_0``), and the
``conv`` level our ``InflatedConv`` inserts collides with genuine ``.conv.``
submodules.  So the export is manifest-driven: the vendored name→shape
manifests (``reference_manifests.json``, generated from the reference's own
torch modules) freeze the external contract, and each torch key is pulled
from the flax tree by inverting the same candidate rules ``torch_to_flax``
applies — a key maps forward iff it maps backward.

``rotary_emb.freqs`` buffers (persistent in rotary-embedding-torch 0.1.5,
so the strict load REQUIRES them) have no flax parameter — our tables are
analytic — and are synthesized from the same ``theta=10000`` formula.
"""
from __future__ import annotations

import json
import os
from typing import Any, Mapping, Sequence

import numpy as np

from .convert import _normalize_path, _tree_get

_MANIFESTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "reference_manifests.json")


def load_reference_manifests() -> dict[str, dict[str, list[int]]]:
    """Vendored name→shape manifests of the reference checkpoint surface."""
    with open(_MANIFESTS) as f:
        return json.load(f)


def _rotary_freqs(dim: int) -> np.ndarray:
    # rotary-embedding-torch 0.1.5 'lang' init: 1/theta^(2i/dim), theta=10000
    return 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))


def _inverse_candidates(dirs: list[str], leaf: str):
    """Yield (flax path, shape_fn, value_fn) candidates for a torch key —
    the exact inverse of ``convert._candidates``, in the same priority."""
    ident = lambda v: v  # noqa: E731
    if leaf == "weight":
        def conv_or_linear_shape(s: Sequence[int]) -> tuple:
            if len(s) == 4:  # HWIO -> OIHW
                return (s[3], s[2], s[0], s[1])
            if len(s) == 2:
                return (s[1], s[0])
            return tuple(s)

        def conv_or_linear_value(v: np.ndarray) -> np.ndarray:
            if v.ndim == 4:
                return v.transpose(3, 2, 0, 1)
            if v.ndim == 2:
                return v.T
            return v

        yield dirs + ["kernel"], conv_or_linear_shape, conv_or_linear_value
        yield dirs + ["embedding"], tuple, ident
        yield dirs + ["scale"], tuple, ident
    elif leaf == "bias":
        yield dirs + ["bias"], tuple, ident
    else:
        yield dirs + [leaf], tuple, ident


def flax_to_torch(
    params: Mapping[str, Any],
    manifest: Mapping[str, Sequence[int]],
    strict: bool = True,
    materialize: bool = True,
) -> tuple[dict[str, Any], list[str], list[str]]:
    """Export a flax param tree as a torch state dict per ``manifest``.

    Returns ``(state_dict, missing_torch_keys, unused_flax_paths)``.  With
    ``materialize=False`` the state dict holds shapes only and ``params``
    may be ``jax.ShapeDtypeStruct``s (full-scale audits without weights).
    Values are fp32 numpy (the reference casts to its own dtype on load).
    """
    out: dict[str, Any] = {}
    missing: list[str] = []
    consumed: set[tuple] = set()
    for name, shape in manifest.items():
        shape = tuple(shape)
        if name.endswith("rotary_emb.freqs"):
            out[name] = _rotary_freqs(2 * shape[0]) if materialize else shape
            continue
        parts = _normalize_path(name)
        dirs, leaf = parts[:-1], parts[-1]
        placed = False
        for extra in ([], ["conv"]):
            for path, shape_fn, value_fn in _inverse_candidates(dirs + extra, leaf):
                src = _tree_get(params, path)
                if src is None or shape_fn(tuple(src.shape)) != shape:
                    continue
                consumed.add(tuple(path))
                if materialize:
                    val = np.asarray(src)
                    if val.dtype != np.float32:  # incl. ml_dtypes bfloat16
                        val = val.astype(np.float32)
                    # np.array: contiguous AND writable (jax buffers are
                    # read-only views; torch.from_numpy needs writable)
                    out[name] = np.array(value_fn(val))
                else:
                    out[name] = shape
                placed = True
                break
            if placed:
                break
        if not placed:
            missing.append(name)

    import flax.traverse_util as tu

    unused = ["/".join(k) for k in tu.flatten_dict(params)
              if k not in consumed]
    if strict and missing:
        raise ValueError(
            f"{len(missing)} reference keys have no source leaf, "
            f"e.g. {missing[:8]}"
        )
    return out, missing, unused


def export_reference_checkpoint(
    unet_params: Mapping[str, Any],
    fstext_params: Mapping[str, Any],
    out_dir: str,
    manifests: Mapping[str, Mapping[str, Sequence[int]]] | None = None,
) -> tuple[str, str]:
    """Write the reference's two-file checkpoint layout; returns the paths."""
    import torch

    m = manifests or load_reference_manifests()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for params, key, fname in (
        (unet_params, "seer_unet", "pytorch_model.bin"),
        (fstext_params, "fstext", "pytorch_model_1.bin"),
    ):
        sd, _, unused = flax_to_torch(params, m[key], strict=True)
        if unused:
            raise ValueError(
                f"{len(unused)} {key} leaves not exported (manifest/model "
                f"mismatch), e.g. {unused[:8]}"
            )
        path = os.path.join(out_dir, fname)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
        paths.append(path)
    return tuple(paths)
