"""Torch → JAX weight conversion.

Covers the checkpoint surface the reference uses:

- SD-1.5 UNet (2D) inflated into SeerUNet — the reference loads the 2D SD
  weights into the 3D class by name match (``train.py:175-180``); temporal
  attentions / FSText stay freshly initialized;
- released Seer fine-tuned checkpoints (``pytorch_model.bin`` SeerUNet,
  ``pytorch_model_1.bin`` FSText; reference ``inference.py:119-128``);
- SD-1.5 VAE and CLIP ViT-L/14 text encoder (diffusers / HF names).

Transforms: torch Linear ``(out, in)`` → kernel ``(in, out)``; Conv2d OIHW →
HWIO; norm ``weight`` → ``scale``; embedding ``weight`` → ``embedding``.
Name normalization: integer path components merge into their parent
(``down_blocks.0`` → ``down_blocks_0``), and an extra ``conv`` level is
inserted where our ``InflatedConv`` wraps a plain conv.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a .bin/.pt (torch pickle) or .safetensors file to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype.is_floating_point else v.numpy()
            for k, v in sd.items()}


def _normalize_path(name: str) -> list[str]:
    """'down_blocks.0.attentions.1.to_out.0.weight' ->
    ['down_blocks_0', 'attentions_1', 'to_out_0', 'weight']."""
    parts: list[str] = []
    for comp in name.split("."):
        if comp.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{comp}"
        else:
            parts.append(comp)
    return parts


def _tree_get(tree: Mapping[str, Any], path: list[str]):
    node = tree
    for p in path:
        if not isinstance(node, Mapping) or p not in node:
            return None
        node = node[p]
    return node


def _tree_set(tree: dict, path: list[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _candidates(dirs: list[str], leaf: str, value: np.ndarray):
    """Yield (path, transformed value) candidates for a torch tensor."""
    if leaf == "weight":
        if value.ndim == 4:  # conv OIHW -> HWIO
            yield dirs + ["kernel"], value.transpose(2, 3, 1, 0)
        elif value.ndim == 2:
            yield dirs + ["kernel"], value.T
            yield dirs + ["embedding"], value  # nn.Embed
        yield dirs + ["scale"], value  # norms
    elif leaf == "bias":
        yield dirs + ["bias"], value
    else:
        # plain parameters (learnable_query, pos_embed, ...)
        yield dirs + [leaf], value


def torch_to_flax(
    state_dict: Mapping[str, np.ndarray],
    target_params: Mapping[str, Any],
    strict: bool = True,
    rename: list[tuple[str, str]] | None = None,
    materialize: bool = True,
) -> tuple[dict, list[str], list[str]]:
    """Map a torch state dict onto an existing flax param tree's structure.

    Returns (new_tree_with_loaded_values, missing_torch_keys, unmatched_flax_paths).
    Values keep the target leaf's dtype.  With ``materialize=False`` no
    values are converted — targets may be ``jax.ShapeDtypeStruct``s and the
    new tree holds shapes only (full-scale name-mapping audits without
    allocating gigabytes; see tests/test_convert_manifest.py).

    ``rotary_emb.freqs`` buffers are skipped: rotary-embedding-torch 0.1.5
    (the reference pin) registers the deterministic inverse-frequency table
    as a persistent buffer, so real Seer checkpoints carry one per temporal
    attention — our rotary tables are computed analytically from the same
    ``theta=10000`` formula (``ops/rotary.py``) and have no parameter.
    """
    import jax.numpy as jnp

    new_tree: dict = {}
    missing: list[str] = []
    for name, value in state_dict.items():
        if name.endswith("rotary_emb.freqs"):
            continue
        for pat, repl in rename or []:
            name = re.sub(pat, repl, name)
        parts = _normalize_path(name)
        dirs, leaf = parts[:-1], parts[-1]
        placed = False
        for extra in ([], ["conv"]):
            for path, transformed in _candidates(dirs + extra, leaf, value):
                target = _tree_get(target_params, path)
                if target is not None and tuple(target.shape) == tuple(transformed.shape):
                    _tree_set(
                        new_tree, path,
                        jnp.asarray(transformed, dtype=target.dtype)
                        if materialize else tuple(transformed.shape),
                    )
                    placed = True
                    break
            if placed:
                break
        if not placed:
            missing.append(name)

    # fill unmatched flax leaves from the target (fresh init), tracking them
    unmatched: list[str] = []

    def fill(src, dst: dict, prefix: str):
        for key, val in src.items():
            if isinstance(val, Mapping):
                fill(val, dst.setdefault(key, {}), f"{prefix}{key}/")
            elif key not in dst:
                dst[key] = val
                unmatched.append(f"{prefix}{key}")

    fill(target_params, new_tree, "")
    if strict and missing:
        raise ValueError(f"{len(missing)} torch keys not mapped, e.g. {missing[:8]}")
    return new_tree, missing, unmatched


# --- model-specific wrappers ---

_VAE_RENAMES = [
    # flatten diffusers encoder/decoder inner paths to our flat module names
    (r"(encoder|decoder)\.down_blocks\.(\d+)\.resnets\.(\d+)\.",
     r"\1.down_blocks_\2_resnets_\3."),
    (r"(encoder|decoder)\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.",
     r"\1.down_blocks_\2_downsamplers_0_conv."),
    (r"(encoder|decoder)\.up_blocks\.(\d+)\.resnets\.(\d+)\.",
     r"\1.up_blocks_\2_resnets_\3."),
    (r"(encoder|decoder)\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.",
     r"\1.up_blocks_\2_upsamplers_0_conv."),
    (r"mid_block\.resnets\.(\d+)\.", r"mid_block_resnets_\1."),
    (r"mid_block\.attentions\.0\.", r"mid_block_attentions_0."),
    # newer diffusers attention names -> classic AttentionBlock names
    (r"mid_block_attentions_0\.to_q\.", r"mid_block_attentions_0.query."),
    (r"mid_block_attentions_0\.to_k\.", r"mid_block_attentions_0.key."),
    (r"mid_block_attentions_0\.to_v\.", r"mid_block_attentions_0.value."),
    (r"mid_block_attentions_0\.to_out\.0\.", r"mid_block_attentions_0.proj_attn."),
]


def convert_vae(state_dict: Mapping[str, np.ndarray], target_params) -> dict:
    tree, missing, _ = torch_to_flax(
        state_dict, target_params, strict=True, rename=_VAE_RENAMES
    )
    return tree


_CLIP_RENAMES = [
    (r"^text_model\.", ""),
    (r"^embeddings\.token_embedding\.", "token_embedding."),
    (r"^embeddings\.position_embedding\.weight$", "position_embedding"),
    (r"^encoder\.layers\.", "layers."),
    (r"\.mlp\.fc", ".fc"),
]


def convert_clip_text(state_dict: Mapping[str, np.ndarray], target_params) -> dict:
    sd = {k: v for k, v in state_dict.items() if "position_ids" not in k}
    tree, missing, _ = torch_to_flax(sd, target_params, strict=True, rename=_CLIP_RENAMES)
    return tree


_CLIP_VISION_RENAMES = [
    (r"^vision_model\.", ""),
    (r"^embeddings\.patch_embedding\.", "patch_embedding."),
    (r"^embeddings\.class_embedding$", "class_embedding"),
    (r"^embeddings\.position_embedding\.weight$", "position_embedding"),
    (r"^encoder\.layers\.", "layers."),
    (r"\.mlp\.fc", ".fc"),
]


def convert_clip_vision(state_dict: Mapping[str, np.ndarray], target_params) -> dict:
    """CLIP ViT image tower from a full HF ``CLIPModel`` state dict
    (``vision_model.*`` keys) — used by the CLIPSIM metric
    (``evaluation/clip_sim.py``)."""
    sd = {k: v for k, v in state_dict.items()
          if k.startswith("vision_model.") and "position_ids" not in k}
    tree, _, _ = torch_to_flax(sd, target_params, strict=True,
                               rename=_CLIP_VISION_RENAMES)
    return tree


def convert_clip_projections(state_dict: Mapping[str, np.ndarray],
                             target_params) -> dict:
    """The two no-bias projection heads of HF ``CLIPModel``."""
    sd = {k: state_dict[k]
          for k in ("visual_projection.weight", "text_projection.weight")}
    tree, _, _ = torch_to_flax(sd, target_params, strict=True)
    return tree


def convert_seer_unet(
    state_dict: Mapping[str, np.ndarray], target_params, strict: bool = True
) -> tuple[dict, list[str]]:
    """Load a SeerUNet (or plain SD-1.5 2D UNet, 'inflation') state dict.

    With an SD-1.5 2D UNet input, temporal attentions have no torch source
    and keep their fresh initialization — the reference inflation behavior
    (``train.py:175-180``).  Returns (params, freshly_initialized_paths).
    """
    tree, missing, unmatched = torch_to_flax(state_dict, target_params, strict=strict)
    return tree, unmatched


def convert_fstext(state_dict: Mapping[str, np.ndarray], target_params) -> dict:
    tree, _, _ = torch_to_flax(state_dict, target_params, strict=True)
    return tree
