"""LoRA low-rank adaptation of the UNet attention projections.

Beyond the reference: the reference fine-tunes the full temporal-attention
weights plus FSText (``train.py:123-125,188-192``).  LoRA (Hu et al. 2021,
arXiv 2106.09685) instead trains a rank-``r`` delta per attention projection
— the standard recipe for adapting a *fine-tuned* Seer checkpoint (e.g.
``sthv2_seer``) to a new domain at a fraction of the optimizer-state and
checkpoint cost.  With ``lora_rank: 8`` on the full attention scope the
trainable UNet side drops from ~200M (temporal attentions) to ~3M params.

TPU-first design: adapters live in *parameter space*, not module space.  No
model code changes — inside the jitted train step the effective kernel

    W_eff = W + (alpha/r) * A @ B          (A: (in, r), B: (r, out))

is materialized by ``apply_lora`` before ``unet.apply``; XLA fuses the tiny
rank-r matmuls into the step, gradients flow only to A/B, and Adam moments
exist only for the adapter leaves (the ``partition_params`` pattern the
trainer already uses for the frozen/trainable split).  ``B`` is
zero-initialized so step 0 is *exactly* the base model (LoRA paper §4.1).
``merge_lora`` bakes the delta into a plain checkpoint: the params-only
inference artifact is indistinguishable from a full fine-tune, so every
entry point, the serving stack, and the torch exporter work unchanged.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.traverse_util as tu
import jax
import jax.numpy as jnp

# Dense-kernel names of the attention projections (ops/attention.py); the
# reference modules they mirror are CrossAttention.to_q/k/v/to_out[0]
# (seer/models/attention.py:466-476).
ATTN_KERNELS = ("to_q", "to_k", "to_v", "to_out_0")

SCOPES = ("attention", "temporal")


def lora_target_paths(unet_params: dict, scope: str = "attention") -> list:
    """Flat paths (tuples) of the targeted attention-projection kernels.

    ``scope="attention"``: every attention projection in the UNet (spatial
    self-attn, text cross-attn, temporal/SWAT).  ``scope="temporal"``: only
    projections under ``temporal_attentions`` — the reference's trainable
    scope (``train.py:123-125``).
    """
    if scope not in SCOPES:
        raise ValueError(f"lora_targets must be one of {SCOPES}, got {scope!r}")
    flat = tu.flatten_dict(unet_params)
    out = []
    for path, leaf in flat.items():
        if len(path) < 2 or path[-1] != "kernel" or path[-2] not in ATTN_KERNELS:
            continue
        if getattr(leaf, "ndim", 0) != 2:
            continue
        if scope == "temporal" and not any(
            "temporal_attentions" in str(k) for k in path
        ):
            continue
        out.append(path)
    return sorted(out)


def init_lora(
    unet_params: dict,
    rank: int,
    rng: jax.Array,
    scope: str = "attention",
    dtype: jnp.dtype = jnp.float32,
) -> dict:
    """Initialize the adapter tree: per targeted kernel ``(in, out)``,
    ``lora_a``: (in, rank) lecun-normal, ``lora_b``: (rank, out) zeros.

    The tree mirrors the UNet param structure (``.../to_q/lora_a``) so
    generic tree machinery — checkpointing, EMA, ZeRO-1/FSDP spec inference
    — handles it with no special cases.
    """
    if rank < 1:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    paths = lora_target_paths(unet_params, scope)
    if not paths:
        raise ValueError(
            f"no LoRA target kernels found for scope {scope!r} — "
            "is this a SeerUNet param tree?"
        )
    flat_unet = tu.flatten_dict(unet_params)
    flat = {}
    for i, path in enumerate(paths):
        in_dim, out_dim = flat_unet[path].shape
        key = jax.random.fold_in(rng, i)
        # A: lecun normal (variance 1/in); B: zeros => delta starts at 0,
        # step-0 forward is bit-exact the base model
        a = jax.random.normal(key, (in_dim, rank), dtype) / math.sqrt(in_dim)
        flat[path[:-1] + ("lora_a",)] = a
        flat[path[:-1] + ("lora_b",)] = jnp.zeros((rank, out_dim), dtype)
    return tu.unflatten_dict(flat)


def apply_lora(unet_params: dict, lora: dict, scale: float) -> dict:
    """Return the UNet tree with ``W + scale * A @ B`` on adapted kernels.

    Differentiable w.r.t. ``lora`` (the train step takes grads through it);
    the delta is accumulated in fp32 and cast back to the kernel dtype, so
    a bf16-frozen base (``frozen_params_bf16``) cannot swallow small deltas
    in the add itself.
    """
    flat = dict(tu.flatten_dict(unet_params))
    flat_l = tu.flatten_dict(lora)
    for path, a in flat_l.items():
        if path[-1] != "lora_a":
            continue
        b = flat_l[path[:-1] + ("lora_b",)]
        kernel_path = path[:-1] + ("kernel",)
        w = flat[kernel_path]
        delta = jnp.asarray(scale, jnp.float32) * (
            a.astype(jnp.float32) @ b.astype(jnp.float32)
        )
        flat[kernel_path] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return tu.unflatten_dict(flat)


# Baking the delta for inference/export is the same computation — the merged
# tree loads anywhere a full fine-tune would (pipeline, serving, io/export).
merge_lora = apply_lora


def lora_scale(rank: int, alpha: Optional[float]) -> float:
    """The LoRA paper's alpha/r scaling; alpha defaults to r (scale 1)."""
    return (float(alpha) if alpha is not None else float(rank)) / float(rank)


def param_count(lora: dict) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))


def split_lora(trainable: dict) -> tuple[Optional[dict], dict]:
    """Split a trainable tree into (lora_subtree_or_None, rest)."""
    if "lora" not in trainable:
        return None, trainable
    rest = {k: v for k, v in trainable.items() if k != "lora"}
    return trainable["lora"], rest


def inference_params(trainable: dict, frozen: Optional[dict],
                     scale: float) -> dict:
    """The params-only inference artifact for a (possibly LoRA) trainable
    tree: merge trainable over frozen, then bake the adapter delta into the
    UNet kernels."""
    from .trainer import combine_params

    lora, rest = split_lora(trainable)
    full = combine_params(rest, frozen) if frozen is not None else dict(rest)
    if lora is not None:
        full = dict(full, unet=merge_lora(full["unet"], lora, scale))
    return full
