"""Optimizer assembly: AdamW + cosine warmup + global-norm clip + partial freeze.

Parity with the reference recipe (``train.py:205-263``): AdamW(betas 0.9/0.999,
wd 1e-2, eps 1e-8), lr scaled by ``accum × batch × num_hosts`` when
``scale_lr`` (``train.py:208-211``), diffusers "cosine" schedule with linear
warmup, grad-norm clip 0.3 (``train.py:383``), and **only** the UNet's
``temporal_attentions`` plus the whole FSText are trainable
(``train.py:123-125,188-192,213``).  Gradient accumulation via
``optax.MultiSteps``.
"""
from __future__ import annotations

from typing import Any

import jax
import optax


def trainable_mask(params: dict, scope: str = "reference") -> Any:
    """True where trainable.

    scope 'reference' (the reference recipe, ``train.py:123-125,188-192``):
    params['unet'] paths containing 'temporal_attentions' plus everything
    under params['fstext'].  scope 'all' (beyond reference): every leaf —
    the reference can ONLY fine-tune a pretrained SD backbone; full-scope
    training is what from-scratch runs and single-clip overfit proofs need
    (``tools/overfit_one_clip.py`` — a random-init frozen spatial half
    caps how far the sample can converge).
    """
    if scope == "all":
        return jax.tree_util.tree_map(lambda _: True, params)
    if scope != "reference":
        raise ValueError(f"unknown trainable scope {scope!r}")

    def mask_leaf(path, leaf) -> bool:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys and keys[0] == "fstext":
            return True
        return any("temporal_attentions" in k for k in keys)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def lr_schedule(name: str, learning_rate: float, warmup_steps: int,
                total_steps: int) -> optax.Schedule:
    """diffusers get_scheduler parity: 'cosine', 'linear', 'constant'[_with_warmup]."""
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1), 0.0
        )
    if name == "linear":
        warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        # same guard as cosine: total_steps <= warmup_steps would give
        # linear_schedule a non-positive transition count, silently pinning
        # the lr at peak forever instead of decaying
        decay = optax.linear_schedule(
            learning_rate, 0.0, max(total_steps, warmup_steps + 1) - warmup_steps)
        return optax.join_schedules([warmup, decay], [warmup_steps])
    if name in ("constant", "constant_with_warmup"):
        warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return optax.join_schedules(
            [warmup, optax.constant_schedule(learning_rate)], [warmup_steps]
        )
    raise ValueError(f"unknown lr scheduler '{name}'")


def build_optimizer(
    params: dict,
    learning_rate: float,
    scheduler: str = "cosine",
    warmup_steps: int = 10000,
    total_steps: int = 200000,
    betas: tuple[float, float] = (0.9, 0.999),
    weight_decay: float = 1e-2,
    eps: float = 1e-8,
    max_grad_norm: float = 0.3,
    accumulation_steps: int = 1,
    partitioned: bool = False,
    use_8bit: bool = False,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Returns (optimizer, schedule).

    ``partitioned=True``: ``params`` is already the trainable-only subtree
    (see ``trainer.partition_params``) — no masking needed, and optimizer
    state exists only for trainable leaves.  Otherwise frozen leaves get
    zero updates via ``multi_transform`` (but gradients/moments still
    materialize — use partitioning at real scale)."""
    schedule = lr_schedule(scheduler, learning_rate, warmup_steps, total_steps)
    if use_8bit:
        # reference `use_8bit_adam` (bitsandbytes AdamW8bit, train.py:214-222):
        # int8 blockwise-quantized moments, ~4x less optimizer-state HBM
        from .optim8bit import adamw_8bit

        adam = adamw_8bit(schedule, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay)
    else:
        adam = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    inner = optax.chain(optax.clip_by_global_norm(max_grad_norm), adam)
    if partitioned:
        tx = inner
    else:
        mask = trainable_mask(params)
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()}, param_labels=labels
        )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx, schedule
