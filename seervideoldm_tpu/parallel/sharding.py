"""Parameter sharding rules (data parallel + optional tensor parallel).

Rules map parameter-path regexes to ``PartitionSpec``s.  With a ``model``
axis in the mesh, attention QKV and FFN up-projections shard their output
features and the output projections shard their input features — the
Megatron pattern; XLA inserts the all-reduce over ICI.  Everything else is
replicated.  With a pure ``data`` mesh all parameters are replicated and the
batch is sharded (the reference's DDP equivalent).
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tensor_parallel_rules() -> list[tuple[str, P]]:
    """(regex over 'a/b/c' param paths, PartitionSpec) — first match wins."""
    return [
        # attention: shard heads (output features) of q/k/v; input of out-proj
        (r".*/(to_q|to_k|to_v)/kernel$", P(None, "model")),
        (r".*/to_out_0/kernel$", P("model", None)),
        (r".*/(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
        (r".*/out_proj/kernel$", P("model", None)),
        # feed-forward: GEGLU up-proj out features, down-proj in features
        (r".*/ff/net_0/proj/kernel$", P(None, "model")),
        (r".*/ff/net_2/kernel$", P("model", None)),
        (r".*/fc1/kernel$", P(None, "model")),
        (r".*/fc2/kernel$", P("model", None)),
    ]


def infer_param_sharding(params: Any, mesh: Mesh,
                         rules: list[tuple[str, P]] | None = None) -> Any:
    """Pytree of NamedShardings matching ``params``' structure."""
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1
    rules = rules if rules is not None else (tensor_parallel_rules() if has_model else [])
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf):
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        for pat, spec in compiled:
            if pat.match(name):
                # only shard if divisible; otherwise replicate
                ok = True
                for dim, axis in zip(leaf.shape, spec):
                    if axis is not None and dim % mesh.shape[axis] != 0:
                        ok = False
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    specs = [spec_for(path, leaf) for path, leaf in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params: Any, mesh: Mesh,
                 rules: list[tuple[str, P]] | None = None) -> Any:
    """Place parameters onto the mesh per the inferred shardings."""
    shardings = infer_param_sharding(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def _largest_divisible_spec(mesh: Mesh, shape, axis: str = "data") -> P:
    """PartitionSpec sharding the largest ``axis``-divisible dim, else P()."""
    n = int(mesh.shape.get(axis, 1))
    if n <= 1 or not shape:
        return P()
    best, best_dim = None, 0
    for i, d in enumerate(shape):
        if d % n == 0 and d > best_dim:
            best, best_dim = i, int(d)
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_param_sharding(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """FSDP / ZeRO-3 parameter layout: every leaf shards its largest
    ``data``-divisible dimension over the data axis.

    Beyond the reference (whose DDP replicates all weights on every GPU,
    ``train.py:265-267``): with the weights themselves sharded, GSPMD
    inserts a just-in-time all-gather where each layer consumes its
    (sharded) weight and a reduce-scatter for its gradient — the
    fully-sharded-data-parallel recipe expressed purely as sharding
    annotations, riding ICI.  Per-chip weight memory drops to 1/N; compute
    and training math are unchanged.  Leaves with no divisible dim stay
    replicated (correctness never depends on divisibility).
    """
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, _largest_divisible_spec(mesh, getattr(x, "shape", ()), axis)
        ),
        params,
    )


def fsdp_state_sharding(state: Any, mesh: Mesh) -> Any:
    """ZeRO-3 TrainState layout: params AND the optimizer tensors (moments,
    accumulation buffers, EMA) all shard over 'data' — ``zero1_state_sharding``
    with the params subtree sharded the FSDP way instead of replicated."""
    return zero1_state_sharding(
        state, mesh, params_sharding=fsdp_param_sharding(state.params, mesh)
    )


def zero1_state_sharding(state: Any, mesh: Mesh,
                         params_sharding: Any = None) -> Any:
    """ZeRO-1 sharding pytree for a ``training.trainer.TrainState``.

    Params stay replicated (every device still applies the full update —
    the reference's DDP semantics); the persistent per-parameter *optimizer*
    tensors — Adam moments, gradient-accumulation buffers, EMA weights —
    shard their largest ``data``-divisible dimension over the ``data`` axis.
    The Adam update is elementwise, so GSPMD computes it shard-local and
    inserts one all-gather where the updated params are consumed — the
    partitioned-optimizer recipe (Rajbhandari et al. 2020, ZeRO stage 1),
    expressed purely as sharding annotations.  Memory: moments + EMA drop
    from 3x to 3x/N of trainable-param bytes per chip.

    Leaves with no divisible dimension (scalar counters, odd shapes, tiny
    biases) stay replicated — correctness never depends on divisibility.

    ``params_sharding`` overrides the replicated default for the params
    subtree (tensor-parallel training keeps its TP layout; the moments are
    still pure-'data' sharded, which GSPMD reshards around the elementwise
    update — correct for any combination).
    """
    repl = NamedSharding(mesh, P())

    def shard_leaf(x):
        return NamedSharding(
            mesh, _largest_divisible_spec(mesh, getattr(x, "shape", ()))
        )

    return type(state)(
        step=repl,
        params=(params_sharding if params_sharding is not None
                else jax.tree.map(lambda _: repl, state.params)),
        opt_state=jax.tree.map(shard_leaf, state.opt_state),
        ema_params=(jax.tree.map(shard_leaf, state.ema_params)
                    if state.ema_params is not None else None),
    )
