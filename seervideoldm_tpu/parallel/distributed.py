"""Multi-host initialization (pod scale).

The reference's process topology comes from ``accelerate launch`` env vars
(SURVEY §2.4); here one call wires JAX's multi-host runtime: every host
runs the same program, collectives ride ICI within a slice and DCN across
slices.  Safe to call unconditionally — a no-op for single-host runs unless
coordinator env vars are present.
"""
from __future__ import annotations

import os

import jax


def initialize_distributed() -> None:
    """Initialize jax.distributed from standard env vars when present.

    Honors ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` or the TPU pod metadata JAX discovers natively.
    """
    # Do NOT probe jax.process_count() here: it initializes the XLA backend,
    # after which jax.distributed.initialize() refuses to run — it must be
    # the first JAX call on a multi-host launch.  The already-initialized
    # probe uses a private module; guard it so a JAX upgrade degrades to the
    # RuntimeError fallback instead of crashing at import.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except Exception:
        pass
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    try:
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        elif os.environ.get("TPU_WORKER_HOSTNAMES") and os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            jax.distributed.initialize()
    except RuntimeError as exc:
        if "already" not in str(exc):  # double-init is benign; else re-raise
            raise
    # NOTE: jax_share_binary_between_hosts is deliberately NOT enabled.  Its
    # compile-on-rank-0-and-publish rendezvous deadlocks when the persistent
    # compile cache hits on one rank but misses on another (the hitting rank
    # never publishes; the missing rank blocks on the KV get forever —
    # observed on this exact train loop).  Rank skew at the first collective
    # is handled instead by AOT-compile + barrier (trainer.compile_aligned).


def barrier_sync(name: str, timeout_ms: int = 1_200_000) -> None:
    """Host-level barrier over the coordination service (no device collective).

    XLA's CPU Gloo backend gives each *new* communicator a hard 30 s
    rendezvous window at its first execution; ranks entering the first
    collective minutes apart (e.g. skewed trace/compile) kill the run.  A
    coordination-service barrier has a configurable timeout and no device
    involvement — use it to phase-lock ranks between compile and the first
    execution.  No-op for single-process runs.
    """
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed as _dist

        client = getattr(_dist.global_state, "client", None)
    except Exception:
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def gather_across_hosts(x) -> "np.ndarray":
    """Concatenate per-host batches along axis 0 across all processes.

    The reference all-gathers predictions/GT across ranks before FVD
    (``eval.py:226-231``, ``utils/compute_fvd.py:17-26``) and before
    visualization (``utils/ddim_sampling_utils.py:60-63``); this is the JAX
    equivalent.  Identity on single-host runs.
    """
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x), tiled=True))


def is_main_process() -> bool:
    """True on the host that should write files (reference rank-0 gating)."""
    return jax.process_index() == 0
