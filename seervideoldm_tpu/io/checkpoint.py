"""Orbax checkpointing with reference-compatible directory conventions.

The reference saves ``learned_sdunet-steps-<N>/`` (model weights, optimizer,
RNG) plus a sidecar ``learned_sdunet-steps-<N>.pt`` with step/epoch/meter
histories (``train.py:395-399``).  Here one Orbax checkpoint directory
``learned_sdunet-steps-<N>/`` holds the whole train state + metadata, saved
asynchronously so training never blocks on I/O.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


def _step_dirs(output_dir: str) -> list[tuple[int, str]]:
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"learned_sdunet-steps-(\d+)", name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            out.append((int(m.group(1)), os.path.join(output_dir, name)))
    return sorted(out)


class CheckpointManager:
    """Async save / restore of arbitrary pytrees keyed by global step."""

    def __init__(self, output_dir: str, max_to_keep: Optional[int] = None):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()

    def path_for_step(self, step: int) -> str:
        return os.path.join(self.output_dir, f"learned_sdunet-steps-{step}")

    def save(self, step: int, state: Any, params: Any = None, wait: bool = False) -> str:
        """Save the full train state under ``<dir>/state`` and, optionally,
        a params-only tree under ``<dir>/params`` for weight-only loading."""
        path = self.path_for_step(step)
        self._ckptr.save(os.path.join(path, "state"), state, force=True)
        if params is not None:
            self._ckptr.save(os.path.join(path, "params"), params, force=True)
        if wait:
            self._ckptr.wait_until_finished()
        if self.max_to_keep is not None:
            self._ckptr.wait_until_finished()
            import jax

            # rank-0 only: every process calls save() collectively, and
            # concurrent rmtree of the same finished dirs would race
            if jax.process_index() == 0:
                dirs = _step_dirs(self.output_dir)
                for _, old in dirs[: -self.max_to_keep]:
                    import shutil

                    shutil.rmtree(old, ignore_errors=True)
        return path

    def restore(self, step: int, template: Any) -> Any:
        return self._ckptr.restore(os.path.join(self.path_for_step(step), "state"), template)

    def restore_params(self, step_dir: str, template: Any) -> Any:
        return self._ckptr.restore(os.path.join(step_dir, "params"), template)

    @staticmethod
    def restore_numpy(path: str) -> Any:
        """Restore any checkpoint subtree as host numpy arrays, ignoring the
        device topology it was saved under — a checkpoint written by an
        N-process run is readable anywhere (weight export, inspection,
        cross-topology resume templates)."""
        import jax
        import numpy as np

        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        return ckptr.restore(path, restore_args=jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree))

    def latest_step(self) -> Optional[int]:
        dirs = _step_dirs(self.output_dir)
        return dirs[-1][0] if dirs else None

    def wait(self) -> None:
        self._ckptr.wait_until_finished()
