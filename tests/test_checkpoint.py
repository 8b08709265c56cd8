"""Checkpoint save/restore round-trips (state + params-only) and the
reference directory naming convention."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from seervideoldm_tpu.io.checkpoint import CheckpointManager


def _state():
    return {
        "step": jnp.asarray(7, jnp.int32),
        "params": {"unet": {"w": jnp.arange(6.0).reshape(2, 3)},
                   "fstext": {"q": jnp.ones((4,))}},
        "opt_state": {"mu": {"unet": {"w": jnp.zeros((2, 3))},
                             "fstext": {"q": jnp.zeros((4,))}}},
    }


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    state = _state()
    path = mgr.save(1000, state, params=state["params"], wait=True)
    assert path.endswith("learned_sdunet-steps-1000")
    assert os.path.isdir(os.path.join(path, "state"))
    assert os.path.isdir(os.path.join(path, "params"))

    template = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore(1000, template)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["unet"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(restored["step"]) == 7

    p_template = jax.tree.map(jnp.zeros_like, state["params"])
    params = mgr.restore_params(path, p_template)
    np.testing.assert_array_equal(np.asarray(params["fstext"]["q"]), np.ones(4))


def test_latest_step_and_max_to_keep(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    state = _state()
    for step in (10, 20, 30):
        mgr.save(step, state, wait=True)
    assert mgr.latest_step() == 30
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("learned_"))
    assert kept == ["learned_sdunet-steps-20", "learned_sdunet-steps-30"]
