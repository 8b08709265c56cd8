"""Multi-controller training e2e: 2 processes × 2 CPU devices vs 1 process
× 4 devices must produce the SAME training trajectory on the same global
batch — the JAX equivalent of the reference's DDP-at-any-world-size
(``/root/reference/train.py:265-267,382``).

This drives the REAL ``train.py`` (config parsing, loader sharding,
``jax.make_array_from_process_local_data`` batch feeding, sharded train
step, **collective** Orbax save) in both topologies.  Every dataset clip is
identical, so the global batch content is invariant to the loader's
per-process interleaving and losses/params must match across topologies.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from test_entry_scripts import TINY_OVERRIDES  # noqa: E402


def _make_constant_sthv2(root, n_clips=4, n_frames=5):
    """Sthv2 tree where every clip/prompt is identical (permutation-proof)."""
    ann = os.path.join(root, "annotations")
    os.makedirs(ann, exist_ok=True)
    entries = [{"id": str(i), "label": "doing the same thing"} for i in range(n_clips)]
    with open(os.path.join(ann, "train.json"), "w") as f:
        json.dump(entries, f)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (20, 26, 3), dtype=np.uint8) for _ in range(n_frames)]
    for e in entries:
        d = os.path.join(root, "rawframes", e["id"])
        os.makedirs(d, exist_ok=True)
        for j, fr in enumerate(frames):
            Image.fromarray(fr).save(os.path.join(d, f"{j:04d}.jpg"))


def _base_cfg(out_dir, data_dir, batch):
    return {
        "output_dir": out_dir, "data_dir": data_dir, "dataset": "sthv2",
        "resolution": 16, "cond_frames": 1, "num_frames": 4,
        "train_batch_size": batch, "gradient_accumulation_steps": 1,
        "learning_rate": 1e-3, "scale_lr": False, "lr_warmup_steps": 1,
        "max_train_steps": 2, "save_steps": 2, "num_workers": 2,
        "mixed_precision": "no", "seed": 0,
        "model_overrides": TINY_OVERRIDES,
    }


def _env(n_local_devices, coordinator=None, rank=None, nproc=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize TPU trigger
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    env["JAX_CACHE_DIR"] = "/tmp/jax_test_cache_mp"
    if coordinator is not None:
        env["JAX_COORDINATOR_ADDRESS"] = coordinator
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(rank)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()
    return addr


def _restore_params(out_dir, step):
    from seervideoldm_tpu.io.checkpoint import CheckpointManager

    path = os.path.join(out_dir, f"learned_sdunet-steps-{step}", "params")
    return CheckpointManager.restore_numpy(path)


@pytest.mark.slow
def test_two_process_sharded_train_matches_single_process(tmp_path):
    data_dir = str(tmp_path / "data")
    _make_constant_sthv2(data_dir)

    # --- topology A: 1 process, 4 devices, global batch 4 ---
    out_a = str(tmp_path / "out_1proc")
    cfg_a = _base_cfg(out_a, data_dir, batch=4)
    cfg_path_a = str(tmp_path / "train_a.yaml")
    with open(cfg_path_a, "w") as f:
        yaml.dump(cfg_a, f)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "--config", cfg_path_a],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=_env(4),
    )
    assert proc.returncode == 0, f"1-proc run failed:\n{proc.stdout}\n{proc.stderr}"

    # --- topology B: 2 processes × 2 devices, per-process batch 2 ---
    out_b = str(tmp_path / "out_2proc")
    cfg_b = _base_cfg(out_b, data_dir, batch=2)
    cfg_path_b = str(tmp_path / "train_b.yaml")
    with open(cfg_path_b, "w") as f:
        yaml.dump(cfg_b, f)
    addr = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train.py"), "--config", cfg_path_b],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=REPO,
            env=_env(2, coordinator=addr, rank=rank, nproc=2),
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"2-proc rank {rank} failed:\n{out}"

    # --- the collective Orbax save completed from BOTH topologies ---
    for out_dir in (out_a, out_b):
        assert os.path.isdir(os.path.join(out_dir, "learned_sdunet-steps-2", "state"))
        assert os.path.exists(os.path.join(out_dir, "learned_sdunet-steps-2.json"))

    # --- loss trajectories equal (same global batch, same seed) ---
    with open(os.path.join(out_a, "learned_sdunet-steps-2.json")) as f:
        meter_a = json.load(f)["losses_train"]
    with open(os.path.join(out_b, "learned_sdunet-steps-2.json")) as f:
        meter_b = json.load(f)["losses_train"]
    assert meter_a["steps"] == meter_b["steps"] == [1, 2]
    np.testing.assert_allclose(meter_a["vals"], meter_b["vals"], rtol=1e-4)

    # --- final parameters equal: the sharded update is topology-invariant ---
    params_a = _restore_params(out_a, 2)
    params_b = _restore_params(out_b, 2)
    flat_a, flat_b = {}, {}
    _flatten("", params_a, flat_a)
    _flatten("", params_b, flat_b)
    assert flat_a.keys() == flat_b.keys()
    for key in flat_a:
        np.testing.assert_allclose(
            flat_a[key], flat_b[key], rtol=2e-4, atol=1e-5, err_msg=key
        )


def _flatten(prefix, tree, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}", v, out)
    else:
        out[prefix] = np.asarray(tree)
