"""Dry-run drive of the real-weights FVD-parity runbook
(``tools/fvd_parity_runbook.py``): proves the documented command chain —
convert → golden-latents (+ compare) → eval.py FVD — EXECUTES end-to-end,
so a weights-holder only has to swap in real paths (docs/FVD_PARITY.md).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNBOOK = os.path.join(REPO, "tools", "fvd_parity_runbook.py")

from tests.test_entry_scripts import _make_sthv2  # noqa: E402


def _run(args, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = ""
    env["JAX_CACHE_DIR"] = "/tmp/jax_test_cache"
    proc = subprocess.run([sys.executable, RUNBOOK, *args],
                          capture_output=True, text=True, timeout=1200,
                          cwd=cwd, env=env)
    assert proc.returncode == 0, f"runbook failed:\n{proc.stdout}\n{proc.stderr}"
    return proc


def _base_cfg(tmp_path, **extra):
    cfg = {"output_dir": str(tmp_path / "out"), "seed": 0, "scale": 7.5,
           "num_workers": 2, "val_batch_size": 2, **extra}
    path = str(tmp_path / "runbook.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    return path


@pytest.mark.slow
def test_runbook_convert_and_golden_dry_run(tmp_path):
    cfg = _base_cfg(tmp_path)
    out = str(tmp_path / "parity")
    _run(["convert", "--config", cfg, "--dry-run"])
    proc = _run(["golden", "--config", cfg, "--dry-run", "--out", out])
    npz = os.path.join(out, "golden_latents.npz")
    assert os.path.exists(npz)
    d = np.load(npz)
    assert set(d.files) >= {"x_T", "cond", "latents"}
    assert np.isfinite(d["latents"]).all()
    # the printed companion snippet tells the weights-holder what to run
    assert "torch_latents.npz" in proc.stdout

    # self-compare: our own latents as the "torch side" must report parity
    np.savez(str(tmp_path / "torch_latents.npz"), latents=d["latents"])
    proc = _run(["golden", "--config", cfg, "--dry-run", "--out", out,
                 "--torch_latents", str(tmp_path / "torch_latents.npz")])
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["parity"] is True and report["maxdiff"] == 0.0

    # a mismatched torch side must FAIL the stage
    np.savez(str(tmp_path / "bad.npz"), latents=d["latents"] + 1.0)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO, XLA_FLAGS="",
               JAX_CACHE_DIR="/tmp/jax_test_cache")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    bad = subprocess.run(
        [sys.executable, RUNBOOK, "golden", "--config", cfg, "--dry-run",
         "--out", out, "--torch_latents", str(tmp_path / "bad.npz")],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env)
    assert bad.returncode != 0 and "maxdiff" in (bad.stdout + bad.stderr)


@pytest.mark.slow
def test_runbook_fvd_dry_run(tmp_path):
    data_dir = str(tmp_path / "data")
    _make_sthv2(data_dir, n_clips=4)
    cfg = _base_cfg(tmp_path, data_dir=data_dir, dataset="sthv2")
    proc = _run(["fvd", "--config", cfg, "--dry-run"])
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["stage"] == "fvd"
    assert report["fvd"] is not None and np.isfinite(report["fvd"])
