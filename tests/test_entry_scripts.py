"""Integration tests: run the actual entry scripts end-to-end at toy scale
(subprocess, CPU) — the whole driver path including config parsing, model
build, data loading, checkpointing, and visualization output."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_OVERRIDES = {
    "unet": {"block_out_channels": [32, 64], "layers_per_block": 1,
             "norm_num_groups": 8, "cross_attention_dim": 32,
             "attention_head_dim": 4},
    "vae": {"block_out_channels": [16, 32], "layers_per_block": 1,
            "norm_num_groups": 8},
    "clip": {"vocab_size": 49408, "hidden_size": 32, "intermediate_size": 64,
             "num_hidden_layers": 2, "num_attention_heads": 4,
             "max_position_embeddings": 77},
    "fstext": {"n_heads": 4, "num_layers": 1},
}


def _run(script, cfg_path, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # sitecustomize force-registers the TPU platform; strip its trigger
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = ""  # single CPU device (conftest sets 8 for in-proc tests)
    env["JAX_CACHE_DIR"] = "/tmp/jax_test_cache"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--config", cfg_path, *extra],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc


def _make_sthv2(root, n_clips=4, n_frames=5):
    ann = os.path.join(root, "annotations")
    os.makedirs(ann, exist_ok=True)
    entries = [{"id": str(i), "label": f"doing thing {i}"} for i in range(n_clips)]
    with open(os.path.join(ann, "train.json"), "w") as f:
        json.dump(entries, f)
    with open(os.path.join(ann, "validation.json"), "w") as f:
        json.dump(entries, f)
    rng = np.random.RandomState(0)
    for e in entries:
        d = os.path.join(root, "rawframes", e["id"])
        os.makedirs(d, exist_ok=True)
        for j in range(n_frames):
            Image.fromarray(rng.randint(0, 255, (20, 26, 3), dtype=np.uint8)).save(
                os.path.join(d, f"{j:04d}.jpg")
            )


@pytest.mark.slow
def test_train_script_end_to_end(tmp_path):
    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    _make_sthv2(data_dir)
    cfg = {
        "output_dir": out_dir, "data_dir": data_dir, "dataset": "sthv2",
        "resolution": 16, "cond_frames": 1, "num_frames": 4,
        "train_batch_size": 2, "gradient_accumulation_steps": 1,
        "learning_rate": 1e-3, "scale_lr": False, "lr_warmup_steps": 1,
        "max_train_steps": 3, "save_steps": 3, "num_workers": 2,
        "mixed_precision": "no", "seed": 0,
        "model_overrides": TINY_OVERRIDES,
    }
    cfg_path = str(tmp_path / "train.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    _run("train.py", cfg_path)
    ckpt = os.path.join(out_dir, "learned_sdunet-steps-3")
    assert os.path.isdir(os.path.join(ckpt, "state"))
    assert os.path.isdir(os.path.join(ckpt, "params"))
    assert os.path.exists(os.path.join(out_dir, "learned_sdunet-steps-3.json"))


@pytest.mark.slow
def test_inference_img_script(tmp_path):
    out_dir = str(tmp_path / "out")
    img_path = str(tmp_path / "input.png")
    Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (40, 30, 3), dtype=np.uint8)
    ).save(img_path)
    cfg = {
        "output_dir": out_dir, "resolution": 16, "cond_frames": 1,
        "num_frames": 4, "ddim_steps": 2, "scale": 7.5, "seed": 0,
        "mixed_precision": "no", "model_overrides": TINY_OVERRIDES,
    }
    cfg_path = str(tmp_path / "inf.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    _run("inference_img.py", cfg_path, "--image_path", img_path,
         "--input_text_prompts", "push the cup")
    assert os.path.exists(os.path.join(out_dir, "sample-0.gif"))


@pytest.mark.slow
def test_edit_script(tmp_path):
    out_dir = str(tmp_path / "out")
    gif_path = str(tmp_path / "input.gif")
    rng = np.random.RandomState(2)
    frames = [Image.fromarray(rng.randint(0, 255, (24, 24, 3), dtype=np.uint8))
              for _ in range(4)]
    frames[0].save(gif_path, save_all=True, append_images=frames[1:])
    cfg = {
        "output_dir": out_dir, "resolution": 16, "cond_frames": 1,
        "num_frames": 4, "ddim_steps": 2, "scale": 7.5, "seed": 0,
        "mixed_precision": "no", "model_overrides": TINY_OVERRIDES,
    }
    cfg_path = str(tmp_path / "edit.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    _run("edit.py", cfg_path, "--video_path", gif_path,
         "--input_text_prompts", "pour the water", "--edit_strength", "0.5")
    assert os.path.exists(os.path.join(out_dir, "sample-0.gif"))


@pytest.mark.slow
def test_inference_script_end_to_end(tmp_path):
    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    _make_sthv2(data_dir)
    cfg = {
        "output_dir": out_dir, "data_dir": data_dir, "dataset": "sthv2",
        "resolution": 16, "cond_frames": 1, "num_frames": 4,
        "val_batch_size": 2, "sample_iter": 1, "num_samples": 1,
        "ddim_steps": 2, "scale": 7.5, "n_rows": 1, "num_workers": 2,
        "mixed_precision": "no", "seed": 0, "saved_global_step": 0,
        "model_overrides": TINY_OVERRIDES,
    }
    cfg_path = str(tmp_path / "inference.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    _run("inference.py", cfg_path)
    files = os.listdir(out_dir)
    assert any(f.startswith("grid-") for f in files)
    assert any(f.startswith("sample-") and f.endswith(".gif") for f in files)


@pytest.mark.slow
def test_eval_script_fvd_end_to_end(tmp_path):
    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    _make_sthv2(data_dir, n_clips=4)
    cfg = {
        "output_dir": out_dir, "data_dir": data_dir, "dataset": "sthv2",
        "resolution": 16, "cond_frames": 1, "num_frames": 4,
        "val_batch_size": 2, "ddim_steps": 2, "scale": 7.5,
        "compute_fvd": True, "MAX_FVD_BATCH": 4, "compute_is": False,
        "num_workers": 2, "mixed_precision": "no", "seed": 0,
        "saved_global_step": 0, "model_overrides": TINY_OVERRIDES,
    }
    cfg_path = str(tmp_path / "eval.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    proc = _run("eval.py", cfg_path)
    assert "FVD" in proc.stdout


@pytest.mark.slow
def test_eval_script_small_valset_flush(tmp_path):
    """Val set SMALLER than MAX_FVD_BATCH: the final-batch flush must still
    produce a finite FVD, and compute_is must run alongside compute_fvd
    (reference eval.py:236-247 uses independent ifs, not elif)."""
    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    _make_sthv2(data_dir, n_clips=4)
    cfg = {
        "output_dir": out_dir, "data_dir": data_dir, "dataset": "sthv2",
        # 16 frames: the C3D inception score is only defined for 16-frame
        # clips (reference chainer mean image shape)
        "resolution": 16, "cond_frames": 1, "num_frames": 16,
        "val_batch_size": 2, "ddim_steps": 2, "scale": 7.5,
        "compute_fvd": True, "MAX_FVD_BATCH": 32,  # never filled by 4 clips
        "compute_is": True, "MAX_IS_BATCH": 100,
        "num_workers": 2, "mixed_precision": "no", "seed": 0,
        "saved_global_step": 0, "model_overrides": TINY_OVERRIDES,
    }
    cfg_path = str(tmp_path / "eval.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    proc = _run("eval.py", cfg_path)
    import re

    m = re.search(r"Final FVD ([^,]+),", proc.stdout)
    assert m, proc.stdout
    assert np.isfinite(float(m.group(1))), f"FVD not finite: {m.group(1)}"
    assert "Final IS" in proc.stdout, proc.stdout


@pytest.mark.critical
def test_plot_failure_never_kills_training(tmp_path):
    """A wedged/failing matplotlib must never raise into the train loop:
    the sync path swallows exceptions, the async path (reference forks a
    separate process, train.py:400-406; ours a daemon thread) returns
    immediately and the worker's failure stays on the worker."""
    import train as train_mod
    from seervideoldm_tpu.training.meters import RunningAverageMeter

    m = RunningAverageMeter()
    m.update(1.0, 0)
    m.update(0.5, 1)
    bad_dir = str(tmp_path / "does" / "not" / "exist")
    train_mod.plot_graphs(m, m, bad_dir)  # must not raise
    train_mod.plot_graphs_async(m, m, bad_dir)  # must not raise or block
    # drain the worker so the busy-lock is released for other tests
    for _ in range(200):
        if train_mod._plot_busy.acquire(blocking=False):
            train_mod._plot_busy.release()
            break
        import time

        time.sleep(0.05)
    else:
        raise AssertionError("plot worker never released the busy lock")
    # and a good dir actually produces the PNGs through the async path
    train_mod.plot_graphs(m, m, str(tmp_path))
    assert (tmp_path / "loss.png").exists() and (tmp_path / "lr.png").exists()
