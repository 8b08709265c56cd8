"""The training loop LEARNS, not just steps (VERDICT r4 task 5).

Drives ``tools/overfit_one_clip.py`` end-to-end: train the real
``train.py`` from scratch on ONE toy clip, then DDIM-sample with the
TRAINING conditioning and require the sampled latents to move toward the
clip latents.  Loss-decreases tests can pass with a broken conditioning
path (the model can reduce eps-MSE without ever reading the cond frames or
the prompt); a sample that converges on the training clip cannot — it
proves the trainable partition (temporal attentions + FSText, reference
``/root/reference/train.py:319-387``), the cond-frame concat, the
checkpoint round-trip, and the sampler close the loop together.

The recorded full-budget run lives in ``overfit_report.json`` (400 steps);
this test runs a reduced budget with a conservative threshold so it stays
a regression gate rather than a convergence benchmark.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_overfit_one_clip_improves_sample(tmp_path):
    out = tmp_path / "report.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cpu_drive.py"),
         os.path.join(REPO, "tools", "overfit_one_clip.py"),
         "--steps", "120", "--batch", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=3000, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(out.read_text())
    # the sampled video must move toward the training clip, not merely the
    # loss toward its noise floor
    assert report["latent_improvement_x"] > 2.0, report
    assert report["trained"]["latent_mse"] < report["untrained"]["latent_mse"]
    # one-step x0 recovery at mid-trajectory must improve too (probes the
    # conditioning directly, without multi-step compounding)
    assert (report["trained"]["x0_rel_err_t600"]
            < report["untrained"]["x0_rel_err_t600"])
    assert report["loss_last"] < report["loss_first"]
