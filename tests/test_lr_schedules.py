"""lr_schedule guards: every scheduler must decay (or hold) sanely when
max_train_steps <= warmup_steps instead of silently pinning peak lr."""
import numpy as np

from seervideoldm_tpu.training.optim import lr_schedule


def test_linear_decays_when_total_below_warmup():
    sched = lr_schedule("linear", 1e-4, warmup_steps=10, total_steps=5)
    # past warmup the lr must decay toward 0, not stay pinned at peak
    assert float(sched(11)) < 1e-4
    assert float(sched(10_000)) <= 1e-6


def test_linear_normal_shape():
    sched = lr_schedule("linear", 1e-4, warmup_steps=10, total_steps=110)
    assert np.isclose(float(sched(10)), 1e-4)
    assert np.isclose(float(sched(60)), 5e-5, rtol=0.05)  # halfway down
    assert float(sched(110)) <= 1e-9


def test_cosine_and_constant():
    cos = lr_schedule("cosine", 1e-4, warmup_steps=10, total_steps=5)
    assert float(cos(10_000)) < 1e-4  # guarded, decays
    const = lr_schedule("constant", 1e-4, warmup_steps=10, total_steps=5)
    assert np.isclose(float(const(10_000)), 1e-4)
