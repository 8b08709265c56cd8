import pytest

import numpy as np

from seervideoldm_tpu.diffusion.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)



pytestmark = pytest.mark.critical

def test_linear_schedule_closed_form():
    betas = make_beta_schedule("linear", 1000, 1e-4, 2e-2)
    # sqrt-space linear: endpoints exact
    assert np.isclose(betas[0], 1e-4)
    assert np.isclose(betas[-1], 2e-2)
    sq = np.sqrt(betas)
    diffs = np.diff(sq)
    assert np.allclose(diffs, diffs[0])  # linear in sqrt space


def test_sd15_schedule():
    sched = DiffusionSchedule.sd15_train_schedule()
    assert sched.num_timesteps == 1000
    assert np.isclose(sched.betas[0], 0.00085, atol=1e-7)
    assert np.isclose(sched.betas[-1], 0.012, atol=1e-7)
    # cumprod decreasing in (0, 1]
    assert sched.alphas_cumprod[0] > sched.alphas_cumprod[-1] > 0
    assert sched.alphas_cumprod_prev[0] == 1.0


def test_ddim_timesteps_plus_one_offset():
    ts = make_ddim_timesteps("uniform", 30, 1000)
    # reference util.py:57 adds +1 to range(0, 1000, 33)
    expected = np.asarray(list(range(0, 1000, 1000 // 30))) + 1
    np.testing.assert_array_equal(ts, expected)
    assert ts[0] == 1


def test_ddim_sampling_parameters_eta0():
    sched = DiffusionSchedule.create(1000)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        sched.alphas_cumprod.astype(np.float64), ts, eta=0.0
    )
    assert np.all(sigmas == 0)
    np.testing.assert_allclose(alphas, sched.alphas_cumprod[ts])
    assert alphas_prev[0] == sched.alphas_cumprod[0]
    np.testing.assert_allclose(alphas_prev[1:], sched.alphas_cumprod[ts[:-1]])


def test_ddim_tables_reverse_order():
    sched = DiffusionSchedule.create(1000)
    tables = sched.ddim_tables(30)
    assert tables.timesteps[0] > tables.timesteps[-1]
    assert tables.timesteps[-1] == 1
    assert tables.alphas[0] < tables.alphas[-1]  # less noise at the end
    np.testing.assert_allclose(
        tables.sqrt_one_minus_alphas, np.sqrt(1.0 - tables.alphas), rtol=1e-6
    )


def test_ddim_sigmas_eta_nonzero_closed_form():
    sched = DiffusionSchedule.create(1000)
    ts = make_ddim_timesteps("uniform", 10, 1000)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        sched.alphas_cumprod.astype(np.float64), ts, eta=1.0
    )
    expected = np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    np.testing.assert_allclose(sigmas, expected)
