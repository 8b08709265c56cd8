"""Zero-terminal-SNR recipe (beyond reference; Lin et al. 2024 "Common
Diffusion Noise Schedules and Sampler Steps are Flawed"): schedule rescale,
trailing timestep spacing, CFG std-rescale, and the v-prediction direct
x0 form that keeps samplers finite at SNR 0."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.diffusion.schedules import (
    DiffusionSchedule,
    make_ddim_timesteps,
    rescale_zero_terminal_snr,
)


# ---------------------------------------------------------------- schedule

def test_rescale_zero_terminal_snr_algorithm():
    acp = DiffusionSchedule.create(1000).alphas_cumprod.astype(np.float64)
    out = rescale_zero_terminal_snr(acp)
    # Lin et al. Algorithm 1 invariants: terminal exactly 0, first sqrt
    # unchanged, monotone decreasing, all in [0, 1]
    assert out[-1] == 0.0
    np.testing.assert_allclose(np.sqrt(out[0]), np.sqrt(acp[0]), rtol=1e-12)
    assert np.all(np.diff(out) < 0)
    assert np.all((out >= 0.0) & (out <= 1.0))


def test_schedule_create_rescaled():
    sched = DiffusionSchedule.create(1000, rescale_zero_snr=True)
    assert sched.has_zero_terminal_snr
    # back-derived betas stay consistent with the rescaled cumprod
    np.testing.assert_allclose(
        np.cumprod(1.0 - sched.betas.astype(np.float64)),
        sched.alphas_cumprod.astype(np.float64),
        atol=1e-9,
    )
    # terminal beta is exactly 1 (alpha_T = acp_T / acp_{T-1} = 0)
    assert sched.betas[-1] == pytest.approx(1.0)
    assert not DiffusionSchedule.create(1000).has_zero_terminal_snr


def test_sd15_train_schedule_rescaled():
    sched = DiffusionSchedule.sd15_train_schedule(rescale_zero_snr=True)
    assert sched.has_zero_terminal_snr
    base = DiffusionSchedule.sd15_train_schedule()
    # SD-1.5's real terminal SNR is tiny but nonzero (the paper's point)
    assert base.alphas_cumprod[-1] > 0.0


# ---------------------------------------------------------------- spacing

def test_trailing_timesteps_anchor_at_T_minus_1():
    ts = make_ddim_timesteps("trailing", 50, 1000)
    assert ts.shape == (50,)
    assert ts[-1] == 999  # the grid reaches the terminal step
    assert ts[0] == 19
    assert np.all(np.diff(ts) > 0)  # ascending like the other methods
    # the reference's uniform(+1) grid tops out at 981 — never pure noise
    uni = make_ddim_timesteps("uniform", 50, 1000)
    assert uni[-1] == 981


def test_trailing_timesteps_non_divisible():
    ts = make_ddim_timesteps("trailing", 7, 1000)
    assert ts.shape == (7,)
    assert ts[-1] == 999
    assert np.all((ts >= 0) & (ts < 1000)) and np.all(np.diff(ts) > 0)


def test_trailing_timesteps_every_count_valid():
    """A float arange from T overshot for 62 of the counts in 1..999 (e.g.
    S=61: 62 entries, lowest -1 — which wraps to the TERMINAL alpha and
    feeds timestep -1 to the UNet); the grid must come from exactly S
    integer indices."""
    for s in (61, 103, 121, 122, 201, 999):
        ts = make_ddim_timesteps("trailing", s, 1000)
        assert ts.shape == (s,), s
        assert ts[-1] == 999 and ts.min() >= 0, s
        assert np.all(np.diff(ts) > 0), s


def test_trailing_tables_start_at_terminal():
    sched = DiffusionSchedule.create(1000, rescale_zero_snr=True)
    tables = sched.ddim_tables(10, eta=0.0, discr_method="trailing")
    # tables are ordered high noise -> low; step 0 is the terminal timestep
    assert int(tables.timesteps[0]) == 999
    assert float(tables.alphas[0]) == 0.0  # actually starts at SNR 0
    assert float(tables.sqrt_one_minus_alphas[0]) == 1.0


# ------------------------------------------------------------- validation

def test_config_validation():
    from seervideoldm_tpu.config import Config, validate

    with pytest.raises(ValueError, match="v_prediction"):
        validate(Config(rescale_zero_snr=True, prediction_type="epsilon"))
    with pytest.raises(ValueError, match="timestep_spacing"):
        validate(Config(timestep_spacing="leading"))
    with pytest.raises(ValueError, match="guidance_rescale"):
        validate(Config(guidance_rescale=1.5))
    validate(Config(rescale_zero_snr=True, prediction_type="v_prediction",
                    timestep_spacing="trailing", guidance_rescale=0.7))


def test_sampling_kwargs_from_carries_the_knobs():
    from seervideoldm_tpu.config import (
        Config, sampler_schedule_from, sampling_kwargs_from,
    )

    cfg = Config(rescale_zero_snr=True, prediction_type="v_prediction",
                 timestep_spacing="trailing", guidance_rescale=0.7)
    kw = sampling_kwargs_from(cfg)
    assert kw["timestep_spacing"] == "trailing"
    assert kw["guidance_rescale"] == 0.7
    assert kw["prediction_type"] == "v_prediction"
    assert sampler_schedule_from(cfg).has_zero_terminal_snr
    assert not sampler_schedule_from(Config()).has_zero_terminal_snr


# ------------------------------------------------------- guidance rescale

def _eps_fn(guidance_rescale, scale=7.5):
    from seervideoldm_tpu.diffusion.ddim import make_eps_fn

    key = jax.random.PRNGKey(0)
    # cond/uncond eps differ and vary spatially so std-rescale is observable
    def unet(x, t, ctx, cf):
        b = x.shape[0]
        base = jax.random.normal(jax.random.PRNGKey(1), x.shape[1:])
        gain = ctx.mean(axis=(1, 2, 3)).reshape(b, 1, 1, 1, 1)
        return (base[None] * gain).astype(x.dtype)

    cond_ctx = jnp.full((2, 2, 1, 8), 1.0)
    uncond_ctx = jnp.full((2, 2, 1, 8), 0.25)
    eps = make_eps_fn(unet, cond_ctx, None, uncond_ctx, scale, 0,
                      guidance_rescale=guidance_rescale)
    img = jax.random.normal(key, (2, 3, 4, 4, 4))
    t = jnp.zeros((2,), jnp.int32)
    return np.asarray(eps(img, t))


def test_guidance_rescale_zero_is_plain_cfg():
    np.testing.assert_array_equal(_eps_fn(0.0), _eps_fn(0.0, scale=7.5))
    # closed form: e = e_u + s (e_c - e_u) with gains 0.25 / 1.0
    base = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 4)))
    want = (0.25 + 7.5 * (1.0 - 0.25)) * base
    np.testing.assert_allclose(_eps_fn(0.0)[0], want, rtol=1e-5)


def test_guidance_rescale_one_restores_cond_std():
    out = _eps_fn(1.0)
    base = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 4)))
    e_cond_std = np.std(base * 1.0)
    for i in range(out.shape[0]):
        np.testing.assert_allclose(np.std(out[i]), e_cond_std, rtol=1e-4)


def test_guidance_rescale_blend_is_linear():
    e0, e1, e_half = _eps_fn(0.0), _eps_fn(1.0), _eps_fn(0.5)
    np.testing.assert_allclose(e_half, 0.5 * e0 + 0.5 * e1, rtol=1e-4,
                               atol=1e-6)


# -------------------------------------------------------------- samplers

def _zero_snr_tables(steps=5):
    sched = DiffusionSchedule.create(1000, rescale_zero_snr=True)
    return sched.ddim_tables(steps, eta=0.0, discr_method="trailing")


def _v_unet(x, t, ctx, cf):
    return 0.1 * x + 0.05


def test_ddim_epsilon_rejects_zero_snr_tables():
    from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop

    with pytest.raises(ValueError, match="v_prediction"):
        ddim_sample_loop(_v_unet, jnp.zeros((1, 2, 4, 4, 4)),
                         _zero_snr_tables(), jnp.zeros((1, 2, 1, 8)),
                         prediction_type="epsilon")


def test_dpmpp_epsilon_rejects_zero_snr_tables():
    from seervideoldm_tpu.diffusion.dpm_solver import dpm_solver_sample_loop

    with pytest.raises(ValueError, match="v_prediction"):
        dpm_solver_sample_loop(_v_unet, jnp.zeros((1, 2, 4, 4, 4)),
                               _zero_snr_tables(), jnp.zeros((1, 2, 1, 8)),
                               prediction_type="epsilon")


def test_ddim_v_prediction_finite_at_snr_zero():
    from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 4))
    out = np.asarray(ddim_sample_loop(
        _v_unet, x, _zero_snr_tables(), jnp.zeros((1, 2, 1, 8)),
        prediction_type="v_prediction"))
    assert np.isfinite(out).all()
    # first step runs AT alpha=0: pred_x0 = -v, e_t = x_t exactly
    tables = _zero_snr_tables(1)
    x1 = jnp.ones((1, 2, 4, 4, 4))
    out1 = np.asarray(ddim_sample_loop(
        _v_unet, x1, tables, jnp.zeros((1, 2, 1, 8)),
        prediction_type="v_prediction"))
    v = 0.1 * 1.0 + 0.05
    a_prev = float(tables.alphas_prev[0])
    want = np.sqrt(a_prev) * (-v) + np.sqrt(1.0 - a_prev) * 1.0
    np.testing.assert_allclose(out1, want, rtol=1e-5)


def test_dpmpp_v_prediction_finite_at_snr_zero():
    from seervideoldm_tpu.diffusion.dpm_solver import dpm_solver_sample_loop

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 4))
    out = np.asarray(dpm_solver_sample_loop(
        _v_unet, x, _zero_snr_tables(8), jnp.zeros((1, 2, 1, 8)),
        prediction_type="v_prediction", order=2))
    assert np.isfinite(out).all()


def test_v_prediction_direct_form_matches_eps_chain():
    """On a regular (nonzero-SNR) schedule the direct x0 form
    sqrt(a)x - sqrt(1-a)v must equal the old v->eps->x0 chain exactly."""
    from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop

    tables = DiffusionSchedule.create(1000).ddim_tables(1)
    x = jnp.full((1, 2, 4, 4, 4), 2.0)
    out = np.asarray(ddim_sample_loop(
        _v_unet, x, tables, jnp.zeros((1, 2, 1, 8)),
        prediction_type="v_prediction"))
    a_t = float(tables.alphas[0])
    a_prev = float(tables.alphas_prev[0])
    s1m = float(tables.sqrt_one_minus_alphas[0])
    v = 0.1 * 2.0 + 0.05
    e_t = np.sqrt(a_t) * v + s1m * 2.0
    pred_x0 = (2.0 - s1m * e_t) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * pred_x0 + np.sqrt(1.0 - a_prev) * e_t
    np.testing.assert_allclose(out, want, rtol=1e-5)
