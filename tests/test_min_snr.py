"""min-SNR-γ loss weighting (beyond reference; Hang et al. 2023,
arXiv 2303.09556).

The reference trains with an unweighted MSE (``train.py:371-380``); the
``snr_gamma`` knob weights the per-sample loss by the clamped SNR.  Locked
here: the closed-form weights, the γ=0 parity path, and the weighted loss
inside the real jitted train step.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.config import Config, validate
from seervideoldm_tpu.diffusion.ddpm import add_noise, get_velocity, min_snr_weight
from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule
from seervideoldm_tpu.models.clip_text import CLIPTextConfig
from seervideoldm_tpu.models.unet3d import SeerUNetConfig
from seervideoldm_tpu.models.vae import VAEConfig
from seervideoldm_tpu.pipelines.text_video import SeerModels
from seervideoldm_tpu.training.optim import build_optimizer
from seervideoldm_tpu.training.trainer import (
    TrainState, make_train_step, prepare_batch_fn,
)


def _snr(acp, t):
    a = np.asarray(acp, np.float64)[t]
    return a / (1.0 - a)


def test_weights_epsilon_closed_form():
    acp = DiffusionSchedule.sd15_train_schedule().alphas_cumprod
    t = jnp.asarray([0, 250, 500, 999])
    w = np.asarray(min_snr_weight(jnp.asarray(acp), t, 5.0, "epsilon"))
    expect = np.minimum(_snr(acp, np.asarray(t)), 5.0) / _snr(acp, np.asarray(t))
    np.testing.assert_allclose(w, expect, rtol=1e-5)
    # low-noise early steps have huge SNR -> heavily down-weighted;
    # high-noise steps are unclamped -> weight 1
    assert w[0] < 1e-2 and w[-1] == pytest.approx(1.0)


def test_weights_v_prediction_closed_form():
    acp = DiffusionSchedule.sd15_train_schedule().alphas_cumprod
    t = jnp.asarray([0, 500, 999])
    w = np.asarray(min_snr_weight(jnp.asarray(acp), t, 5.0, "v_prediction"))
    snr = _snr(acp, np.asarray(t))
    np.testing.assert_allclose(w, np.minimum(snr, 5.0) / (snr + 1.0), rtol=1e-5)


def test_weights_finite_at_zero_snr_terminal():
    """With the zero-terminal-SNR rescale ᾱ_T = 0 exactly: the v weight must
    be 0 (not NaN) and the ε form (never legal there, but defensively) 1."""
    acp = jnp.asarray(
        DiffusionSchedule.sd15_train_schedule(rescale_zero_snr=True).alphas_cumprod
    )
    t = jnp.asarray([999])
    assert float(min_snr_weight(acp, t, 5.0, "v_prediction")[0]) == 0.0
    assert float(min_snr_weight(acp, t, 5.0, "epsilon")[0]) == 1.0


def test_unknown_prediction_type_rejected():
    with pytest.raises(ValueError):
        min_snr_weight(jnp.linspace(0.9, 0.1, 10), jnp.asarray([0]), 5.0, "x")


def test_config_knob_validation():
    validate(Config(snr_gamma=5.0))
    with pytest.raises(ValueError):
        validate(Config(snr_gamma=-1.0))


@pytest.fixture(scope="module")
def tiny():
    models = SeerModels.initialize(
        jax.random.PRNGKey(0), num_frames=4,
        unet_config=SeerUNetConfig(
            block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
            cross_attention_dim=32, attention_head_dim=4,
        ),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8),
        clip_config=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   max_position_embeddings=16),
        fstext_kwargs=dict(n_heads=4, num_layers=1),
        dtype=jnp.float32, latent_size=8,
    )
    b, f, res = 2, 4, 16
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(b, f, res, res, 3).astype(np.float32))
    ids = jnp.ones((b, 16), jnp.int32)
    mask = jnp.ones((b, 16), jnp.int32)
    batch = prepare_batch_fn(models)(video, ids, mask, jax.random.PRNGKey(3),
                                     cond_frames=1)
    return models, batch


def _run_step(models, batch, snr_gamma, prediction_type="epsilon"):
    # the step donates the state: give it a private copy of the params or
    # the shared fixture buffers get deleted
    params = jax.tree.map(jnp.copy, {"unet": models.unet_params,
                                     "fstext": models.fstext_params})
    tx, _ = build_optimizer(params, learning_rate=1e-3, warmup_steps=1,
                            total_steps=10)
    state = TrainState.create(params, tx)
    step = make_train_step(models, tx, cond_frames=1,
                           prediction_type=prediction_type,
                           snr_gamma=snr_gamma)
    _, metrics = step(state, batch, jax.random.PRNGKey(7))
    return {k: float(v) for k, v in metrics.items()}


@pytest.mark.slow
def test_train_step_weighted_loss_matches_manual(tiny):
    """The jitted step's weighted loss == manually re-weighting per-sample
    MSEs with the closed-form weights (same RNG -> same noise/timesteps)."""
    models, batch = tiny
    m0 = _run_step(models, batch, snr_gamma=0.0)
    m5 = _run_step(models, batch, snr_gamma=5.0)
    # raw-MSE metric identical regardless of weighting
    assert m0["mse"] == pytest.approx(m5["mse"], rel=1e-6)
    assert m0["loss"] == pytest.approx(m0["mse"], rel=1e-6)

    # reproduce the step's internal RNG to recover noise/timesteps
    acp = jnp.asarray(DiffusionSchedule.sd15_train_schedule().alphas_cumprod)
    k_noise, k_t = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(7), jnp.zeros((), jnp.int32)))
    latents = batch["latents"]
    noise = jax.random.normal(k_noise, latents.shape, dtype=jnp.float32)
    timesteps = jax.random.randint(k_t, (latents.shape[0],), 0, 1000)

    # per-sample MSE from an unweighted forward on the same params/noise
    params = {"unet": tiny[0].unet_params, "fstext": tiny[0].fstext_params}
    context = models.fstext.apply({"params": params["fstext"]}, batch["clip_emb"])
    noisy = add_noise(acp, latents, noise, timesteps)
    x_in = jnp.concatenate([batch["latents_x0"], noisy], axis=1)
    pred = models.unet.apply({"params": params["unet"]}, x_in, timesteps,
                             context, 1)[:, 1:]
    se = (pred.astype(jnp.float32) - noise) ** 2
    per_sample = se.reshape(se.shape[0], -1).mean(axis=1)
    w = min_snr_weight(acp, timesteps, 5.0, "epsilon")
    assert m5["loss"] == pytest.approx(float(jnp.mean(w * per_sample)), rel=1e-5)


@pytest.mark.slow
def test_train_step_v_prediction_weighting(tiny):
    """v-prediction weighting runs and differs from the unweighted loss
    whenever any sampled timestep is clamped or scaled (always true: the v
    weight is < 1 at every t)."""
    models, batch = tiny
    m = _run_step(models, batch, snr_gamma=5.0, prediction_type="v_prediction")
    m0 = _run_step(models, batch, snr_gamma=0.0, prediction_type="v_prediction")
    assert m["mse"] == pytest.approx(m0["mse"], rel=1e-6)
    assert m["loss"] < m0["loss"]  # every v weight is strictly < 1
