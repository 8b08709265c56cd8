"""EMA weight averaging in the train step.

Beyond-reference feature: the reference fine-tune driver has no EMA (LitEma,
``ldm/modules/ema.py``, lives only in the dead CompVis code); we implement
the same warmup-ramped decay min(decay, (1+n)/(10+n)) per optimizer update.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.models.clip_text import CLIPTextConfig
from seervideoldm_tpu.models.unet3d import SeerUNetConfig
from seervideoldm_tpu.models.vae import VAEConfig
from seervideoldm_tpu.pipelines.text_video import SeerModels
from seervideoldm_tpu.training.optim import build_optimizer
from seervideoldm_tpu.training.trainer import (
    TrainState, make_train_step, prepare_batch_fn,
)

DECAY = 0.5  # below the ramp at first so both ramp and cap are exercised


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


def _expected_ema(param_traj, decay):
    """Reference EMA trajectory: e_0 = p_0; per update n>=1 the ramped decay."""
    ema = jax.tree.map(np.asarray, param_traj[0])
    for n, p in enumerate(param_traj[1:], start=1):
        d = min(decay, (1.0 + n) / (10.0 + n))
        ema = jax.tree.map(
            lambda e, q: e * d + np.asarray(q) * (1.0 - d), ema, p)
    return ema


def _copy_params(models):
    # the train step DONATES the state; the module-scoped model buffers must
    # not be donated out from under the other tests
    return jax.tree.map(jnp.copy,
                        {"unet": models.unet_params,
                         "fstext": models.fstext_params})


@pytest.mark.slow
def test_ema_tracks_params(tiny):
    models, batch = tiny
    params = _copy_params(models)
    tx, _ = build_optimizer(params, 1e-2, warmup_steps=1, total_steps=100)
    state = TrainState.create(params, tx, ema=True)
    step = make_train_step(models, tx, cond_frames=1, ema_decay=DECAY)

    snap = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
    traj = [snap(state.params)]
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(4))
        traj.append(snap(state.params))

    want = _expected_ema(traj, DECAY)
    got = jax.tree.map(np.asarray, state.ema_params)
    for (pw, w), (_, g) in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pw))


@pytest.mark.slow
def test_ema_updates_only_on_sync_step(tiny):
    models, batch = tiny
    params = _copy_params(models)
    # warmup 0: with warmup the first sync has lr=0, params stay put, and
    # the "EMA moved" assertion below would be vacuous
    tx, _ = build_optimizer(params, 1e-2, warmup_steps=0, total_steps=100,
                            accumulation_steps=2)
    state = TrainState.create(params, tx, ema=True)
    step = make_train_step(models, tx, cond_frames=1, ema_decay=DECAY)
    p0 = jax.tree.map(np.asarray, state.params)

    # micro-step 1: no optimizer sync -> EMA must be bit-identical to init
    state, _ = step(state, batch, jax.random.PRNGKey(4))
    ema_after_micro1 = jax.tree.map(np.asarray, state.ema_params)
    for (path, e), (_, p) in zip(
        jax.tree_util.tree_leaves_with_path(ema_after_micro1),
        jax.tree_util.tree_leaves_with_path(p0),
    ):
        np.testing.assert_array_equal(e, p, err_msg=jax.tree_util.keystr(path))

    # micro-step 2: sync -> EMA advances once with n_updates=1
    state, _ = step(state, batch, jax.random.PRNGKey(4))
    want = _expected_ema([p0, state.params], DECAY)
    moved = False
    for (path, g), (_, w), (_, p) in zip(
        jax.tree_util.tree_leaves_with_path(state.ema_params),
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(p0),
    ):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
        moved = moved or not np.array_equal(np.asarray(g), p)
    assert moved, "EMA never moved after the sync micro-step"


@pytest.mark.slow
def test_ema_disabled_is_none(tiny):
    models, batch = tiny
    params = _copy_params(models)
    tx, _ = build_optimizer(params, 1e-2, warmup_steps=1, total_steps=100)
    state = TrainState.create(params, tx)
    step = make_train_step(models, tx, cond_frames=1)
    state, _ = step(state, batch, jax.random.PRNGKey(4))
    assert state.ema_params is None


def test_ema_decay_without_ema_state_raises(tiny):
    models, batch = tiny
    params = _copy_params(models)
    tx, _ = build_optimizer(params, 1e-2, warmup_steps=1, total_steps=100)
    state = TrainState.create(params, tx)  # no ema=True
    step = make_train_step(models, tx, cond_frames=1, ema_decay=DECAY)
    with pytest.raises(ValueError, match="ema"):
        step(state, batch, jax.random.PRNGKey(4))
