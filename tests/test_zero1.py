"""ZeRO-1 optimizer-state sharding (beyond reference): Adam moments, grad
accumulation buffers, and EMA shard over the 'data' axis via sharding
annotations alone; params stay replicated and the training math is
unchanged (Rajbhandari et al. 2020 stage 1, the GSPMD way)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.models.unet3d import SeerUNetConfig
from seervideoldm_tpu.parallel.mesh import create_mesh, shard_global
from seervideoldm_tpu.parallel.sharding import zero1_state_sharding

TINY = SeerUNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                      norm_num_groups=8, cross_attention_dim=32,
                      attention_head_dim=4)


def _tiny_state(ema=False, accumulation_steps=1):
    from seervideoldm_tpu.training.optim import build_optimizer
    from seervideoldm_tpu.training.trainer import TrainState

    params = {
        "w": jnp.asarray(np.random.RandomState(0).randn(8, 16), jnp.float32),
        "b": jnp.zeros((3,), jnp.float32),  # 3 % n_data != 0 -> replicated
    }
    tx, _ = build_optimizer(params, 1e-3, warmup_steps=1, total_steps=10,
                            accumulation_steps=accumulation_steps,
                            partitioned=True)
    return TrainState.create(params, tx, ema=ema), tx


def _leaf_specs(tree):
    return [(jax.tree_util.keystr(path), leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]]


def test_zero1_sharding_specs():
    mesh = create_mesh({"data": 4})
    state, _ = _tiny_state(ema=True, accumulation_steps=2)
    sh = zero1_state_sharding(state, mesh)
    from jax.sharding import PartitionSpec as P

    # params replicated, step replicated
    assert sh.step.spec == P()
    for name, s in _leaf_specs(sh.params):
        assert s.spec == P(), name
    # every opt-state / EMA leaf with a divisible dim shards over 'data';
    # scalars and odd shapes stay replicated
    state_leaves = dict(_leaf_specs(state.opt_state))
    sharded = 0
    for name, s in _leaf_specs(sh.opt_state):
        leaf = state_leaves[name]
        shape = getattr(leaf, "shape", ())
        if any(d % 4 == 0 and d > 0 for d in shape):
            assert "data" in tuple(s.spec), name
            sharded += 1
        else:
            assert s.spec == P(), name
    assert sharded >= 3  # mu/w, nu/w, acc_grads/w at least
    for name, s in _leaf_specs(sh.ema_params):
        if "'w'" in name:
            assert "data" in tuple(s.spec), name


def test_zero1_placement_actually_shards():
    mesh = create_mesh({"data": 4})
    state, _ = _tiny_state(ema=True)
    sh = zero1_state_sharding(state, mesh)
    placed = shard_global(mesh, state, sh)
    w_mu = None
    for name, leaf in _leaf_specs(placed.opt_state):
        if "mu" in name and "'w'" in name:
            w_mu = leaf
    assert w_mu is not None
    # 4 devices each hold a quarter of the moment — the ZeRO memory win
    shard_shapes = {tuple(s.data.shape) for s in w_mu.addressable_shards}
    assert shard_shapes == {(8, 4)} or shard_shapes == {(2, 16)}
    # params stayed replicated
    assert placed.params["w"].sharding.spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_zero1_train_step_matches_replicated():
    """Loss trajectory, updated params, and EMA under ZeRO-1 == replicated;
    the output state's optimizer buffers STAY sharded across steps."""
    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.parallel.mesh import batch_sharding, replicate_global
    from seervideoldm_tpu.pipelines.text_video import SeerModels
    from seervideoldm_tpu.training.optim import build_optimizer, trainable_mask
    from seervideoldm_tpu.training.trainer import (
        TrainState, make_train_step, partition_params, prepare_batch_fn,
    )

    def run(zero1: bool):
        mesh = create_mesh({"data": 2})
        models = SeerModels.initialize(
            jax.random.PRNGKey(0), num_frames=4, unet_config=TINY,
            vae_config=VAEConfig(block_out_channels=(16, 32),
                                 layers_per_block=1, norm_num_groups=8),
            clip_config=CLIPTextConfig(
                vocab_size=128, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=16),
            fstext_kwargs=dict(n_heads=4, num_layers=1),
            dtype=jnp.float32, latent_size=8,
        )
        params = {"unet": models.unet_params, "fstext": models.fstext_params}
        trainable, frozen = partition_params(params, trainable_mask(params))
        tx, _ = build_optimizer(trainable, 1e-2, warmup_steps=1,
                                total_steps=10, accumulation_steps=2,
                                partitioned=True)
        state = TrainState.create(trainable, tx, ema=True)
        if zero1:
            sh = zero1_state_sharding(state, mesh)
            state = shard_global(mesh, state, sh)
        else:
            sh = None
            state = replicate_global(mesh, state)
        step = make_train_step(models, tx, cond_frames=1, frozen_params=frozen,
                               ema_decay=0.9, state_sharding=sh)
        prepare = prepare_batch_fn(models)
        video = jnp.asarray(np.random.RandomState(0).randn(2, 4, 16, 16, 3),
                            jnp.float32)
        ids = jnp.ones((2, 16), jnp.int32)
        mask = jnp.ones((2, 16), jnp.int32)
        batch = prepare(video, ids, mask, jax.random.PRNGKey(1), cond_frames=1)
        batch = {k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                 for k, v in batch.items()}
        losses = []
        for i in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(2))
            losses.append(float(metrics["loss"]))
        return losses, jax.tree.map(np.asarray, state.params), state

    losses_z, params_z, state_z = run(True)
    losses_r, params_r, _ = run(False)
    np.testing.assert_allclose(losses_z, losses_r, rtol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
                 params_z, params_r)
    # the constraint keeps moments/EMA sharded after 3 donated steps
    sharded = [
        leaf for _, leaf in _leaf_specs(state_z.opt_state)
        if hasattr(leaf, "sharding")
        and "data" in tuple(leaf.sharding.spec)
    ]
    assert sharded, "optimizer state lost its ZeRO-1 sharding"
    assert any(
        "data" in tuple(leaf.sharding.spec)
        for _, leaf in _leaf_specs(state_z.ema_params)
        if hasattr(leaf, "sharding")
    ), "EMA lost its ZeRO-1 sharding"
