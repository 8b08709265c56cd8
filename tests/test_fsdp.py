"""FSDP / ZeRO-3 parameter sharding (beyond reference): the weights
themselves (trainable, frozen, optimizer moments, EMA) shard over the
'data' axis via sharding annotations; GSPMD inserts per-layer all-gathers
and gradient reduce-scatters.  Training math must be unchanged (the
reference's DDP replicates everything, ``train.py:265-267``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.models.unet3d import SeerUNetConfig
from seervideoldm_tpu.parallel.mesh import create_mesh, shard_global
from seervideoldm_tpu.parallel.sharding import (
    fsdp_param_sharding, fsdp_state_sharding,
)

TINY = SeerUNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                      norm_num_groups=8, cross_attention_dim=32,
                      attention_head_dim=4)

requires_4 = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")


def _leaf_specs(tree):
    return [(jax.tree_util.keystr(path), leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]]


@requires_4
def test_fsdp_param_specs():
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh({"data": 4})
    params = {
        "w": jnp.zeros((8, 16)),       # largest divisible dim -> sharded
        "b": jnp.zeros((3,)),          # nothing divisible -> replicated
        "scalar": jnp.zeros(()),
    }
    sh = fsdp_param_sharding(params, mesh)
    assert sh["w"].spec == P(None, "data")
    assert sh["b"].spec == P()
    assert sh["scalar"].spec == P()


@requires_4
def test_fsdp_state_shards_params_and_moments():
    from seervideoldm_tpu.training.optim import build_optimizer
    from seervideoldm_tpu.training.trainer import TrainState

    mesh = create_mesh({"data": 4})
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(8, 16),
                               jnp.float32)}
    tx, _ = build_optimizer(params, 1e-3, warmup_steps=1, total_steps=10,
                            partitioned=True)
    state = TrainState.create(params, tx, ema=True)
    sh = fsdp_state_sharding(state, mesh)
    assert "data" in tuple(sh.params["w"].spec)
    assert any("data" in tuple(s.spec)
               for _, s in _leaf_specs(sh.opt_state)
               if hasattr(s, "spec"))
    placed = shard_global(mesh, state, sh)
    # each device holds a quarter of the weight — the FSDP memory win
    shapes = {tuple(s.data.shape) for s in placed.params["w"].addressable_shards}
    assert shapes == {(8, 4)} or shapes == {(2, 16)}


@requires_4
@pytest.mark.slow
def test_fsdp_train_step_matches_replicated():
    """Loss trajectory and updated params under FSDP == replicated; params
    and moments STAY sharded across donated steps (the output constraint)."""
    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.parallel.mesh import batch_sharding, replicate_global
    from seervideoldm_tpu.pipelines.text_video import SeerModels
    from seervideoldm_tpu.training.optim import build_optimizer, trainable_mask
    from seervideoldm_tpu.training.trainer import (
        TrainState, make_train_step, partition_params, prepare_batch_fn,
    )

    def run(fsdp: bool):
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
        if fsdp:
            sh = fsdp_state_sharding(state, mesh)
            state = shard_global(mesh, state, sh)
            # frozen weights shard too — the production train.py layout
            frozen = shard_global(mesh, frozen,
                                  fsdp_param_sharding(frozen, mesh))
        else:
            sh = None
            state = replicate_global(mesh, state)
            frozen = replicate_global(mesh, frozen)
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
        for _ in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(2))
            losses.append(float(metrics["loss"]))
        return losses, jax.tree.map(np.asarray, state.params), state

    losses_f, params_f, state_f = run(True)
    losses_r, params_r, _ = run(False)
    np.testing.assert_allclose(losses_f, losses_r, rtol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
                 params_f, params_r)
    assert any(
        hasattr(leaf, "sharding") and "data" in tuple(leaf.sharding.spec)
        for _, leaf in _leaf_specs(state_f.params)
    ), "params lost their FSDP sharding across donated steps"
    assert any(
        hasattr(leaf, "sharding") and "data" in tuple(leaf.sharding.spec)
        for _, leaf in _leaf_specs(state_f.opt_state)
    ), "moments lost their FSDP sharding"
