"""Sequence parallelism: frame-axis activation sharding over a 'seq' mesh.

Beyond the reference (its only strategy is DDP, SURVEY §2.4); the frame
axis is the natural video sharding — per-frame ops stay local, GSPMD
all-gathers only around the temporal attention flatten.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig
from seervideoldm_tpu.parallel.mesh import create_mesh, video_sharding

TINY = SeerUNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                      norm_num_groups=8, cross_attention_dim=32,
                      attention_head_dim=4)


def _inputs(b=2, f=4, s=16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, f, s, s, 4).astype(np.float32))
    ctx = jnp.asarray(rng.randn(b, f, 77, 32).astype(np.float32))
    ts = jnp.full((b,), 500, jnp.int32)
    return x, ts, ctx


@pytest.mark.slow
def test_unet_seq_parallel_matches_replicated():
    """UNet forward on a data×seq mesh (f sharded over 'seq') must equal the
    unsharded forward bit-for-near: sharding is a layout choice, never a
    numerics change."""
    mesh = create_mesh({"data": 2, "seq": 2})
    x, ts, ctx = _inputs()

    plain = SeerUNet(config=TINY)
    params = plain.init(jax.random.PRNGKey(0), x, ts, ctx, 0)

    want = np.asarray(jax.jit(
        lambda p, x, t, c: plain.apply(p, x, t, c, 1))(params, x, ts, ctx))

    sharded_unet = SeerUNet(config=TINY,
                            activation_sharding=video_sharding(mesh))
    xs = jax.device_put(x, video_sharding(mesh))
    got = np.asarray(jax.jit(
        lambda p, x, t, c: sharded_unet.apply(p, x, t, c, 1))(params, xs, ts, ctx))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_video_sharding_spec():
    mesh = create_mesh({"data": 2, "seq": 2})
    sh = video_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec("data", "seq", None, None, None)
    # pure-data mesh: frame axis stays unsharded
    mesh_d = create_mesh({"data": 4})
    assert video_sharding(mesh_d).spec == jax.sharding.PartitionSpec(
        "data", None, None, None, None)


@pytest.mark.slow
def test_train_step_seq_parallel_loss_matches_data_only():
    """Full train step on {'data':2,'seq':2} == {'data':2} on the same
    global batch: sequence parallelism must not change the training math."""
    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.parallel.mesh import batch_sharding
    from seervideoldm_tpu.pipelines.text_video import SeerModels
    from seervideoldm_tpu.training.optim import build_optimizer, trainable_mask
    from seervideoldm_tpu.training.trainer import (
        TrainState, make_train_step, partition_params, prepare_batch_fn,
    )

    def run(mesh_shape):
        mesh = create_mesh(mesh_shape)
        models = SeerModels.initialize(
            jax.random.PRNGKey(0), num_frames=4, unet_config=TINY,
            vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                                 norm_num_groups=8),
            clip_config=CLIPTextConfig(
                vocab_size=128, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=16),
            fstext_kwargs=dict(n_heads=4, num_layers=1),
            dtype=jnp.float32, latent_size=8,
        )
        if mesh.shape.get("seq", 1) > 1:
            models.unet = models.unet.clone(
                activation_sharding=video_sharding(mesh))
        params = {"unet": models.unet_params, "fstext": models.fstext_params}
        trainable, frozen = partition_params(params, trainable_mask(params))
        tx, _ = build_optimizer(trainable, 1e-4, warmup_steps=2, total_steps=10,
                                accumulation_steps=1, partitioned=True)
        state = TrainState.create(trainable, tx)
        step = make_train_step(models, tx, cond_frames=1, frozen_params=frozen)
        prepare = prepare_batch_fn(models)
        video = jnp.asarray(np.random.RandomState(0).randn(2, 4, 16, 16, 3),
                            jnp.float32)
        ids = jnp.ones((2, 16), jnp.int32)
        mask = jnp.ones((2, 16), jnp.int32)
        batch = prepare(video, ids, mask, jax.random.PRNGKey(1), cond_frames=1)
        batch = {k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                 for k, v in batch.items()}
        _, metrics = step(state, batch, jax.random.PRNGKey(2))
        return float(metrics["loss"])

    loss_sp = run({"data": 2, "seq": 2})
    loss_dp = run({"data": 2})
    assert np.isfinite(loss_sp)
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=2e-5)
