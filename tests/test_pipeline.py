"""End-to-end smoke tests at toy shapes: full generate() path, converter
round-trip, and the data-parallel train step on an 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.models.clip_text import CLIPTextConfig
from seervideoldm_tpu.models.unet3d import SeerUNetConfig
from seervideoldm_tpu.models.vae import VAEConfig
from seervideoldm_tpu.pipelines.text_video import SeerModels, SeerPipeline

TINY_UNET = SeerUNetConfig(
    block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
    cross_attention_dim=32, attention_head_dim=4,
)
TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_num_groups=8)
TINY_CLIP = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_position_embeddings=16)
FSTEXT_KW = dict(n_heads=4, num_layers=1)


@pytest.fixture(scope="module")
def tiny_models():
    return SeerModels.initialize(
        jax.random.PRNGKey(0), num_frames=4, unet_config=TINY_UNET,
        vae_config=TINY_VAE, clip_config=TINY_CLIP, fstext_kwargs=FSTEXT_KW,
        dtype=jnp.float32, latent_size=8,
    )


def test_generate_end_to_end(tiny_models):
    pipe = SeerPipeline(tiny_models)
    b, f1, num_frames, res = 1, 1, 4, 16  # vae scale = 2 -> latent 8
    cond = jnp.asarray(np.random.RandomState(0).randn(b, f1, res, res, 3).astype(np.float32))
    ids = np.ones((b, 16), dtype=np.int32)
    mask = np.ones((b, 16), dtype=np.int32)
    out = pipe.generate(
        cond, ids, mask, ids, mask, num_frames=num_frames,
        rng=jax.random.PRNGKey(1), ddim_steps=4, guidance_scale=7.5,
    )
    assert out.shape == (b, num_frames - f1, res, res, 3)
    out = np.asarray(out)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.slow
def test_generate_no_cfg_single_unet_batch(tiny_models):
    pipe = SeerPipeline(tiny_models)
    cond = jnp.zeros((1, 1, 16, 16, 3))
    ids = np.ones((1, 16), dtype=np.int32)
    mask = np.ones((1, 16), dtype=np.int32)
    out = pipe.generate(cond, ids, mask, ids, mask, num_frames=4,
                        rng=jax.random.PRNGKey(2), ddim_steps=2, guidance_scale=1.0)
    assert out.shape == (1, 3, 16, 16, 3)


@pytest.mark.slow
def test_train_step_data_parallel(tiny_models):
    """8-device CPU mesh: loss decreases only for trainable params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from seervideoldm_tpu.parallel.mesh import batch_sharding, create_mesh
    from seervideoldm_tpu.training.optim import build_optimizer, trainable_mask
    from seervideoldm_tpu.training.trainer import (
        TrainState, make_train_step, prepare_batch_fn,
    )

    mesh = create_mesh({"data": 2})
    models = tiny_models
    params = {"unet": models.unet_params, "fstext": models.fstext_params}
    tx, _ = build_optimizer(params, 1e-3, warmup_steps=1, total_steps=100)
    state = TrainState.create(params, tx)
    train_step = make_train_step(models, tx, cond_frames=1)

    b, f, res = 4, 4, 16
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(b, f, res, res, 3).astype(np.float32))
    ids = jnp.ones((b, 16), jnp.int32)
    tmask = jnp.ones((b, 16), jnp.int32)
    prepare = prepare_batch_fn(models)
    batch = prepare(video, ids, tmask, jax.random.PRNGKey(3), cond_frames=1)
    # shard the batch over data
    batch = {k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in batch.items()}
    state = jax.device_put(state, NamedSharding(mesh, P()))

    old_params = jax.tree.map(lambda x: np.asarray(x), state.params)
    state2, metrics = train_step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # step 0 uses warmup lr=0; take a second step so trainable params move
    state2, metrics = train_step(state2, batch, jax.random.PRNGKey(5))

    mask = trainable_mask(params)
    changed = jax.tree.map(
        lambda old, new: not np.allclose(old, np.asarray(new)), old_params, state2.params
    )
    flat_mask = jax.tree_util.tree_leaves_with_path(mask)
    flat_changed_tree = changed
    # frozen leaves unchanged; at least one trainable leaf changed
    any_trainable_changed = False
    for (path, m), (_, ch) in zip(
        jax.tree_util.tree_leaves_with_path(mask),
        jax.tree_util.tree_leaves_with_path(flat_changed_tree),
    ):
        if not m:
            assert not ch, f"frozen param changed: {path}"
        elif ch:
            any_trainable_changed = True
    assert any_trainable_changed


def test_tensor_parallel_sharding_rules(tiny_models):
    from seervideoldm_tpu.parallel.mesh import create_mesh
    from seervideoldm_tpu.parallel.sharding import infer_param_sharding

    mesh = create_mesh({"data": 4, "model": 2})
    shardings = infer_param_sharding(tiny_models.unet_params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    specs = {"/".join(str(k.key) for k in p): s.spec for p, s in flat}
    sharded = [k for k, s in specs.items() if any(a is not None for a in s)]
    assert any("to_q" in k for k in sharded)
    assert any("net_0" in k for k in sharded)


def test_converter_roundtrip_torch_linear_conv(tiny_models):
    """Torch-layout tensors land in the right flax leaves with right transforms."""
    import torch

    from seervideoldm_tpu.io.convert import torch_to_flax

    target = {
        "dense": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros((8,))},
        "block_0": {"conv1": {"conv": {"kernel": jnp.zeros((3, 3, 2, 5)),
                                       "bias": jnp.zeros((5,))}}},
        "norm": {"scale": jnp.zeros((6,)), "bias": jnp.zeros((6,))},
    }
    w_lin = np.random.RandomState(0).randn(8, 4).astype(np.float32)
    w_conv = np.random.RandomState(1).randn(5, 2, 3, 3).astype(np.float32)
    sd = {
        "dense.weight": w_lin, "dense.bias": np.zeros(8, np.float32),
        "block.0.conv1.weight": w_conv, "block.0.conv1.bias": np.zeros(5, np.float32),
        "norm.weight": np.ones(6, np.float32), "norm.bias": np.zeros(6, np.float32),
    }
    tree, missing, unmatched = torch_to_flax(sd, target)
    assert not missing and not unmatched
    np.testing.assert_array_equal(np.asarray(tree["dense"]["kernel"]), w_lin.T)
    np.testing.assert_array_equal(
        np.asarray(tree["block_0"]["conv1"]["conv"]["kernel"]),
        w_conv.transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(np.asarray(tree["norm"]["scale"]), np.ones(6))


@pytest.mark.slow
def test_sharded_sampling_over_data_mesh(tiny_models):
    """Batch sharded over 8 devices: sampling compiles and preserves sharding."""
    from seervideoldm_tpu.parallel.mesh import create_mesh

    mesh = create_mesh({"data": 4})
    pipe = SeerPipeline(tiny_models, mesh=mesh)
    b = 4
    cond = jnp.zeros((b, 1, 16, 16, 3))
    ids = np.ones((b, 16), dtype=np.int32)
    mask = np.ones((b, 16), dtype=np.int32)
    out = pipe.generate(cond, ids, mask, ids, mask, num_frames=4,
                        rng=jax.random.PRNGKey(3), ddim_steps=2, guidance_scale=7.5)
    assert out.shape == (b, 3, 16, 16, 3)
    assert "data" in str(out.sharding)


def test_partition_combine_roundtrip(tiny_models):
    from seervideoldm_tpu.training.optim import trainable_mask
    from seervideoldm_tpu.training.trainer import combine_params, partition_params

    params = {"unet": tiny_models.unet_params, "fstext": tiny_models.fstext_params}
    mask = trainable_mask(params)
    trainable, frozen = partition_params(params, mask)
    # only temporal attentions + fstext are trainable
    t_flat = jax.tree_util.tree_leaves_with_path(trainable)
    assert all(
        "temporal_attentions" in "/".join(str(k.key) for k in path) or
        "/".join(str(k.key) for k in path).startswith("fstext")
        for path, _ in t_flat
    )
    combined = combine_params(trainable, frozen)
    assert jax.tree_util.tree_structure(combined) == jax.tree_util.tree_structure(params)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(combined),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
