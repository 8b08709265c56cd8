"""Every reference train.yaml knob is honored or rejected loudly.

VERDICT r2 Missing #2/#3 + weak-knob item: ``use_8bit_adam`` and
``gradient_checkpointing`` must change behavior; ``push_to_hub`` must fail
with a clear error instead of being silently swallowed into ``extras``.
Reference behavior: ``/root/reference/train.py:139-150`` (hub),
``:214-222`` (8-bit Adam), ``unet_3d_blocks.py:369-401`` (checkpointing).
"""
import os

import pytest
import yaml

from seervideoldm_tpu.config import load_config

REF_TRAIN = "/root/reference/configs/train.yaml"


def _write_cfg(tmp_path, **over):
    base = {}
    if os.path.exists(REF_TRAIN):
        with open(REF_TRAIN) as f:
            base = yaml.safe_load(f)
    base.update(over)
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(base))
    return str(p)


def test_push_to_hub_rejected_loudly(tmp_path):
    path = _write_cfg(tmp_path, push_to_hub=True)
    with pytest.raises(ValueError, match="push_to_hub"):
        load_config(path)


def test_push_to_hub_false_ok(tmp_path):
    cfg = load_config(_write_cfg(tmp_path, push_to_hub=False))
    assert cfg.push_to_hub is False


def test_use_8bit_adam_changes_optimizer(tmp_path):
    import jax.numpy as jnp

    from seervideoldm_tpu.training.optim import build_optimizer
    from seervideoldm_tpu.training.optim8bit import ScaleBy8bitAdamState

    cfg = load_config(_write_cfg(tmp_path, use_8bit_adam=True))
    assert cfg.use_8bit_adam is True
    params = {"fstext": {"w": jnp.ones((8, 8))}}
    tx, _ = build_optimizer(params, 1e-3, partitioned=True,
                            use_8bit=cfg.use_8bit_adam, accumulation_steps=1)
    state = tx.init(params)
    flat = [s for s in state if isinstance(s, tuple)]
    assert any(isinstance(s, ScaleBy8bitAdamState) for s in _walk(state)), state


def _walk(obj):
    yield obj
    if isinstance(obj, (tuple, list)):
        for o in obj:
            yield from _walk(o)


def test_gradient_checkpointing_maps_to_remat(tmp_path, monkeypatch):
    """The reference YAML key must enable block remat on the built UNet."""
    from seervideoldm_tpu.pipelines import loading

    captured = {}

    def fake_initialize(rng, **kw):
        captured.update(kw)
        raise _Sentinel

    class _Sentinel(Exception):
        pass

    monkeypatch.setattr(loading.SeerModels, "initialize",
                        staticmethod(fake_initialize))
    cfg = load_config(_write_cfg(tmp_path, gradient_checkpointing=True))
    import jax

    with pytest.raises(_Sentinel):
        loading.load_models(cfg, jax.random.PRNGKey(0))
    assert captured["remat"] is True

    captured.clear()
    cfg2 = load_config(_write_cfg(tmp_path, gradient_checkpointing=True,
                                  remat="save_attn"))
    with pytest.raises(_Sentinel):
        loading.load_models(cfg2, jax.random.PRNGKey(0))
    # explicit TPU-native knob wins over the bool mapping
    assert captured["remat"] == "save_attn"


def test_use_pallas_attention_knob_wired(tmp_path, monkeypatch):
    """`use_pallas_attention: false` must actually force the XLA attention
    paths (it was a dead config field before r3)."""
    import importlib

    import jax

    from seervideoldm_tpu.pipelines import loading

    fa = importlib.import_module("seervideoldm_tpu.ops.pallas.flash_attention")
    swat = importlib.import_module("seervideoldm_tpu.ops.pallas.swat_attention")

    class _Sentinel(Exception):
        pass

    def fake_initialize(rng, **kw):
        raise _Sentinel

    monkeypatch.setattr(loading.SeerModels, "initialize",
                        staticmethod(fake_initialize))
    try:
        cfg = load_config(_write_cfg(tmp_path, use_pallas_attention=False))
        with pytest.raises(_Sentinel):
            loading.load_models(cfg, jax.random.PRNGKey(0))
        assert fa._DISABLE and swat._DISABLE
        assert not fa.flash_attention_available()
        assert not swat.swat_attention_available()

        cfg2 = load_config(_write_cfg(tmp_path, use_pallas_attention=True))
        with pytest.raises(_Sentinel):
            loading.load_models(cfg2, jax.random.PRNGKey(0))
        assert not fa._DISABLE and not swat._DISABLE
    finally:
        fa._DISABLE = False
        swat._DISABLE = False


@pytest.mark.slow
def test_seq_mesh_builds_seq_sharded_unet(tmp_path):
    """A mesh with a 'seq' axis must produce a UNet with frame-axis
    activation sharding and register the mesh for shard_map-wrapped
    Pallas kernel dispatch (the kernels stay ENABLED since r3.5)."""
    import importlib

    import jax

    from seervideoldm_tpu.parallel.mesh import create_mesh
    from seervideoldm_tpu.pipelines import loading

    swat = importlib.import_module("seervideoldm_tpu.ops.pallas.swat_attention")
    mesh = create_mesh({"data": 2, "seq": 2})
    cfg = load_config(_write_cfg(
        tmp_path, resolution=32, num_frames=4,
        model_overrides={
            "unet": {"block_out_channels": [32, 64], "layers_per_block": 1,
                     "norm_num_groups": 8, "cross_attention_dim": 32,
                     "attention_head_dim": 4},
            "vae": {"block_out_channels": [16, 32], "layers_per_block": 1,
                    "norm_num_groups": 8},
            "clip": {"vocab_size": 128, "hidden_size": 32,
                     "intermediate_size": 64, "num_hidden_layers": 2,
                     "num_attention_heads": 4, "max_position_embeddings": 16},
            "fstext": {"n_heads": 4, "num_layers": 1}}))
    from seervideoldm_tpu.ops.pallas import get_activation_mesh, set_activation_mesh

    try:
        models, _ = loading.load_models(cfg, jax.random.PRNGKey(0), mesh=mesh)
        sh = models.unet.activation_sharding
        assert sh is not None
        assert sh.spec == jax.sharding.PartitionSpec(
            "data", "seq", None, None, None)
        assert not swat._DISABLE  # kernels stay enabled under seq sharding
        reg = get_activation_mesh()
        assert reg is not None and reg[0] is mesh
        assert reg[1] == ("data", "seq")  # batch axes for shard_map dispatch
    finally:
        set_activation_mesh(None)
        swat._DISABLE = False
        importlib.import_module(
            "seervideoldm_tpu.ops.pallas.flash_attention")._DISABLE = False


def test_center_crop_false_rejected(tmp_path):
    with pytest.raises(ValueError, match="center_crop"):
        load_config(_write_cfg(tmp_path, center_crop=False))
    assert load_config(_write_cfg(tmp_path, center_crop=True)).center_crop


@pytest.mark.slow
def test_donate_latents_knob_wired():
    """`donate_latents: false` must keep the caller's x_T buffer alive."""
    import jax.numpy as jnp

    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.unet3d import SeerUNetConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.pipelines.text_video import SeerModels, SeerPipeline
    import jax

    models = SeerModels.initialize(
        jax.random.PRNGKey(0), num_frames=4,
        unet_config=SeerUNetConfig(block_out_channels=(32, 64),
                                   layers_per_block=1, norm_num_groups=8,
                                   cross_attention_dim=32, attention_head_dim=4),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8),
        clip_config=CLIPTextConfig(vocab_size=128, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   max_position_embeddings=16),
        fstext_kwargs=dict(n_heads=4, num_layers=1),
        dtype=jnp.float32, latent_size=8,
    )
    pipe = SeerPipeline(models, donate_latents=False)
    x_T = jnp.zeros((1, 3, 8, 8, 4))
    x0 = jnp.zeros((1, 1, 8, 8, 4))
    ctx = jnp.zeros((1, 4, 16, 32))
    pipe.sample_latents(x_T, x0, ctx, ddim_steps=2, guidance_scale=1.0)
    # not donated: the input buffer must still be readable
    assert float(x_T.sum()) == 0.0


def test_cpu_cache_dir_keyed_by_host_fingerprint(tmp_path, monkeypatch):
    """XLA:CPU persistent-cache entries are host-specific AOT machine code;
    a box swap mid-project turned stale entries into silent SIGILLs (a
    train.py subprocess died after its last step with no traceback).  The
    cache dir must be keyed by the host CPU fingerprint on the cpu backend
    so entries can never cross hosts."""
    import jax

    from seervideoldm_tpu.utils.cache import (enable_compilation_cache,
                                              host_cpu_fingerprint)

    fp = host_cpu_fingerprint()
    assert fp and "/" not in fp
    monkeypatch.delenv("JAX_CACHE_DIR", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path / "cache"))
        got = jax.config.jax_compilation_cache_dir
        # conftest forces the cpu backend for the whole suite
        assert got == str(tmp_path / f"cache-cpu-{fp}")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_trainable_scope_knob(tmp_path):
    """trainable_scope widens the trainable partition to every UNet+FSText
    leaf ('all': from-scratch training / the overfit-one-clip proof) or
    keeps the reference's partial freeze ('reference',
    /root/reference/train.py:123-125,188-192); anything else — and the
    lora_rank>0 combination, whose adapters require the frozen-UNet
    layout — is rejected loudly."""
    import jax

    from seervideoldm_tpu.training.optim import trainable_mask

    params = {"unet": {"temporal_attentions_0": {"w": 1.0}, "conv": {"w": 2.0}},
              "fstext": {"w": 3.0}}
    ref = trainable_mask(params, "reference")
    assert ref["unet"]["conv"]["w"] is False
    assert ref["unet"]["temporal_attentions_0"]["w"] is True
    assert ref["fstext"]["w"] is True
    alln = trainable_mask(params, "all")
    assert all(jax.tree_util.tree_leaves(alln))
    with pytest.raises(ValueError):
        trainable_mask(params, "spatial")

    cfg = load_config(_write_cfg(tmp_path, trainable_scope="all"))
    assert cfg.trainable_scope == "all"
    with pytest.raises(ValueError, match="trainable_scope"):
        load_config(_write_cfg(tmp_path, trainable_scope="nope"))
    with pytest.raises(ValueError, match="lora_rank"):
        load_config(_write_cfg(tmp_path, trainable_scope="all", lora_rank=4))
