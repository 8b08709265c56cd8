"""Model-layer tests: shapes, zero-init identity, cond-frame FF skip,
FSText pos-embed interpolation, timestep embedding parity vs diffusers math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from seervideoldm_tpu.models.embeddings import timestep_embedding
from seervideoldm_tpu.models.fstext import FSTextTransformer, _nearest_resize_frames
from seervideoldm_tpu.models.resnet3d import Downsample3D, ResnetBlock3D, Upsample3D
from seervideoldm_tpu.models.transformer3d import SpatialTransformer3D
from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig

TINY = SeerUNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    norm_num_groups=8,
    cross_attention_dim=16,
    attention_head_dim=4,
)


def torch_timestep_embedding(timesteps, dim, flip_sin_to_cos=True, downscale_freq_shift=0.0):
    """Independent re-derivation of diffusers get_timestep_embedding."""
    import math

    half_dim = dim // 2
    dtype = timesteps.dtype if timesteps.is_floating_point() else torch.float32
    exponent = -math.log(10000) * torch.arange(half_dim, dtype=dtype) / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps.to(dtype)[:, None] * emb[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    return emb


def test_timestep_embedding_parity():
    ts = np.array([0, 1, 500, 999], dtype=np.int32)
    got = np.asarray(timestep_embedding(jnp.asarray(ts), 320))
    want = torch_timestep_embedding(torch.from_numpy(ts), 320).numpy()
    # torch's fp32 exp gives ~1-ulp frequency error amplified by t≈1000 into
    # ~2e-3 phase noise; our fp64 static table is the more accurate one.
    np.testing.assert_allclose(got, want, atol=5e-3)
    # exact parity against an fp64 ground truth
    want64 = torch_timestep_embedding(torch.from_numpy(ts).double(), 320).numpy()
    np.testing.assert_allclose(got, want64, atol=5e-5)


def test_resnet_block_shapes_and_shortcut():
    block = ResnetBlock3D(in_channels=32, out_channels=64, temb_channels=128, groups=8)
    x = jnp.ones((1, 2, 8, 8, 32))
    temb = jnp.ones((1, 128))
    params = block.init(jax.random.PRNGKey(0), x, temb)
    y = block.apply(params, x, temb)
    assert y.shape == (1, 2, 8, 8, 64)
    assert "conv_shortcut" in params["params"]  # channel change -> 1x1 shortcut


def test_upsample_downsample():
    x = jnp.ones((1, 2, 8, 8, 16))
    up = Upsample3D(16)
    y = up.apply(up.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 2, 16, 16, 16)  # spatial only, frames untouched
    down = Downsample3D(16)
    y = down.apply(down.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 2, 4, 4, 16)


def test_spatial_transformer_zero_init_is_identity():
    """proj_out is zero-initialized -> block output equals input at init."""
    st = SpatialTransformer3D(
        32, 4, 8, temporal=True, causal=True, norm_num_groups=8
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 4, 4, 32).astype(np.float32))
    params = st.init(jax.random.PRNGKey(0), x)
    y = st.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_temporal_block_cond_frame_ff_skip():
    """cond frames bypass the FF residual; with zero FF output all frames equal."""
    from seervideoldm_tpu.models.transformer3d import BasicTransformerBlock3D

    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 4, 32).astype(np.float32))
    blk0 = BasicTransformerBlock3D(32, 4, 8, temporal=True, causal=True, cond_frame=0)
    blk2 = BasicTransformerBlock3D(32, 4, 8, temporal=True, causal=True, cond_frame=2)
    params = blk0.init(jax.random.PRNGKey(0), x)
    y0 = np.asarray(blk0.apply(params, x))
    y2 = np.asarray(blk2.apply(params, x))
    # attention part identical; only FF residual differs on cond frames
    assert not np.allclose(y0[:, :2], y2[:, :2])
    np.testing.assert_allclose(y0[:, 2:], y2[:, 2:], atol=1e-6)


def test_temporal_causality():
    """Future frames must not influence past frames through the windowed
    causal attention.  (Note: the full SpatialTransformer3D is NOT strictly
    frame-causal — its GroupNorm statistics span all frames, faithfully
    matching the reference, so we test the attention op itself.)"""
    from seervideoldm_tpu.ops.attention import WindowTemporalAttention

    attn = WindowTemporalAttention(query_dim=32, heads=4, dim_head=8, causal=True)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 8, 8, 32).astype(np.float32)
    params = attn.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y1 = np.asarray(attn.apply(params, jnp.asarray(x)))
    x_mod = x.copy()
    x_mod[:, -1] += 10.0  # perturb last frame only
    y2 = np.asarray(attn.apply(params, jnp.asarray(x_mod)))
    np.testing.assert_allclose(y1[:, :-1], y2[:, :-1], atol=1e-4)
    assert not np.allclose(y1[:, -1], y2[:, -1])


@pytest.mark.slow
def test_fstext_shapes_and_interpolation():
    model = FSTextTransformer(num_frames=12, num_layers=2)
    ctx = jnp.asarray(np.random.RandomState(4).randn(2, 7, 768).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ctx)
    out = model.apply(params, ctx)
    assert out.shape == (2, 12, 7, 768)
    assert params["params"]["pos_embed"].shape == (1, 16, 1024, 768)


def test_nearest_frame_resize_matches_torch():
    pe = np.random.RandomState(5).randn(1, 16, 4, 8).astype(np.float32)
    for nf in (12, 16, 20, 5):
        got = np.asarray(_nearest_resize_frames(jnp.asarray(pe), nf))
        want = (
            torch.nn.functional.interpolate(
                torch.from_numpy(pe).permute(0, 3, 1, 2), size=(nf, 4)
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("cond_frame", [
    pytest.param(0, marks=pytest.mark.slow), 1])
def test_seer_unet_tiny_forward(cond_frame):
    unet = SeerUNet(config=TINY)
    b, f, h, w = 1, 3, 16, 16
    sample = jnp.asarray(np.random.RandomState(6).randn(b, f, h, w, 4).astype(np.float32))
    ctx = jnp.asarray(np.random.RandomState(7).randn(b, f, 7, 16).astype(np.float32))
    ts = jnp.array([500])
    # jitted: one compile beats eager per-op dispatch by ~5x here
    params = jax.jit(lambda k: unet.init(k, sample, ts, ctx, cond_frame))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda p: unet.apply(p, sample, ts, ctx, cond_frame))(params)
    assert out.shape == (b, f, h, w, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_attention_slice_matches_unsliced():
    """Model-level set_attention_slice parity knob
    (reference unet_3d_condition.py:214-277): sliced attention must be a
    pure memory/scheduling choice, never a numerics change."""
    import jax.random as jr

    from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig

    base = dict(block_out_channels=(32, 64), layers_per_block=1,
                norm_num_groups=8, cross_attention_dim=32, attention_head_dim=4)
    cfg_sliced = SeerUNetConfig(**base, attention_slice=2)
    cfg_plain = SeerUNetConfig(**base)
    x = jr.normal(jr.PRNGKey(1), (1, 4, 8, 8, 4))
    ctx = jr.normal(jr.PRNGKey(2), (1, 4, 77, 32))
    t = jnp.zeros((1,), jnp.int32)
    params = SeerUNet(config=cfg_plain).init(jr.PRNGKey(0), x, t, ctx, 0)
    out_plain = SeerUNet(config=cfg_plain).apply(params, x, t, ctx, 0)
    out_sliced = SeerUNet(config=cfg_sliced).apply(params, x, t, ctx, 0)
    np.testing.assert_allclose(np.asarray(out_sliced), np.asarray(out_plain),
                               atol=2e-5)
