"""Full-UNet golden parity: JAX SeerUNet + converter vs the independent
torch oracle (tests/torch_ref.py) with identical weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from seervideoldm_tpu.io.convert import convert_seer_unet
from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from torch_ref import TinySeerUNet

CFG = SeerUNetConfig(
    block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
    cross_attention_dim=16, attention_head_dim=4,
)



pytestmark = pytest.mark.critical

@pytest.fixture(scope="module")
def models_and_params():
    torch.manual_seed(0)
    oracle = TinySeerUNet(boc=(32, 64), layers=1, groups=8, ctx_dim=16, heads=4).eval()
    unet = SeerUNet(config=CFG)
    sample = jnp.zeros((1, 4, 8, 8, 4))
    ctx = jnp.zeros((1, 4, 5, 16))
    params = unet.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx, 0)["params"]
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, fresh = convert_seer_unet(sd, params, strict=True)
    assert not fresh, f"unconverted params: {fresh[:8]}"
    return oracle, unet, params


@pytest.mark.parametrize("cond_frame", [0, 2])
def test_unet_matches_torch_oracle(models_and_params, cond_frame):
    oracle, unet, params = models_and_params
    rng = np.random.RandomState(1)
    b, f, h, w = 1, 4, 8, 8
    x = rng.randn(b, f, h, w, 4).astype(np.float32)
    ctx = rng.randn(b, f, 5, 16).astype(np.float32)
    ts = np.array([321], dtype=np.int64)

    got = np.asarray(unet.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ts.astype(np.int32)),
        jnp.asarray(ctx), cond_frame,
    ))
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3),  # (b, c, f, h, w)
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            cond_frame=cond_frame,
        ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow
def test_unet_parity_larger_spatial(models_and_params):
    """16x16 exercises the windowed (ws=4) temporal attention path.

    slow-marked (~70 s of 1-core compile): the ws=4 window path is also
    covered at ops level by test_swat_kernel / test_ops."""
    oracle, unet, params = models_and_params
    rng = np.random.RandomState(2)
    b, f, h, w = 1, 3, 16, 16
    x = rng.randn(b, f, h, w, 4).astype(np.float32)
    ctx = rng.randn(b, f, 5, 16).astype(np.float32)
    ts = np.array([7], dtype=np.int64)
    got = np.asarray(unet.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ts.astype(np.int32)),
        jnp.asarray(ctx), 0,
    ))
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3), torch.from_numpy(ts),
            torch.from_numpy(ctx), cond_frame=0,
        ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow
def test_unet_parity_full_width():
    """Real SD-1.5 geometry where the binding constants actually bite:
    320/640 channels, heads 8 (d_head 40/80), rot_dim 32, 77x768 CLIP
    context, 32x32 latents (ws=8 SWAT windows), fp32 GN islands
    (VERDICT round-1: parity was only ever tested at toy widths)."""
    torch.manual_seed(3)
    oracle = TinySeerUNet(boc=(320, 640), layers=1, groups=32, ctx_dim=768,
                          heads=8).eval()
    cfg = SeerUNetConfig(block_out_channels=(320, 640), layers_per_block=1,
                         norm_num_groups=32, cross_attention_dim=768,
                         attention_head_dim=8)
    unet = SeerUNet(config=cfg)
    b, f, h, w = 1, 3, 32, 32
    sample = jnp.zeros((b, f, h, w, 4))
    ctx = jnp.zeros((b, f, 77, 768))
    params = unet.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx, 0)["params"]
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, fresh = convert_seer_unet(sd, params, strict=True)
    assert not fresh, f"unconverted params: {fresh[:8]}"

    rng = np.random.RandomState(4)
    x = rng.randn(b, f, h, w, 4).astype(np.float32)
    ctx = rng.randn(b, f, 77, 768).astype(np.float32) * 0.1
    ts = np.array([500], dtype=np.int64)
    got = np.asarray(unet.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ts.astype(np.int32)),
        jnp.asarray(ctx), 2,
    ))
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3), torch.from_numpy(ts),
            torch.from_numpy(ctx), cond_frame=2,
        ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3)
