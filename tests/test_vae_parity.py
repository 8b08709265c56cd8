"""VAE golden parity: JAX AutoencoderKL + converter vs torch oracle
(diffusers structure/names)."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from seervideoldm_tpu.io.convert import convert_vae
from seervideoldm_tpu.models.vae import AutoencoderKL, VAEConfig

sys.path.insert(0, os.path.dirname(__file__))
from torch_ref import TinyVAE  # noqa: E402

CFG = VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8)



pytestmark = pytest.mark.critical

@pytest.fixture(scope="module")
def vaes():
    torch.manual_seed(0)
    oracle = TinyVAE(boc=(16, 32), layers=1, groups=8).eval()
    vae = AutoencoderKL(config=CFG)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_vae(sd, params)
    return oracle, vae, params


def test_vae_encode_moments_parity(vaes):
    oracle, vae, params = vaes
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    mean, logvar = vae.apply({"params": params}, jnp.asarray(x),
                             method=vae.encode_moments)
    with torch.no_grad():
        moments = oracle.encode_moments(torch.from_numpy(x).permute(0, 3, 1, 2))
    want_mean, want_logvar = moments.chunk(2, dim=1)
    np.testing.assert_allclose(
        np.asarray(mean), want_mean.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logvar),
        torch.clamp(want_logvar, -30, 20).permute(0, 2, 3, 1).numpy(), atol=2e-4,
    )


def test_vae_decode_parity(vaes):
    oracle, vae, params = vaes
    z = np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32)
    got = np.asarray(vae.apply({"params": params}, jnp.asarray(z), method=vae.decode))
    with torch.no_grad():
        want = oracle.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_vae_encode_sample_uses_posterior(vaes):
    oracle, vae, params = vaes
    x = jnp.zeros((1, 16, 16, 3))
    z1 = vae.apply({"params": params}, x, jax.random.PRNGKey(0), method=vae.encode)
    z2 = vae.apply({"params": params}, x, jax.random.PRNGKey(1), method=vae.encode)
    z_mode = vae.apply({"params": params}, x, None, False, method=vae.encode)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))  # stochastic
    mean, _ = vae.apply({"params": params}, x, method=vae.encode_moments)
    np.testing.assert_array_equal(np.asarray(z_mode), np.asarray(mean))
