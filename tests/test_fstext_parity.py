"""FSText golden parity: JAX FSTextTransformer + converter vs torch oracle."""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from seervideoldm_tpu.io.convert import convert_fstext
from seervideoldm_tpu.models.fstext import FSTextTransformer

sys.path.insert(0, os.path.dirname(__file__))
from torch_ref import TinyFSText  # noqa: E402


def _build(num_frames, pos_frames):
    torch.manual_seed(3)
    oracle = TinyFSText(num_frames=num_frames, dim=16, heads=4, num_layers=2,
                        pos_frames=pos_frames).eval()
    # give the zero-init params nonzero values so the test is meaningful
    with torch.no_grad():
        oracle.learnable_query.normal_(0, 0.5)
        oracle.pos_embed.normal_(0, 0.5)
    model = FSTextTransformer(
        num_frames=num_frames, pos_embed_frames=pos_frames, in_channels=16,
        out_channels=16, n_heads=4, num_layers=2, cross_attention_dim=16,
    )
    ctx0 = jnp.zeros((1, 5, 16))
    params = model.init(jax.random.PRNGKey(0), ctx0)["params"]
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_fstext(sd, params)
    return oracle, model, params


@pytest.mark.slow
def test_fstext_matches_torch_oracle():
    oracle, model, params = _build(num_frames=8, pos_frames=8)
    ctx = np.random.RandomState(4).randn(2, 5, 16).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ctx)))
    with torch.no_grad():
        want = oracle(torch.from_numpy(ctx)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fstext_frame_interpolation_parity():
    """num_frames != pos_embed frames -> nearest interpolation path."""
    oracle, model, params = _build(num_frames=6, pos_frames=8)
    ctx = np.random.RandomState(5).randn(1, 5, 16).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ctx)))
    with torch.no_grad():
        want = oracle(torch.from_numpy(ctx)).numpy()
    assert got.shape == (1, 6, 5, 16)
    np.testing.assert_allclose(got, want, atol=2e-4)
