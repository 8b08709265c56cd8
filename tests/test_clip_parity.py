"""Golden-value parity: Flax CLIP text encoder + weight converter vs the
HF torch CLIPTextModel (random weights, tiny config — no downloads)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from seervideoldm_tpu.io.convert import convert_clip_text
from seervideoldm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel


@pytest.fixture(scope="module")
def torch_clip():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    cfg = HFConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = HFModel(cfg).eval()
    return model


def test_clip_text_matches_hf_torch(torch_clip):
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
    )
    model = CLIPTextModel(config=cfg)
    ids = np.array([[1, 5, 7, 9, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2],
                    [1, 42, 13, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2]],
                   dtype=np.int32)
    mask = (ids != 2).astype(np.int32)
    mask[:, :1] = 1

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    params = convert_clip_text(sd, params)

    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    with torch.no_grad():
        want = torch_clip(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_clip_text_no_mask_matches(torch_clip):
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
    )
    model = CLIPTextModel(config=cfg)
    ids = np.array([[1, 5, 7, 9, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 2]],
                   dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    params = convert_clip_text(sd, params)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    with torch.no_grad():
        want = torch_clip(torch.from_numpy(ids).long()).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)
