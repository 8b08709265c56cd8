"""CLIPSIM metric (beyond reference): CLIP ViT image tower + projections,
oracle-parity tested against the real HF ``transformers.CLIPModel`` at tiny
config — the same converted-weights bar as every other pretrained component.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.evaluation.clip_sim import (
    CLIPProjections, CLIPVisionConfig, CLIPVisionModel, clip_similarity,
    make_clip_sim_fn, pool_text_eos, preprocess_frames,
)
from seervideoldm_tpu.io.convert import (
    convert_clip_projections, convert_clip_text, convert_clip_vision,
)
from seervideoldm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

VOCAB = 64
PROJ = 16

TINY_VISION = CLIPVisionConfig(image_size=16, patch_size=8, hidden_size=24,
                               intermediate_size=48, num_hidden_layers=2,
                               num_attention_heads=2, projection_dim=PROJ)
TINY_TEXT = CLIPTextConfig(vocab_size=VOCAB, hidden_size=20,
                           intermediate_size=40, num_hidden_layers=2,
                           num_attention_heads=2, max_position_embeddings=12)


@pytest.fixture(scope="module")
def oracle():
    """Tiny torch CLIPModel + its state dict (numpy)."""
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFText
    from transformers import CLIPVisionConfig as HFVision

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=HFText(
            vocab_size=VOCAB, hidden_size=20, intermediate_size=40,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=12, eos_token_id=VOCAB - 1,
            bos_token_id=VOCAB - 2, pad_token_id=0,
        ).to_dict(),
        vision_config=HFVision(
            image_size=16, patch_size=8, hidden_size=24,
            intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=2,
        ).to_dict(),
        projection_dim=PROJ,
    )
    model = CLIPModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd


def _ids(b=2, n=12):
    """Random ids whose max (= eos) sits at the last position, so HF's and
    our argmax EOS pooling agree by construction."""
    rng = np.random.RandomState(0)
    ids = rng.randint(1, VOCAB - 2, size=(b, n)).astype(np.int32)
    ids[:, -1] = VOCAB - 1
    return ids


def _convert(sd):
    vision = CLIPVisionModel(TINY_VISION)
    text = CLIPTextModel(TINY_TEXT)
    proj = CLIPProjections(projection_dim=PROJ)
    k = jax.random.PRNGKey(0)
    vp = vision.init(k, jnp.zeros((1, 16, 16, 3)))["params"]
    tp = text.init(k, jnp.zeros((1, 12), jnp.int32))["params"]
    pp = proj.init(k, jnp.zeros((1, 24)), jnp.zeros((1, 20)))["params"]
    text_sd = {k_: v for k_, v in sd.items() if k_.startswith("text_model.")}
    return (vision, text, proj,
            convert_clip_vision(sd, vp),
            convert_clip_text(text_sd, tp),
            convert_clip_projections(sd, pp))


@pytest.mark.slow
def test_image_features_match_transformers(oracle):
    import torch

    model, sd = oracle
    vision, _, proj, vp, _, pp = _convert(sd)
    pixels = np.random.RandomState(1).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(torch.from_numpy(pixels)).numpy()
    pooled = vision.apply({"params": vp},
                          jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    got = np.asarray(proj.apply({"params": pp}, pooled,
                                jnp.zeros((2, 20)))[0])
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_text_features_match_transformers(oracle):
    import torch

    model, sd = oracle
    _, text, proj, _, tp, pp = _convert(sd)
    ids = _ids()
    with torch.no_grad():
        want = model.get_text_features(torch.from_numpy(ids.astype(np.int64))).numpy()
    hidden = text.apply({"params": tp}, jnp.asarray(ids))
    pooled = pool_text_eos(hidden, jnp.asarray(ids))
    got = np.asarray(proj.apply({"params": pp}, jnp.zeros((2, 24)),
                                pooled)[1])
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_clip_similarity_is_cosine():
    a = jnp.asarray([[3.0, 0.0], [1.0, 1.0]])
    b = jnp.asarray([[1.0, 0.0], [-1.0, -1.0]])
    np.testing.assert_allclose(np.asarray(clip_similarity(a, b)),
                               [1.0, -1.0], atol=1e-6)


def test_preprocess_shapes_and_normalization():
    frames = jnp.ones((3, 20, 20, 3)) * 0.5
    out = preprocess_frames(frames, 16)
    assert out.shape == (3, 16, 16, 3)
    from seervideoldm_tpu.evaluation.clip_sim import (CLIP_IMAGE_MEAN,
                                                      CLIP_IMAGE_STD)
    want = (0.5 - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), want, atol=1e-5)


def test_clip_sim_fn_end_to_end(oracle):
    """The jitted scorer matches a manual per-frame torch computation."""
    import torch

    model, sd = oracle
    vision, text, proj, vp, tp, pp = _convert(sd)
    fn = make_clip_sim_fn(vision, text, proj, vp, tp, pp)
    b, f = 2, 3
    videos = np.random.RandomState(2).rand(b, f, 16, 16, 3).astype(np.float32)
    ids = _ids(b)
    got = np.asarray(fn(jnp.asarray(videos), jnp.asarray(ids),
                        jnp.ones_like(ids)))
    assert got.shape == (b,)

    frames = np.asarray(preprocess_frames(
        jnp.asarray(videos.reshape(b * f, 16, 16, 3)), 16))
    with torch.no_grad():
        img = model.get_image_features(
            torch.from_numpy(frames.transpose(0, 3, 1, 2))).numpy()
        txt = model.get_text_features(
            torch.from_numpy(ids.astype(np.int64))).numpy()
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    want = (img.reshape(b, f, -1) * txt[:, None]).sum(-1).mean(axis=1)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
