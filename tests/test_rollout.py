"""Autoregressive long-video rollout (beyond reference).

``SeerPipeline.generate_rollout`` rolls the reference's fixed
``num_frames`` window forward, feeding the last ``cond_frames`` generated
latents back as conditioning, until ``total_frames`` future frames exist
(reference window semantics: ``inference_img.py:164-177`` ref).
"""
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

B, F1, NUM_FRAMES, RES = 1, 1, 4, 16  # vae scale 2 -> latent 8; f2 = 3


@pytest.fixture(scope="module")
def tiny_models():
    return SeerModels.initialize(
        jax.random.PRNGKey(0), num_frames=NUM_FRAMES, unet_config=TINY_UNET,
        vae_config=TINY_VAE, clip_config=TINY_CLIP, fstext_kwargs=FSTEXT_KW,
        dtype=jnp.float32, latent_size=8,
    )


def _tok(seed=0):
    r = np.random.RandomState(seed)
    return {"input_ids": r.randint(1, 100, (B, 16)).astype(np.int32),
            "attention_mask": np.ones((B, 16), dtype=np.int32)}


def _cond():
    return jnp.asarray(
        np.random.RandomState(0).randn(B, F1, RES, RES, 3).astype(np.float32))


def test_single_chunk_matches_generate_bitwise(tiny_models):
    """total_frames == f2: the rollout is one window and must equal
    generate() exactly (same k_enc/k_noise split of the same rng)."""
    pipe = SeerPipeline(tiny_models)
    tok, uc = _tok(1), _tok(2)
    # ddim_steps must divide 1000: the reference's +1-offset grid indexes
    # alphacums[1000] otherwise (faithful quirk, see schedules.py)
    kw = dict(num_frames=NUM_FRAMES, rng=jax.random.PRNGKey(7),
              ddim_steps=4, guidance_scale=7.5)
    ref = pipe.generate(_cond(), tok["input_ids"], tok["attention_mask"],
                        uc["input_ids"], uc["attention_mask"], **kw)
    out = pipe.generate_rollout(_cond(), [tok], uc["input_ids"],
                                uc["attention_mask"], total_frames=3, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.slow
def test_multi_chunk_shape_and_truncation(tiny_models):
    """total_frames = 7 with f2 = 3 -> 3 chunks, truncated to 7 frames."""
    pipe = SeerPipeline(tiny_models)
    tok, uc = _tok(1), _tok(2)
    out = pipe.generate_rollout(
        _cond(), [tok], uc["input_ids"], uc["attention_mask"],
        num_frames=NUM_FRAMES, total_frames=7, rng=jax.random.PRNGKey(7),
        ddim_steps=2, guidance_scale=7.5,
    )
    assert out.shape == (B, 7, RES, RES, 3)
    out = np.asarray(out)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0


def test_prompt_count_validation(tiny_models):
    pipe = SeerPipeline(tiny_models)
    tok, uc = _tok(1), _tok(2)
    with pytest.raises(ValueError, match="1 or 3 prompts"):
        pipe.generate_rollout(
            _cond(), [tok, tok], uc["input_ids"], uc["attention_mask"],
            num_frames=NUM_FRAMES, total_frames=9, rng=jax.random.PRNGKey(0),
            ddim_steps=2,
        )
    with pytest.raises(ValueError, match="total_frames"):
        pipe.generate_rollout(
            _cond(), [tok], uc["input_ids"], uc["attention_mask"],
            num_frames=NUM_FRAMES, total_frames=0, rng=jax.random.PRNGKey(0),
            ddim_steps=2,
        )


def test_chunks_conditioned_on_previous_latents(tiny_models, monkeypatch):
    """Chunk k's x0_emb must be the last f1 latents of chunk k-1's output
    (latent-space feedback, no decode/encode round trip)."""
    pipe = SeerPipeline(tiny_models)
    tok, uc = _tok(1), _tok(2)
    seen = []

    def fake_sample_latents(x_T, x0_emb, context, uncond_context, **kw):
        seen.append(np.asarray(x0_emb))
        # deterministic marker output: chunk index stamped into the latents
        return jnp.full_like(x_T, float(len(seen)))

    monkeypatch.setattr(pipe, "sample_latents", fake_sample_latents)
    out = pipe.generate_rollout(
        _cond(), [tok], uc["input_ids"], uc["attention_mask"],
        num_frames=NUM_FRAMES, total_frames=6, rng=jax.random.PRNGKey(7),
        ddim_steps=2, guidance_scale=7.5,
    )
    assert len(seen) == 2
    # chunk 0: VAE-encoded conditioning; chunk 1: previous chunk's tail
    np.testing.assert_array_equal(seen[1], np.full_like(seen[1], 1.0))
    assert out.shape == (B, 6, RES, RES, 3)


def test_per_chunk_prompts_reach_the_sampler(tiny_models, monkeypatch):
    """Distinct per-chunk instructions produce distinct contexts; repeated
    prompts hit the context cache (one FSText call per unique prompt)."""
    pipe = SeerPipeline(tiny_models)
    tok_a, tok_b, uc = _tok(1), _tok(3), _tok(2)
    contexts, fstext_calls = [], []

    real_fstext = pipe.fstext

    def counting_fstext(clip_emb):
        fstext_calls.append(1)
        return real_fstext(clip_emb)

    def fake_sample_latents(x_T, x0_emb, context, uncond_context, **kw):
        contexts.append(np.asarray(context))
        return jnp.zeros_like(x_T)

    monkeypatch.setattr(pipe, "fstext", counting_fstext)
    monkeypatch.setattr(pipe, "sample_latents", fake_sample_latents)
    pipe.generate_rollout(
        _cond(), [tok_a, tok_b, tok_a], uc["input_ids"], uc["attention_mask"],
        num_frames=NUM_FRAMES, total_frames=9, rng=jax.random.PRNGKey(7),
        ddim_steps=2,
    )
    assert len(contexts) == 3
    assert not np.array_equal(contexts[0], contexts[1])
    np.testing.assert_array_equal(contexts[0], contexts[2])
    assert len(fstext_calls) == 2  # a, b cached; repeat of a reuses
