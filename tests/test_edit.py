"""SDEdit-style video editing (beyond reference; arXiv 2108.01073).

``SeerPipeline.edit`` re-noises the future-frame latents of a real clip to
``edit_strength`` of the DDIM trajectory and denoises under a new prompt,
via the reference's never-wired ``stochastic_encode``/``decode`` machinery
(``ddim_video.py:240-275``).  The t_enc encode/decode index conventions and
the cond-frame concat mechanics are pinned here.
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

B, F1, NUM_FRAMES, RES = 1, 1, 4, 16  # vae scale 2 -> latent 8; f2 = 3


@pytest.fixture(scope="module")
def pipe():
    models = SeerModels.initialize(
        jax.random.PRNGKey(0), num_frames=NUM_FRAMES, unet_config=TINY_UNET,
        vae_config=TINY_VAE, clip_config=TINY_CLIP,
        fstext_kwargs=dict(n_heads=4, num_layers=1),
        dtype=jnp.float32, latent_size=8,
    )
    return SeerPipeline(models)


def _tok(seed=0):
    r = np.random.RandomState(seed)
    return {"input_ids": r.randint(1, 100, (B, 16)).astype(np.int32),
            "attention_mask": np.ones((B, 16), dtype=np.int32)}


def _video():
    return jnp.asarray(np.random.RandomState(3).uniform(
        -1, 1, (B, NUM_FRAMES, RES, RES, 3)).astype(np.float32))


def _edit(pipe, strength, **kw):
    tok, uc = _tok(1), _tok(2)
    return pipe.edit(
        _video(), tok["input_ids"], tok["attention_mask"],
        uc["input_ids"], uc["attention_mask"],
        cond_frames=F1, edit_strength=strength, rng=jax.random.PRNGKey(7),
        **{"ddim_steps": 4, "guidance_scale": 7.5, **kw},
    )


def test_strength_zero_is_vae_roundtrip(pipe):
    """edit_strength=0 skips the sampler entirely: the output is exactly the
    VAE decode(encode(·)) of the input future frames (same k_enc split)."""
    out = _edit(pipe, 0.0)
    k_enc, _ = jax.random.split(jax.random.PRNGKey(7))
    latents = pipe.vae_encode_video(pipe._shard(_video()), k_enc)
    ref = pipe.vae_decode_video(latents[:, F1:])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_strength_one_runs_full_table(pipe):
    """edit_strength=1 encodes at the noisiest step (t_enc == table length;
    jnp.take clamps where the torch original would crash) and denoises the
    whole table — shape/finiteness/range contract."""
    out = np.asarray(_edit(pipe, 1.0))
    assert out.shape == (B, NUM_FRAMES - F1, RES, RES, 3)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0


def test_partial_strength_shape_and_tenc(pipe):
    """edit_strength=0.5 on a 4-step table runs exactly t_enc=2 reverse
    steps; the compiled fn receives the rounded index."""
    seen = {}
    orig = pipe._edit_fn

    def spy(ddim_steps, t_enc, *a, **kw):
        seen["t_enc"] = t_enc
        return orig(ddim_steps, t_enc, *a, **kw)

    pipe._edit_fn = spy
    try:
        out = np.asarray(_edit(pipe, 0.5))
    finally:
        pipe._edit_fn = orig
    assert seen["t_enc"] == 2
    assert out.shape == (B, NUM_FRAMES - F1, RES, RES, 3)
    assert np.isfinite(out).all()


def test_strength_validation(pipe):
    with pytest.raises(ValueError, match="edit_strength"):
        _edit(pipe, 1.5)
    with pytest.raises(ValueError, match="edit_strength"):
        _edit(pipe, -0.1)


def test_edited_differs_from_input_and_respects_cond_frames(pipe):
    """A non-zero strength actually changes the future frames (the sampler
    ran), and the conditioning frame is excluded from the output window."""
    base = np.asarray(_edit(pipe, 0.0))
    out = np.asarray(_edit(pipe, 0.75))
    assert out.shape == base.shape
    assert np.abs(out - base).max() > 1e-4
