"""End-to-end golden latents: a fixed tiny model + fixed inputs must keep
producing the same sampler outputs across refactors.

Module-level parity tests (UNet/FSText oracles, schedule tables) verify
pieces; this locks the COMPOSITION — conditioning mechanics, CFG, the scan
update — against silent math drift between rounds.  Fixture written by
``tests/fixtures/gen_golden_latents.py`` on CPU with
``jax_default_matmul_precision=highest`` (the conftest forces both).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_latents.npz")


def build_case():
    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.unet3d import SeerUNetConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.pipelines.text_video import SeerModels, SeerPipeline

    models = SeerModels.initialize(
        jax.random.PRNGKey(7), num_frames=4,
        unet_config=SeerUNetConfig(
            block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
            cross_attention_dim=32, attention_head_dim=4,
        ),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8),
        clip_config=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   max_position_embeddings=16),
        fstext_kwargs=dict(n_heads=4, num_layers=1),
        dtype=jnp.float32, latent_size=8,
    )
    pipe = SeerPipeline(models, donate_latents=False)
    rng = np.random.RandomState(3)
    x_T = jnp.asarray(rng.randn(2, 3, 8, 8, 4).astype(np.float32))
    x0_emb = jnp.asarray(rng.randn(2, 1, 8, 8, 4).astype(np.float32))
    clip_emb = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
    context = pipe.fstext(clip_emb)
    uncond = jnp.broadcast_to(clip_emb[:, None], (2, 4, 16, 32))
    kw = dict(ddim_steps=4, guidance_scale=7.5)
    return pipe, x_T, x0_emb, context, uncond, kw


def compute_outputs():
    pipe, x_T, x0_emb, context, uncond, kw = build_case()
    # zero-terminal-SNR recipe locked on the SAME weights/inputs: rescaled
    # schedule + trailing grid + v-prediction + CFG std-rescale
    from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule
    from seervideoldm_tpu.pipelines.text_video import SeerPipeline

    pipe_z = SeerPipeline(
        pipe.m, schedule=DiffusionSchedule.create(1000, rescale_zero_snr=True),
        donate_latents=False)
    zkw = dict(kw, prediction_type="v_prediction",
               timestep_spacing="trailing", guidance_rescale=0.7)
    return {
        "ddim": np.asarray(pipe.sample_latents(
            x_T, x0_emb, context, uncond, sampler="ddim", **kw)),
        "dpmpp": np.asarray(pipe.sample_latents(
            x_T, x0_emb, context, uncond, sampler="dpm++", **kw)),
        "ddim_zero_snr": np.asarray(pipe_z.sample_latents(
            x_T, x0_emb, context, uncond, sampler="ddim", **zkw)),
        "dpmpp_zero_snr": np.asarray(pipe_z.sample_latents(
            x_T, x0_emb, context, uncond, sampler="dpm++", **zkw)),
    }


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="golden fixture not generated")
def test_sampler_outputs_match_golden():
    golden = np.load(FIXTURE)
    got = compute_outputs()
    for name in ("ddim", "dpmpp", "ddim_zero_snr", "dpmpp_zero_snr"):
        np.testing.assert_allclose(
            got[name], golden[name], rtol=1e-4, atol=1e-5,
            err_msg=f"{name} sampler drifted from the golden fixture — if "
                    f"the change is intentional, regenerate via "
                    f"tests/fixtures/gen_golden_latents.py")
