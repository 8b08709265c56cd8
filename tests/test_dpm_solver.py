"""DPM-Solver++(2M) sampler: DDIM-equivalence at order 1, exactness on a
point-mass oracle, second-order accuracy vs a fine-grid reference, and the
shared conditioning mechanics (CFG + cond-frame concat)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop
from seervideoldm_tpu.diffusion.dpm_solver import dpm_solver_sample_loop
from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule


def make_tables(steps):
    return DiffusionSchedule.create(1000).ddim_tables(steps)


def _alpha_sigma(a):
    return np.sqrt(a), np.sqrt(1.0 - a)


def test_order1_equals_ddim():
    """First-order DPM-Solver++ is the DDIM eta=0 update in x0 form."""
    tables = make_tables(5)

    def unet(x, t, ctx, cf):
        return jnp.tanh(x) * 0.3 + 0.1 * jnp.cos(t / 100.0)

    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 2, 1, 8))
    got = np.asarray(dpm_solver_sample_loop(unet, x, tables, ctx, order=1))
    want = np.asarray(ddim_sample_loop(unet, x, tables, ctx))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_point_mass_oracle_exact():
    """A perfect model for a point mass at x0_true: every order must land on
    the closed-form ODE solution (the trajectory is exactly linear)."""
    tables = make_tables(4)
    x0_true = 0.73

    def unet(x, t, ctx, cf):
        # eps implied by x_t = alpha_t x0 + sigma_t eps
        a = jnp.interp(t.astype(jnp.float32)[0],
                       jnp.asarray(tables.timesteps[::-1].copy(), jnp.float32),
                       jnp.asarray(tables.alphas[::-1].copy(), jnp.float32))
        return (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1.0 - a)

    x_T = jnp.asarray(np.random.RandomState(1).randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 2, 1, 8))
    a_start, _ = tables.alphas[0], None
    a_end = tables.alphas_prev[-1]
    al_T, sg_T = _alpha_sigma(a_start)
    al_0, sg_0 = _alpha_sigma(a_end)
    want = al_0 * x0_true + (sg_0 / sg_T) * (np.asarray(x_T) - al_T * x0_true)
    for order in (1, 2):
        got = np.asarray(dpm_solver_sample_loop(
            unet, x_T, tables, ctx, order=order))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _synth_tables(n, a_start=0.02, a_end=0.98):
    """Reverse-ordered DDIM tables on a log-SNR-uniform grid with SHARED
    endpoints — the reference's +1-offset grids start at different
    timesteps for different n, which would make runs of different step
    counts integrate different initial-value problems."""
    from seervideoldm_tpu.diffusion.schedules import DDIMTables

    lam = np.linspace(0.5 * np.log(a_start / (1 - a_start)),
                      0.5 * np.log(a_end / (1 - a_end)), n + 1)
    a = 1.0 / (1.0 + np.exp(-2.0 * lam))  # inverse of lam = 0.5 log(a/(1-a))
    return DDIMTables(
        timesteps=np.linspace(900, 1, n).astype(np.int64),
        alphas=a[:-1].astype(np.float64),
        alphas_prev=a[1:].astype(np.float64),
        sigmas=np.zeros(n),
        sqrt_one_minus_alphas=np.sqrt(1.0 - a[:-1]),
    )


def test_second_order_beats_ddim_at_equal_steps():
    """On a smooth nonlinear model, 2M at N steps is closer to the fine-grid
    solution of the same ODE than DDIM at N steps."""
    fine = _synth_tables(256)
    coarse = _synth_tables(8)

    def unet(x, t, ctx, cf):
        return jnp.tanh(x) * 0.8

    x = jnp.asarray(np.random.RandomState(2).randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 2, 1, 8))
    ref = np.asarray(ddim_sample_loop(unet, x, fine, ctx))
    ddim_c = np.asarray(ddim_sample_loop(unet, x, coarse, ctx))
    dpm_c = np.asarray(dpm_solver_sample_loop(unet, x, coarse, ctx, order=2))
    err_ddim = np.abs(ddim_c - ref).mean()
    err_dpm = np.abs(dpm_c - ref).mean()
    # second order: materially tighter, not a rounding fluke
    assert err_dpm < 0.5 * err_ddim, (err_dpm, err_ddim)


def test_cfg_and_cond_frames_shared_mechanics():
    """CFG batching and x0_emb concat/slice flow through make_eps_fn exactly
    as in DDIM: with guidance_scale=1 CFG must be inert, and cond frames
    must be visible to the model but absent from the output."""
    tables = make_tables(4)
    seen = []

    def unet(x, t, ctx, cf):
        seen.append((x.shape, ctx.shape))
        m = jnp.tanh(ctx.mean(axis=(1, 2, 3)))
        return x * m[:, None, None, None, None]

    x = jnp.asarray(np.random.RandomState(3).randn(2, 3, 4, 4, 4), jnp.float32)
    x0_emb = jnp.ones((2, 2, 4, 4, 4))
    cond = jnp.asarray(np.random.RandomState(4).randn(2, 5, 7, 8), jnp.float32)
    uncond = jnp.zeros((2, 5, 7, 8))
    out = dpm_solver_sample_loop(
        unet, x, tables, cond, x0_emb=x0_emb, uncond_context=uncond,
        guidance_scale=7.5, order=2)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # batched CFG: batch doubled, 5 frames = 2 cond + 3 future
    assert seen[0] == ((4, 5, 4, 4, 4), (4, 5, 7, 8))


@pytest.mark.slow
def test_pipeline_sampler_knob():
    """`sampler="dpm++"` flows through SeerPipeline and produces latents of
    the right shape, distinct from DDIM's but with comparable scale."""
    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.unet3d import SeerUNetConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.pipelines.text_video import SeerModels, SeerPipeline

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
    x_T = jnp.asarray(np.random.RandomState(0).randn(1, 3, 8, 8, 4), jnp.float32)
    x0 = jnp.zeros((1, 1, 8, 8, 4))
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 4, 16, 32), jnp.float32)
    dpm = pipe.sample_latents(x_T, x0, ctx, ddim_steps=4, guidance_scale=1.0,
                              sampler="dpm++")
    ddim = pipe.sample_latents(x_T, x0, ctx, ddim_steps=4, guidance_scale=1.0,
                               sampler="ddim")
    assert dpm.shape == x_T.shape
    assert np.isfinite(np.asarray(dpm)).all()
    # different discretizations of the same ODE: close but not identical
    assert not np.allclose(np.asarray(dpm), np.asarray(ddim))
    assert np.abs(np.asarray(dpm) - np.asarray(ddim)).mean() < 1.0


def test_sampler_config_validation(tmp_path):
    import pytest
    import yaml

    from seervideoldm_tpu.config import load_config

    def write(**kw):
        p = tmp_path / "c.yaml"
        p.write_text(yaml.dump({"output_dir": "/tmp/x", **kw}))
        return str(p)

    assert load_config(write(sampler="dpm++")).sampler == "dpm++"
    assert load_config(write()).sampler == "ddim"
    with pytest.raises(ValueError, match="sampler"):
        load_config(write(sampler="euler"))


def test_lower_order_final_guards_terminal_jump():
    """The reference grid ends with a disproportionately large log-SNR jump;
    the 2M correction extrapolates across it unless the terminal step drops
    to first order (lower_order_final, on by default)."""
    from seervideoldm_tpu.diffusion.schedules import DDIMTables

    def lam_of(a):
        return 0.5 * np.log(a / (1 - a))

    def tables_from_lams(lams):
        a = 1.0 / (1.0 + np.exp(-2.0 * np.asarray(lams)))
        return DDIMTables(
            timesteps=np.linspace(900, 1, len(lams) - 1).astype(np.int64),
            alphas=a[:-1], alphas_prev=a[1:],
            sigmas=np.zeros(len(lams) - 1),
            sqrt_one_minus_alphas=np.sqrt(1.0 - a[:-1]),
        )

    # coarse: 8 uniform steps then one ~6x-larger terminal jump
    coarse_lams = np.append(np.linspace(lam_of(0.02), lam_of(0.9), 9),
                            lam_of(0.999))
    fine = tables_from_lams(np.linspace(lam_of(0.02), lam_of(0.999), 257))
    coarse = tables_from_lams(coarse_lams)

    def unet(x, t, ctx, cf):
        # high-frequency term mimics imperfect real predictions — on a
        # perfectly smooth oracle the unguarded 2M extrapolation would
        # actually win; the guard exists for the jittery real world
        return jnp.tanh(x) * 0.8 + 0.05 * jnp.sin(50 * x)

    x = jnp.asarray(np.random.RandomState(5).randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 2, 1, 8))
    ref = np.asarray(ddim_sample_loop(unet, x, fine, ctx))
    guarded = np.asarray(dpm_solver_sample_loop(
        unet, x, coarse, ctx, order=2, lower_order_final=True))
    unguarded = np.asarray(dpm_solver_sample_loop(
        unet, x, coarse, ctx, order=2, lower_order_final=False))
    err_g = np.abs(guarded - ref).mean()
    err_u = np.abs(unguarded - ref).mean()
    assert err_g < err_u, (err_g, err_u)

    # and the guard is exactly "first order on the terminal step": running
    # 2M over all-but-last then one order-1 step reproduces it
    head = DDIMTables(
        timesteps=coarse.timesteps[:-1], alphas=coarse.alphas[:-1],
        alphas_prev=coarse.alphas_prev[:-1], sigmas=coarse.sigmas[:-1],
        sqrt_one_minus_alphas=coarse.sqrt_one_minus_alphas[:-1])
    tail = DDIMTables(
        timesteps=coarse.timesteps[-1:], alphas=coarse.alphas[-1:],
        alphas_prev=coarse.alphas_prev[-1:], sigmas=coarse.sigmas[-1:],
        sqrt_one_minus_alphas=coarse.sqrt_one_minus_alphas[-1:])
    mid = dpm_solver_sample_loop(unet, x, head, ctx, order=2,
                                 lower_order_final=False)
    want = np.asarray(dpm_solver_sample_loop(unet, mid, tail, ctx, order=1))
    np.testing.assert_allclose(guarded, want, rtol=1e-5, atol=1e-6)


def test_degenerate_grid_step_stays_finite():
    """A grid containing a repeated ᾱ (h = 0 — e.g. quad discretization
    whose leading points collide after int-cast): the 2M correction must
    drop to first order on and after the degenerate step instead of
    dividing by zero and poisoning the latents with NaN.  DDIM handles the
    same grid without NaN, so the fast sampler must too."""
    from seervideoldm_tpu.diffusion.schedules import DDIMTables

    base = DiffusionSchedule.create(1000).ddim_tables(5, eta=0.0)
    dup = lambda arr: np.concatenate([arr[:1], arr])  # duplicate step 0
    tables = DDIMTables(
        timesteps=dup(np.asarray(base.timesteps)),
        alphas=dup(np.asarray(base.alphas)),
        # first transition: alphas[0] -> alphas[0] (h = 0)
        alphas_prev=np.concatenate([np.asarray(base.alphas[:1]),
                                    np.asarray(base.alphas_prev)]),
        sigmas=dup(np.asarray(base.sigmas)),
        sqrt_one_minus_alphas=dup(np.asarray(base.sqrt_one_minus_alphas)),
    )

    def unet(x, t, ctx, cf):
        return jnp.tanh(x) * 0.5

    x = jnp.asarray(np.random.RandomState(6).randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 2, 1, 8))
    out = np.asarray(dpm_solver_sample_loop(unet, x, tables, ctx, order=2))
    assert np.isfinite(out).all()
    ddim_out = np.asarray(ddim_sample_loop(unet, x, tables, ctx))
    assert np.isfinite(ddim_out).all()


def test_dpm_v_prediction_matches_epsilon():
    """Same v<->eps equivalence through the DPM-Solver++ data-prediction
    path (order 2)."""
    from seervideoldm_tpu.diffusion.dpm_solver import dpm_solver_sample_loop
    from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule

    tables = DiffusionSchedule.create(1000).ddim_tables(6)
    eps_const = -0.21
    ts_tab = jnp.asarray(tables.timesteps, jnp.float32)
    a_tab = jnp.asarray(tables.alphas)

    def eps_unet(x, t, ctx, cf):
        return jnp.full_like(x, eps_const)

    def v_unet(x, t, ctx, cf):
        a = jnp.sum(jnp.where(ts_tab == t[0].astype(jnp.float32), a_tab, 0.0))
        x0 = (x - jnp.sqrt(1.0 - a) * eps_const) / jnp.sqrt(a)
        return jnp.sqrt(a) * eps_const - jnp.sqrt(1.0 - a) * x0

    x = jnp.asarray(np.random.RandomState(1).randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 2, 1, 8))
    want = np.asarray(dpm_solver_sample_loop(eps_unet, x, tables, ctx))
    got = np.asarray(dpm_solver_sample_loop(v_unet, x, tables, ctx,
                                            prediction_type="v_prediction"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
