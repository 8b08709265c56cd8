"""DDIM scan-loop semantics with mock UNets: update formula, x0_emb
re-concat + slice, CFG batching/order, eta-noise path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop
from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule



pytestmark = pytest.mark.critical

def make_tables(steps=5):
    return DiffusionSchedule.create(1000).ddim_tables(steps)


def test_single_step_matches_closed_form():
    tables = make_tables(1)
    eps_val = 0.37

    def unet(x, t, ctx, cf):
        return jnp.full_like(x, eps_val)

    x = jnp.ones((1, 2, 4, 4, 4)) * 2.0
    ctx = jnp.zeros((1, 2, 1, 8))
    out = np.asarray(ddim_sample_loop(unet, x, tables, ctx))
    a_t = tables.alphas[0]
    a_prev = tables.alphas_prev[0]
    sqrt_1m = tables.sqrt_one_minus_alphas[0]
    pred_x0 = (2.0 - sqrt_1m * eps_val) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * eps_val
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_x0_emb_concat_and_slice():
    """UNet sees cond+future frames; only future frames are denoised."""
    tables = make_tables(2)
    seen_frames = []

    def unet(x, t, ctx, cf):
        seen_frames.append(x.shape[1])
        # eps = per-frame index so the slice offset is observable
        idx = jnp.arange(x.shape[1], dtype=x.dtype).reshape(1, -1, 1, 1, 1)
        return jnp.broadcast_to(idx, x.shape)

    x0_emb = jnp.zeros((1, 2, 4, 4, 4))
    x = jnp.zeros((1, 3, 4, 4, 4))
    ctx = jnp.zeros((1, 5, 1, 8))
    out = ddim_sample_loop(unet, x, tables, ctx, x0_emb=x0_emb)
    assert out.shape == (1, 3, 4, 4, 4)
    assert seen_frames[0] == 5  # 2 cond + 3 future
    # future-frame eps values are 2, 3, 4 (cond frames sliced off)
    out = np.asarray(out)
    assert not np.allclose(out[0, 0], out[0, 1])


def test_cfg_batching_order_and_formula():
    """[uncond; cond] order and e = e_u + s*(e_c - e_u)."""
    tables = make_tables(1)
    scale = 3.0

    def unet(x, t, ctx, cf):
        # context value distinguishes the halves: eps = mean(ctx)
        val = ctx.mean(axis=(1, 2, 3)).reshape(-1, 1, 1, 1, 1)
        return jnp.broadcast_to(val, x.shape).astype(x.dtype)

    x = jnp.zeros((1, 2, 4, 4, 4))
    cond_ctx = jnp.full((1, 2, 1, 8), 1.0)
    uncond_ctx = jnp.full((1, 2, 1, 8), 0.25)
    out_cfg = np.asarray(ddim_sample_loop(
        unet, x, tables, cond_ctx, uncond_context=uncond_ctx, guidance_scale=scale
    ))
    e_t = 0.25 + scale * (1.0 - 0.25)
    a_t = tables.alphas[0]
    a_prev = tables.alphas_prev[0]
    sqrt_1m = tables.sqrt_one_minus_alphas[0]
    pred_x0 = (0.0 - sqrt_1m * e_t) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * e_t
    np.testing.assert_allclose(out_cfg, want, rtol=1e-5)


def test_timesteps_fed_high_to_low():
    tables = make_tables(4)
    seen = []

    def unet(x, t, ctx, cf):
        seen.append(int(t[0]) if hasattr(t, "__getitem__") else int(t))
        return jnp.zeros_like(x)

    # trace-time check: run non-jitted over numpy tables via python loop
    x = jnp.zeros((1, 1, 2, 2, 4))
    ctx = jnp.zeros((1, 1, 1, 8))
    # lax.scan traces once; instead verify the table ordering directly
    assert list(tables.timesteps) == sorted(tables.timesteps, reverse=True)
    assert tables.timesteps[-1] == 1


def test_eta_noise_changes_output_deterministically():
    sched = DiffusionSchedule.create(1000)
    tables = sched.ddim_tables(2, eta=1.0)

    def unet(x, t, ctx, cf):
        return jnp.zeros_like(x)

    x = jnp.ones((1, 1, 2, 2, 4))
    ctx = jnp.zeros((1, 1, 1, 8))
    o1 = np.asarray(ddim_sample_loop(unet, x, tables, ctx,
                                     eta_noise_key=jax.random.PRNGKey(0)))
    o2 = np.asarray(ddim_sample_loop(unet, x, tables, ctx,
                                     eta_noise_key=jax.random.PRNGKey(0)))
    o3 = np.asarray(ddim_sample_loop(unet, x, tables, ctx,
                                     eta_noise_key=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(o1, o2)
    assert not np.allclose(o1, o3)


def test_unequal_context_cfg_two_call_branch():
    """Unequal uncond/cond context shapes take the reference's two-call CFG
    branch (ddim_video.py:200-207).  A context stub invariant to token
    duplication makes the two-call result comparable to the batched path:
    doubling the uncond tokens must not change the sample."""
    tables = make_tables(2)
    calls = []

    def unet(x, t, ctx, cf):
        calls.append((x.shape[0], ctx.shape))
        # eps depends on the context only through its per-sample token-mean
        m = jnp.tanh(ctx.mean(axis=(1, 2, 3)))
        return x * m[:, None, None, None, None]

    x = jnp.ones((2, 3, 4, 4, 4)) * 0.5
    x0_emb = jnp.ones((2, 1, 4, 4, 4))
    cond = jnp.linspace(-1.0, 1.0, 2 * 4 * 7 * 8).reshape(2, 4, 7, 8)
    uncond = jnp.full((2, 4, 7, 8), 0.25)

    want = np.asarray(ddim_sample_loop(
        unet, x, tables, cond, x0_emb=x0_emb, uncond_context=uncond,
        guidance_scale=7.5))
    assert all(b == 4 for b, _ in calls)  # batched [uncond; cond]
    calls.clear()

    uncond2 = jnp.concatenate([uncond, uncond], axis=2)  # 14 tokens
    got = np.asarray(ddim_sample_loop(
        unet, x, tables, cond, x0_emb=x0_emb, uncond_context=uncond2,
        guidance_scale=7.5))
    # two separate calls per step, with the two distinct context shapes
    assert all(b == 2 for b, _ in calls)
    assert {shp for _, shp in calls} == {(2, 4, 14, 8), (2, 4, 7, 8)}
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_guidance_interval_full_window_equals_plain_cfg():
    """(0, 1000) covers every timestep -> bitwise-equal to plain CFG."""
    tables = make_tables(4)

    def unet(x, t, ctx, cf):
        m = jnp.tanh(ctx.mean(axis=(1, 2, 3)))
        return x * m[:, None, None, None, None]

    x = jnp.ones((2, 3, 4, 4, 4)) * 0.5
    cond = jnp.linspace(-1.0, 1.0, 2 * 3 * 7 * 8).reshape(2, 3, 7, 8)
    uncond = jnp.full((2, 3, 7, 8), 0.25)
    plain = np.asarray(ddim_sample_loop(
        unet, x, tables, cond, uncond_context=uncond, guidance_scale=7.5))
    windowed = np.asarray(ddim_sample_loop(
        unet, x, tables, cond, uncond_context=uncond, guidance_scale=7.5,
        guidance_interval=(0.0, 1000.0)))
    np.testing.assert_array_equal(windowed, plain)


def test_guidance_interval_empty_window_equals_no_cfg():
    """A window below every timestep -> every step is the single cond call."""
    tables = make_tables(4)
    batch_sizes = []

    def unet(x, t, ctx, cf):
        batch_sizes.append(x.shape[0])
        m = jnp.tanh(ctx.mean(axis=(1, 2, 3)))
        return x * m[:, None, None, None, None]

    x = jnp.ones((2, 3, 4, 4, 4)) * 0.5
    cond = jnp.linspace(-1.0, 1.0, 2 * 3 * 7 * 8).reshape(2, 3, 7, 8)
    uncond = jnp.full((2, 3, 7, 8), 0.25)
    no_cfg = np.asarray(ddim_sample_loop(unet, x, tables, cond))
    got = np.asarray(ddim_sample_loop(
        unet, x, tables, cond, uncond_context=uncond, guidance_scale=7.5,
        guidance_interval=(-2.0, -1.0)))
    np.testing.assert_allclose(got, no_cfg, rtol=1e-6)


def test_guidance_interval_partial_window_mixes_paths():
    """CFG inside the window, single-call outside: differs from both
    extremes, and the per-step branch follows the timestep."""
    tables = make_tables(4)

    def unet(x, t, ctx, cf):
        m = jnp.tanh(ctx.mean(axis=(1, 2, 3)))
        return x * m[:, None, None, None, None]

    x = jnp.ones((2, 3, 4, 4, 4)) * 0.5
    cond = jnp.linspace(-1.0, 1.0, 2 * 3 * 7 * 8).reshape(2, 3, 7, 8)
    uncond = jnp.full((2, 3, 7, 8), 0.25)
    ts = np.asarray(tables.timesteps)  # reverse-ordered (high first)
    mid = float(ts[len(ts) // 2])
    kw = dict(uncond_context=uncond, guidance_scale=7.5)
    plain = np.asarray(ddim_sample_loop(unet, x, tables, cond, **kw))
    no_cfg = np.asarray(ddim_sample_loop(unet, x, tables, cond))
    part = np.asarray(ddim_sample_loop(
        unet, x, tables, cond, guidance_interval=(0.0, mid), **kw))
    assert not np.allclose(part, plain)
    assert not np.allclose(part, no_cfg)

    # manual reference: run plain CFG but replace eps with the single-call
    # eps for steps whose t is outside the window
    from seervideoldm_tpu.diffusion.ddim import make_eps_fn

    eps_cfg = make_eps_fn(unet, cond, None, uncond, 7.5, 0)
    eps_one = make_eps_fn(unet, cond, None, None, 1.0, 0)
    img = x
    for i, t in enumerate(ts):
        e = eps_cfg(img, jnp.asarray(t)) if t <= mid else eps_one(
            img, jnp.asarray(t))
        a_t, a_prev = tables.alphas[i], tables.alphas_prev[i]
        sqrt_1m = tables.sqrt_one_minus_alphas[i]
        img32 = img.astype(jnp.float32)
        pred_x0 = (img32 - sqrt_1m * e) / jnp.sqrt(a_t)
        img = (jnp.sqrt(a_prev) * pred_x0
               + jnp.sqrt(1.0 - a_prev) * e).astype(img.dtype)
    np.testing.assert_allclose(part, np.asarray(img), rtol=1e-5, atol=1e-6)


def test_v_prediction_sampling_matches_epsilon():
    """A v-model derived from a known eps-model must sample identically
    under prediction_type='v_prediction' (the exact v<->eps affine map)."""
    import pytest

    tables = make_tables(4)
    eps_const = 0.37
    ts_tab = jnp.asarray(tables.timesteps, jnp.float32)
    a_tab = jnp.asarray(tables.alphas)

    def eps_unet(x, t, ctx, cf):
        return jnp.full_like(x, eps_const)

    def v_unet(x, t, ctx, cf):
        a = jnp.sum(jnp.where(ts_tab == t[0].astype(jnp.float32), a_tab, 0.0))
        x0 = (x - jnp.sqrt(1.0 - a) * eps_const) / jnp.sqrt(a)
        return jnp.sqrt(a) * eps_const - jnp.sqrt(1.0 - a) * x0

    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((1, 2, 1, 8))
    want = np.asarray(ddim_sample_loop(eps_unet, x, tables, ctx))
    got = np.asarray(ddim_sample_loop(v_unet, x, tables, ctx,
                                      prediction_type="v_prediction"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="prediction type"):
        ddim_sample_loop(eps_unet, x, tables, ctx, prediction_type="sample")
