"""Pyramid Attention Broadcast (diffusion/pab.py) — schedule, cache
semantics, sampler integration, and config validation.

PAB is beyond-reference (arXiv 2408.12588, PAPERS.md); correctness contract:
ranges == 1 must be bitwise identical to plain sampling, and the scan/switch
integration must match an eager per-step simulation of the same schedule.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop, make_eps_fn
from seervideoldm_tpu.diffusion.dpm_solver import dpm_solver_sample_loop
from seervideoldm_tpu.diffusion.pab import (
    COMPUTE_ALL,
    PABConfig,
    build_pab_schedule,
    mode_to_flags,
)
from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule
from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig

# ---------------------------------------------------------------- schedule


def test_schedule_ranges_one_is_all_compute():
    modes, idx = build_pab_schedule(
        10, PABConfig(spatial_range=1, cross_range=1, temporal_range=1)
    )
    assert modes == (COMPUTE_ALL,)
    assert np.all(idx == 0)


def test_schedule_window_and_modulo():
    cfg = PABConfig(spatial_range=2, cross_range=6, temporal_range=4,
                    window=(0.1, 0.9))
    S = 50
    modes, idx = build_pab_schedule(S, cfg)
    assert modes[0] == COMPUTE_ALL
    w_lo, w_hi = 5, 45
    for i in range(S):
        s_cached, c_cached, t_cached = modes[idx[i]]
        if i == 0 or not (w_lo <= i < w_hi):
            assert (s_cached, c_cached, t_cached) == COMPUTE_ALL, i
        else:
            assert s_cached == ((i - w_lo) % 2 != 0), i
            assert c_cached == ((i - w_lo) % 6 != 0), i
            assert t_cached == ((i - w_lo) % 4 != 0), i
    # any cached flag must be preceded by a compute of that type
    last_compute = [-1, -1, -1]
    for i in range(S):
        flags = modes[idx[i]]
        for k in range(3):
            if flags[k]:
                assert last_compute[k] >= 0, (i, k)
            else:
                last_compute[k] = i


def test_schedule_validation():
    with pytest.raises(ValueError):
        PABConfig(spatial_range=0)
    with pytest.raises(ValueError):
        PABConfig(window=(0.9, 0.1))
    with pytest.raises(ValueError):
        build_pab_schedule(0, PABConfig())


def test_config_enabled_property():
    assert not PABConfig(spatial_range=1, cross_range=1, temporal_range=1).enabled
    assert PABConfig().enabled


# ------------------------------------------------------------ tiny fixture

TINY = SeerUNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                      norm_num_groups=4, cross_attention_dim=16,
                      attention_head_dim=2)
B, F1, F2, S_LAT, L_TOK = 1, 1, 3, 8, 5
F_TOT = F1 + F2


def _randomize_proj_out(params, scale=0.05):
    """The zero-initialized proj_out annihilates attention deltas at random
    init; give it weights so PAB's cached deltas reach the output."""
    key = [jax.random.PRNGKey(7)]

    def walk(p, path=""):
        if isinstance(p, dict):
            return {k: walk(v, path + "/" + k) for k, v in p.items()}
        if "proj_out" in path:
            key[0], sub = jax.random.split(key[0])
            return jax.random.normal(sub, p.shape, p.dtype) * scale
        return p

    return walk(params)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = SeerUNet(config=TINY, dtype=jnp.float32)
    params = unet.init(
        jax.random.PRNGKey(2),
        jnp.zeros((2 * B, F_TOT, S_LAT, S_LAT, 4)),
        jnp.zeros((2 * B,), jnp.int32),
        jnp.zeros((2 * B, F_TOT, L_TOK, 16)), 0,
    )["params"]
    return unet, _randomize_proj_out(params)


def _apply_fns(unet, params):
    def unet_apply(x, t, ctx, cf):
        return unet.apply({"params": params}, x, t, ctx, cf)

    def pab_apply(x, t, ctx, cf, st, flags):
        out, mut = unet.apply({"params": params, "pab": st}, x, t, ctx, cf,
                              pab=flags, mutable=["pab"])
        return out, mut["pab"]

    return unet_apply, pab_apply


def _inputs():
    x_T = jax.random.normal(jax.random.PRNGKey(0), (B, F2, S_LAT, S_LAT, 4))
    x0_emb = jax.random.normal(jax.random.PRNGKey(3), (B, F1, S_LAT, S_LAT, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, F_TOT, L_TOK, 16))
    uctx = jax.random.normal(jax.random.PRNGKey(4), (B, F_TOT, L_TOK, 16))
    return x_T, x0_emb, ctx, uctx


# ------------------------------------------------------- cache semantics


@pytest.mark.slow
def test_cache_write_and_reuse_semantics(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(0), (B, F_TOT, S_LAT, S_LAT, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, F_TOT, L_TOK, 16))

    y0 = unet.apply({"params": params}, x, t, ctx, 0)
    y1, mut = unet.apply({"params": params, "pab": {}}, x, t, ctx, 0,
                         pab=mode_to_flags(COMPUTE_ALL), mutable=["pab"])
    # all-compute PAB mode == plain forward, bitwise
    assert jnp.all(y0 == y1)
    st = mut["pab"]
    # TINY has 2 cross-attn levels x 1 layer x (down+up(2 layers)+mid):
    # text blocks contribute attn1+attn2 deltas, temporal blocks attn1
    assert len(jax.tree_util.tree_leaves(st)) > 0

    x2 = x + 0.1
    cached = {"spatial": True, "cross": True, "temporal": True}
    y2, mut2 = unet.apply({"params": params, "pab": st}, x2, t, ctx, 0,
                          pab=cached, mutable=["pab"])
    y2c, mut2c = unet.apply({"params": params, "pab": st}, x2, t, ctx, 0,
                            pab=mode_to_flags(COMPUTE_ALL), mutable=["pab"])
    # stale deltas on a different input produce a different output ...
    assert jnp.any(y2 != y2c)
    # ... the all-cached pass leaves the cache untouched ...
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        mut2["pab"], st)
    # ... and the compute pass rewrites every entry (different input)
    assert all(
        bool(jnp.any(a != b))
        for a, b in zip(jax.tree_util.tree_leaves(mut2c["pab"]),
                        jax.tree_util.tree_leaves(st))
    )


@pytest.mark.slow
def test_pab_with_remat_raises(tiny_unet):
    _, params = tiny_unet
    unet = SeerUNet(config=TINY, dtype=jnp.float32, remat=True)
    x = jnp.zeros((B, F_TOT, S_LAT, S_LAT, 4))
    with pytest.raises(ValueError, match="remat"):
        unet.apply({"params": params, "pab": {}}, x, jnp.zeros((B,), jnp.int32),
                   jnp.zeros((B, F_TOT, L_TOK, 16)), 0,
                   pab=mode_to_flags(COMPUTE_ALL), mutable=["pab"])


# -------------------------------------------------- sampler integration


@pytest.mark.slow
def test_ddim_pab_ranges_one_bitwise(tiny_unet):
    unet, params = tiny_unet
    unet_apply, pab_apply = _apply_fns(unet, params)
    x_T, x0_emb, ctx, uctx = _inputs()
    tables = DiffusionSchedule.create(100).ddim_tables(6, eta=0.0)
    base = ddim_sample_loop(unet_apply, x_T, tables, ctx, x0_emb=x0_emb,
                            uncond_context=uctx, guidance_scale=3.0)
    modes, idx = build_pab_schedule(
        len(tables.timesteps),
        PABConfig(spatial_range=1, cross_range=1, temporal_range=1))
    out = ddim_sample_loop(unet_apply, x_T, tables, ctx, x0_emb=x0_emb,
                           uncond_context=uctx, guidance_scale=3.0,
                           pab=(modes, idx, pab_apply))
    assert jnp.all(out == base)


@pytest.mark.slow
def test_dpm_pab_ranges_one_bitwise(tiny_unet):
    unet, params = tiny_unet
    unet_apply, pab_apply = _apply_fns(unet, params)
    x_T, x0_emb, ctx, uctx = _inputs()
    tables = DiffusionSchedule.create(100).ddim_tables(6, eta=0.0)
    base = dpm_solver_sample_loop(unet_apply, x_T, tables, ctx, x0_emb=x0_emb,
                                  uncond_context=uctx, guidance_scale=3.0)
    modes, idx = build_pab_schedule(
        len(tables.timesteps),
        PABConfig(spatial_range=1, cross_range=1, temporal_range=1))
    out = dpm_solver_sample_loop(unet_apply, x_T, tables, ctx, x0_emb=x0_emb,
                                 uncond_context=uctx, guidance_scale=3.0,
                                 pab=(modes, idx, pab_apply))
    assert jnp.all(out == base)


@pytest.mark.slow
def test_ddim_pab_matches_eager_simulation(tiny_unet):
    """The scan + lax.switch integration must reproduce an eager per-step
    loop that maintains the cache in Python and applies the same DDIM
    update — validates xs ordering, switch dispatch, and state threading."""
    unet, params = tiny_unet
    unet_apply, pab_apply = _apply_fns(unet, params)
    x_T, x0_emb, ctx, uctx = _inputs()
    tables = DiffusionSchedule.create(100).ddim_tables(6, eta=0.0)
    S = len(tables.timesteps)  # +1-offset grid: 6 requested -> 7 actual
    cfg = PABConfig(spatial_range=2, cross_range=3, temporal_range=2,
                    window=(0.0, 1.0))
    modes, idx = build_pab_schedule(S, cfg)
    assert len(modes) > 1  # broadcasting actually happens

    out = ddim_sample_loop(unet_apply, x_T, tables, ctx, x0_emb=x0_emb,
                           uncond_context=uctx, guidance_scale=3.0,
                           pab=(modes, idx, pab_apply))

    # eager simulation
    guidance_scale = 3.0
    ctx_in = jnp.concatenate([uctx, ctx], axis=0)
    img = x_T
    st = {}
    for i in range(S):
        t = jnp.asarray(tables.timesteps)[i]
        a_t = jnp.asarray(tables.alphas)[i]
        a_prev = jnp.asarray(tables.alphas_prev)[i]
        sqrt_1m = jnp.asarray(tables.sqrt_one_minus_alphas)[i]
        x_cat = jnp.concatenate([x0_emb, img], axis=1)
        ts = jnp.full((B,), t, dtype=jnp.int32)
        x_in = jnp.concatenate([x_cat, x_cat], axis=0)
        t_in = jnp.concatenate([ts, ts], axis=0)
        e_all, st = pab_apply(x_in, t_in, ctx_in, 0, st, mode_to_flags(modes[idx[i]]))
        e_all = e_all[:, F1:]
        e_uncond, e_cond = jnp.split(e_all, 2, axis=0)
        e_t = (e_uncond + guidance_scale * (e_cond - e_uncond)).astype(jnp.float32)
        img32 = img.astype(jnp.float32)
        pred_x0 = (img32 - sqrt_1m * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e_t
        img = (jnp.sqrt(a_prev) * pred_x0 + dir_xt).astype(img.dtype)

    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pab_rejects_guidance_interval_and_unequal_context(tiny_unet):
    unet, params = tiny_unet
    _, pab_apply = _apply_fns(unet, params)
    x_T, x0_emb, ctx, uctx = _inputs()
    modes, idx = build_pab_schedule(4, PABConfig())
    with pytest.raises(ValueError, match="guidance_interval"):
        make_eps_fn(lambda *a: None, ctx, x0_emb, uctx, 3.0, 0,
                    guidance_interval=(0.0, 500.0), pab=(modes, pab_apply))
    uctx_short = uctx[:, :, :3]  # unequal token count -> two-call CFG path
    with pytest.raises(ValueError, match="batched CFG"):
        make_eps_fn(lambda *a: None, ctx, x0_emb, uctx_short, 3.0, 0,
                    pab=(modes, pab_apply))


@pytest.mark.slow
def test_pab_schedule_length_mismatch_raises(tiny_unet):
    unet, params = tiny_unet
    unet_apply, pab_apply = _apply_fns(unet, params)
    x_T, x0_emb, ctx, uctx = _inputs()
    tables = DiffusionSchedule.create(100).ddim_tables(6, eta=0.0)
    modes, idx = build_pab_schedule(4, PABConfig())  # wrong length
    with pytest.raises(ValueError, match="schedule has 4 steps"):
        ddim_sample_loop(unet_apply, x_T, tables, ctx, x0_emb=x0_emb,
                         uncond_context=uctx, guidance_scale=3.0,
                         pab=(modes, idx, pab_apply))


# ------------------------------------------------------------ config glue


def test_config_pab_knobs():
    from seervideoldm_tpu.config import Config, pab_config_from, validate

    cfg = Config()
    assert pab_config_from(cfg) is None

    cfg = Config(pab=True, pab_spatial_range=3, pab_cross_range=5,
                 pab_temporal_range=4, pab_window=[0.2, 0.8])
    pc = pab_config_from(cfg)
    assert pc == PABConfig(spatial_range=3, cross_range=5, temporal_range=4,
                           window=(0.2, 0.8))
    validate(cfg)

    with pytest.raises(ValueError, match="guidance_interval"):
        validate(Config(pab=True, guidance_interval=[0, 500]))
    with pytest.raises(ValueError, match="pab spatial_range"):
        validate(Config(pab=True, pab_spatial_range=0))
