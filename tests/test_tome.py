"""Token Merging (ToMeSD, ops/tome.py) — matching/merge/unmerge semantics,
block integration, and config plumbing."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seervideoldm_tpu.ops.tome import _dst_src_indices, bipartite_soft_matching_2d


def test_dst_src_partition_is_exact():
    h, w, sd = 8, 8, 2
    dst, src = _dst_src_indices(h, w, sd)
    assert len(dst) == (h // sd) * (w // sd)
    assert len(dst) + len(src) == h * w
    # disjoint, complete, one dst per sd x sd cell
    assert set(dst) | set(src) == set(range(h * w))
    cells = set()
    for t in dst:
        cell = (t // w // sd, t % w // sd)
        assert cell not in cells
        cells.add(cell)
    # deterministic: the partition is a compile-time constant
    dst2, _ = _dst_src_indices(h, w, sd)
    np.testing.assert_array_equal(dst, dst2)
    # regression: production latent grids (h=64 overflowed the 32-bit
    # RandomState seed) must build
    for hw in (64, 32, 16):
        d, s = _dst_src_indices(hw, hw, 2)
        assert len(d) + len(s) == hw * hw


@pytest.mark.slow
def test_merge_shapes_and_r_cap():
    b, h, w, c = 2, 8, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h * w, c))
    r = 20
    merge, unmerge = bipartite_soft_matching_2d(x, h, w, r)
    y = merge(x)
    assert y.shape == (b, h * w - r, c)
    assert unmerge(y).shape == (b, h * w, c)
    # r capped to the src-set size (48 here), not an error
    merge, _ = bipartite_soft_matching_2d(x, h, w, 1000)
    assert merge(x).shape == (b, (h * w) // 4, c)
    # r == 0 -> disabled
    assert bipartite_soft_matching_2d(x, h, w, 0) == (None, None)


@pytest.mark.slow
def test_merge_averages_and_unmerge_scatters():
    """A src token identical to a dst token merges into it (mean), and after
    unmerge the merged position carries its dst row."""
    b, h, w, c = 1, 4, 4, 8
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (b, h * w, c))
    dst, src = _dst_src_indices(h, w, 2)
    # make src token src[0] exactly equal to dst token dst[1]: cosine sim 1,
    # strictly the best match by construction (others are random)
    x = x.at[0, src[0]].set(x[0, dst[1]])
    merge, unmerge = bipartite_soft_matching_2d(x, h, w, 1)
    y = merge(x)
    n_unm = len(src) - 1
    # the merged dst slot holds the mean of the two identical rows = the row
    merged_dst_rows = y[0, n_unm:]
    np.testing.assert_allclose(
        np.asarray(merged_dst_rows[1]), np.asarray(x[0, dst[1]]), rtol=1e-5
    )
    out = unmerge(y)
    # merged src position receives its dst row; dst positions receive dst rows
    np.testing.assert_allclose(
        np.asarray(out[0, src[0]]), np.asarray(merged_dst_rows[1]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[0, dst]), np.asarray(merged_dst_rows), rtol=1e-5
    )
    # every unmerged src position receives its own merged-set row
    kept = [int(t) for t in src[1:]]
    for t in kept:
        assert np.isfinite(np.asarray(out[0, t])).all()
    # unmerge covers all positions (no zeros left from the init)
    assert not np.any(np.all(np.asarray(out[0]) == 0.0, axis=-1))


def test_identical_tokens_attention_is_lossless():
    """When all tokens are identical, merged attention == full attention:
    softmax over fewer identical keys returns the same weighted value."""
    from seervideoldm_tpu.ops.attention import dot_product_attention

    b, h, w, c, heads = 2, 8, 8, 32, 4
    d = c // heads
    token = jax.random.normal(jax.random.PRNGKey(2), (b, 1, c))
    x = jnp.broadcast_to(token, (b, h * w, c))

    def attn(tokens):
        n = tokens.shape[1]
        q = tokens.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
        out = dot_product_attention(q, q, q, scale=d**-0.5, use_flash=False)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)

    merge, unmerge = bipartite_soft_matching_2d(x, h, w, 32)
    full = attn(x)
    merged = unmerge(attn(merge(x)))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


def test_block_parity_when_off_and_runs_when_on():
    """tome_ratio=0 is bitwise-identical to the baseline block; ratio>0 runs
    under jit with finite output and the same shape."""
    from seervideoldm_tpu.models.transformer3d import BasicTextTransformerBlock3D

    b, f, h, w, c = 1, 2, 8, 8, 32
    x = jax.random.normal(jax.random.PRNGKey(3), (b, f, h, w, c))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (b, f, 7, 16))
    kw = dict(dim=c, n_heads=4, d_head=8, context_dim=16)
    base = BasicTextTransformerBlock3D(**kw)
    params = base.init(jax.random.PRNGKey(5), x, ctx)
    off = BasicTextTransformerBlock3D(**kw, tome_ratio=0.0)
    np.testing.assert_array_equal(
        np.asarray(base.apply(params, x, ctx)),
        np.asarray(off.apply(params, x, ctx)),
    )
    on = BasicTextTransformerBlock3D(**kw, tome_ratio=0.5, tome_min_tokens=16)
    out = jax.jit(lambda p, a, b_: on.apply(p, a, b_))(params, x, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # and it actually changed the computation
    assert not np.allclose(np.asarray(out), np.asarray(base.apply(params, x, ctx)))


def test_min_tokens_gate():
    """Blocks below tome_min_tokens are untouched even with ratio > 0."""
    from seervideoldm_tpu.models.transformer3d import BasicTextTransformerBlock3D

    b, f, h, w, c = 1, 2, 4, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(6), (b, f, h, w, c))
    kw = dict(dim=c, n_heads=4, d_head=8)
    base = BasicTextTransformerBlock3D(**kw)
    params = base.init(jax.random.PRNGKey(7), x)
    gated = BasicTextTransformerBlock3D(**kw, tome_ratio=0.5, tome_min_tokens=64)
    np.testing.assert_array_equal(
        np.asarray(base.apply(params, x)), np.asarray(gated.apply(params, x))
    )


@pytest.mark.slow
def test_unet_tome_smoke_and_gradients():
    """Tiny SeerUNet with ToMe on: forward matches shape, is finite, and the
    merge indices don't break autodiff."""
    from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig

    cfg = SeerUNetConfig(block_out_channels=(16, 32), layers_per_block=1,
                         norm_num_groups=8, cross_attention_dim=16,
                         attention_head_dim=4, tome_ratio=0.5,
                         tome_min_tokens=32)
    unet = SeerUNet(config=cfg)
    b, f, s = 1, 2, 8
    x = jax.random.normal(jax.random.PRNGKey(8), (b, f, s, s, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(9), (b, f, 7, 16))
    ts = jnp.array([3], jnp.int32)
    params = unet.init(jax.random.PRNGKey(10), x, ts, ctx, 0)["params"]
    out = unet.apply({"params": params}, x, ts, ctx, 0)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return (unet.apply({"params": p}, x, ts, ctx, 0) ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    assert any(np.abs(np.asarray(leaf)).sum() > 0 for leaf in leaves)


def test_config_knob_plumbing():
    from seervideoldm_tpu.config import Config, validate

    cfg = Config()
    cfg.tome_ratio = 0.5
    validate(cfg)  # ok
    cfg.tome_ratio = 1.0
    with pytest.raises(ValueError, match="tome_ratio"):
        validate(cfg)
    cfg.tome_ratio = -0.1
    with pytest.raises(ValueError, match="tome_ratio"):
        validate(cfg)
    cfg.tome_ratio = 0.3
    cfg.tome_min_tokens = 2
    with pytest.raises(ValueError, match="tome_min_tokens"):
        validate(cfg)


@pytest.mark.slow
def test_load_models_injects_tome(tmp_path):
    """load_models threads the YAML tome knobs into the UNet config."""
    from seervideoldm_tpu.config import Config
    from seervideoldm_tpu.pipelines.loading import load_models

    cfg = Config()
    cfg.tome_ratio = 0.25
    cfg.tome_min_tokens = 256
    cfg.model_overrides = {
        "unet": dict(block_out_channels=[8, 16], layers_per_block=1,
                     norm_num_groups=4, cross_attention_dim=8,
                     attention_head_dim=2),
        "vae": dict(block_out_channels=[8, 8], layers_per_block=1,
                    norm_num_groups=4),
        "clip": dict(hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                     num_attention_heads=2),
        "fstext": dict(n_heads=2, num_layers=1),
    }
    cfg.resolution = 32
    cfg.num_frames = 2
    models, _ = load_models(cfg, jax.random.PRNGKey(0))
    assert models.unet.config.tome_ratio == 0.25
    assert models.unet.config.tome_min_tokens == 256

    # an EXPLICIT tome_ratio: 0.0 in model_overrides.unet disables injection
    # (presence in the override dict wins, not the resolved value)
    cfg.model_overrides["unet"]["tome_ratio"] = 0.0
    models, _ = load_models(cfg, jax.random.PRNGKey(0))
    assert models.unet.config.tome_ratio == 0.0

    # a non-zero override keeps ITS OWN min_tokens, not the top-level knob
    cfg.model_overrides["unet"]["tome_ratio"] = 0.5
    cfg.model_overrides["unet"]["tome_min_tokens"] = 64
    models, _ = load_models(cfg, jax.random.PRNGKey(0))
    assert models.unet.config.tome_ratio == 0.5
    assert models.unet.config.tome_min_tokens == 64
