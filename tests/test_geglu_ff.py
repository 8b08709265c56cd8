"""Fused GEGLU feed-forward kernel (ops/pallas/geglu_ff.py).

CPU runs exercise the kernel via pallas interpret mode and the erf
approximation against the exact erf; the module-level test pins that both
FeedForward paths create the identical parameter tree (checkpoints are
interchangeable) and compute the same function.
"""
import functools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from seervideoldm_tpu.ops.pallas.geglu_ff import (
    _erf_as, _kernel, _reference, geglu_ff, _bwd, _fwd)


def test_erf_approximation_accuracy():
    z = jnp.linspace(-6.0, 6.0, 20001, dtype=jnp.float32)
    exact = jax.lax.erf(z)
    approx = _erf_as(z)
    # A&S 7.1.26 is 1.5e-7 in exact arithmetic; fp32 rounding ~5e-7
    assert float(jnp.max(jnp.abs(exact - approx))) < 1e-6


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype) * 0.5


def _run_kernel_interpret(x, w1, b1, w2, b2, bt=128, ic=128):
    n, c = x.shape
    inner = w2.shape[0]
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h = b1[None, :inner].astype(x.dtype)
    b1g = b1[None, inner:].astype(x.dtype)
    b2r = b2[None, :].astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, inner=inner, ic=ic),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((c, inner), lambda t: (0, 0)),
            pl.BlockSpec((1, inner), lambda t: (0, 0)),
            pl.BlockSpec((inner, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=True,
    )(x, w1h, b1h, w1g, b1g, w2, b2r)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 5e-2)])
def test_kernel_matches_reference_interpret(dtype, tol):
    n, c = 256, 32
    inner = 4 * c
    x = _rand((n, c), 0).astype(dtype)
    w1 = _rand((c, 2 * inner), 1).astype(dtype)
    b1 = _rand((2 * inner,), 2).astype(dtype)
    w2 = _rand((inner, c), 3).astype(dtype)
    b2 = _rand((c,), 4).astype(dtype)
    out = _run_kernel_interpret(x, w1, b1, w2, b2)
    ref = _reference(x, w1, b1, w2, b2)
    ref32 = ref.astype(jnp.float32)
    diff = jnp.max(jnp.abs(out.astype(jnp.float32) - ref32))
    rel = float(diff) / float(jnp.max(jnp.abs(ref32)))
    # bf16: both paths round intermediates at different points; fp32: the
    # in-kernel erf approximation (<=5e-7) amplified by the down-projection
    assert rel < tol, (float(diff), rel)


def test_custom_vjp_matches_autodiff_of_reference():
    n, c = 64, 16
    inner = 4 * c
    args = [_rand((n, c), 0), _rand((c, 2 * inner), 1),
            _rand((2 * inner,), 2), _rand((inner, c), 3), _rand((c,), 4)]

    def loss_fused(*a):
        return jnp.sum(jnp.sin(geglu_ff(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_reference(*a)))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_feedforward_param_tree_identical_and_function_equal(monkeypatch):
    """Force the fused branch on CPU (interpret unavailable on the real
    pallas path, so patch geglu_ff to the XLA reference) and check the two
    branches create the SAME param tree and the same outputs."""
    from seervideoldm_tpu.models import transformer3d as t3d
    from seervideoldm_tpu.ops.pallas import geglu_ff as gmod

    dim = 16
    x = _rand((2, 64, dim), 7, jnp.bfloat16)
    ff = t3d.FeedForward(dim, dtype=jnp.bfloat16)
    params_plain = ff.init(jax.random.PRNGKey(0), x)
    out_plain = ff.apply(params_plain, x)

    monkeypatch.setattr(gmod, "geglu_ff_supported",
                        lambda *a, **k: True)
    # route the fused branch through the exact reference impl: the branch
    # decision + param plumbing is what this test pins (kernel numerics are
    # covered by the interpret tests above).  FeedForward resolves both
    # names from the module at call time, so patching gmod is enough.
    monkeypatch.setattr(gmod, "geglu_ff",
                        lambda x, w1, b1, w2, b2: gmod._reference(
                            x, w1, b1, w2, b2))
    params_fused = ff.init(jax.random.PRNGKey(0), x)
    flat_a = jax.tree_util.tree_flatten_with_path(params_plain)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params_fused)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_fused = ff.apply(params_fused, x)
    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32), np.asarray(out_plain, np.float32),
        rtol=2e-2, atol=2e-2)


def test_supported_gate():
    from seervideoldm_tpu.ops.pallas.geglu_ff import geglu_ff_supported

    # CPU backend -> never
    assert not geglu_ff_supported(512, 320, 1280, jnp.bfloat16)


# ---- fused LN prologue + residual epilogue (ln_geglu_ff) ----

from seervideoldm_tpu.ops.pallas.geglu_ff import (  # noqa: E402
    _kernel_ln, _ln_reference, ln_geglu_ff, _LN_EPS)


def _ln_args(n, c, dtype=jnp.bfloat16):
    inner = 4 * c
    return [_rand((n, c), 10).astype(dtype),
            (1.0 + 0.1 * _rand((c,), 11)).astype(jnp.float32),
            (0.1 * _rand((c,), 12)).astype(jnp.float32),
            _rand((c, 2 * inner), 13).astype(dtype),
            _rand((2 * inner,), 14).astype(dtype),
            _rand((inner, c), 15).astype(dtype),
            _rand((c,), 16).astype(dtype)]


def _run_kernel_ln_interpret(x, gamma, beta, w1, b1, w2, b2, bt=128, ic=128):
    n, c = x.shape
    inner = w2.shape[0]
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h = b1[None, :inner].astype(x.dtype)
    b1g = b1[None, inner:].astype(x.dtype)
    b2r = b2[None, :].astype(x.dtype)
    g32 = gamma[None, :].astype(jnp.float32)
    bt32 = beta[None, :].astype(jnp.float32)
    rep = lambda shp: pl.BlockSpec(shp, lambda t: tuple(0 for _ in shp))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_kernel_ln, inner=inner, ic=ic, eps=_LN_EPS),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
            rep((1, c)), rep((1, c)),
            rep((c, inner)), rep((1, inner)),
            rep((c, inner)), rep((1, inner)),
            rep((inner, c)), rep((1, c)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=True,
    )(x, g32, bt32, w1h, b1h, w1g, b1g, w2, b2r)


@pytest.mark.critical
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 5e-2)])
def test_ln_kernel_matches_reference_interpret(dtype, tol):
    args = _ln_args(256, 32, dtype)
    out = _run_kernel_ln_interpret(*args)
    ref = _ln_reference(*args)
    ref32 = ref.astype(jnp.float32)
    diff = jnp.max(jnp.abs(out.astype(jnp.float32) - ref32))
    rel = float(diff) / float(jnp.max(jnp.abs(ref32)))
    assert rel < tol, (float(diff), rel)


def test_ln_reference_matches_unfused_module_chain():
    """_ln_reference == LayerNorm -> FeedForward(XLA) -> residual, the
    exact chain _ln_ff_residual's fallback path runs."""
    from seervideoldm_tpu.models import transformer3d as t3d
    from seervideoldm_tpu.ops.norms import LayerNorm

    dim = 16
    x = _rand((128, dim), 20, jnp.bfloat16)
    ln = LayerNorm()
    ff = t3d.FeedForward(dim, dtype=jnp.bfloat16)
    pl_ = ln.init(jax.random.PRNGKey(1), x)
    pf = ff.init(jax.random.PRNGKey(2), x)
    want = ff.apply(pf, ln.apply(pl_, x)) + x

    w1 = pf["params"]["net_0"]["proj"]["kernel"].astype(jnp.bfloat16)
    b1 = pf["params"]["net_0"]["proj"]["bias"].astype(jnp.bfloat16)
    w2 = pf["params"]["net_2"]["kernel"].astype(jnp.bfloat16)
    b2 = pf["params"]["net_2"]["bias"].astype(jnp.bfloat16)
    got = _ln_reference(x, pl_["params"]["scale"], pl_["params"]["bias"],
                        w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_ln_custom_vjp_matches_autodiff_of_reference():
    args = _ln_args(64, 16, jnp.float32)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(ln_geglu_ff(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_ln_reference(*a)))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_ln_ff_residual_param_tree_identical_and_function_equal(monkeypatch):
    """Force the fused branch on CPU (route ln_geglu_ff through the XLA
    reference) and pin: same param tree as the unfused norm3+ff chain,
    same outputs, for BOTH block types that use _ln_ff_residual."""
    from seervideoldm_tpu.models import transformer3d as t3d
    from seervideoldm_tpu.ops.pallas import geglu_ff as gmod

    dim, heads, dh = 16, 2, 8
    x5 = _rand((1, 4, 8, 8, dim), 30, jnp.bfloat16)
    ctx = _rand((1, 4, 7, dim), 31, jnp.bfloat16)

    def build_and_run():
        outs, trees = [], []
        blk = t3d.BasicTextTransformerBlock3D(
            dim, heads, dh, context_dim=dim, dtype=jnp.bfloat16)
        p = blk.init(jax.random.PRNGKey(3), x5, ctx)
        trees.append(p)
        outs.append(blk.apply(p, x5, ctx))
        blk = t3d.BasicTransformerBlock3D(
            dim, heads, dh, temporal=True, causal=True, cond_frame=1,
            dtype=jnp.bfloat16)
        p = blk.init(jax.random.PRNGKey(4), x5)
        trees.append(p)
        outs.append(blk.apply(p, x5))
        return outs, trees

    outs_plain, trees_plain = build_and_run()

    monkeypatch.setattr(gmod, "geglu_ff_supported", lambda *a, **k: True)
    monkeypatch.setattr(gmod, "ln_geglu_ff", gmod._ln_reference)
    monkeypatch.setattr(gmod, "geglu_ff", gmod._reference)
    outs_fused, trees_fused = build_and_run()

    for tp, tf in zip(trees_plain, trees_fused):
        fa = jax.tree_util.tree_flatten_with_path(tp)[0]
        fb = jax.tree_util.tree_flatten_with_path(tf)[0]
        assert [p for p, _ in fa] == [p for p, _ in fb]
        for (_, a), (_, b) in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for op, of in zip(outs_plain, outs_fused):
        np.testing.assert_allclose(np.asarray(of, np.float32),
                                   np.asarray(op, np.float32),
                                   rtol=2e-2, atol=2e-2)


# ---- site-tail fusion: ln_geglu_ff_proj (FF + proj_out + outer residual) ----

from seervideoldm_tpu.ops.pallas.geglu_ff import (  # noqa: E402
    _kernel_ln_proj, _ln_proj_reference, ln_geglu_ff_proj)


def _ln_proj_args(n, c, dtype=jnp.bfloat16):
    # LN args + w3 (c, c), b3 (c,), res (n, c); w3 non-zero so the proj
    # matmul actually participates (production zero-init would be vacuous)
    return _ln_args(n, c, dtype) + [
        (0.2 * _rand((c, c), 17)).astype(dtype),
        (0.1 * _rand((c,), 18)).astype(dtype),
        _rand((n, c), 19).astype(dtype)]


def _run_kernel_ln_proj_interpret(x, gamma, beta, w1, b1, w2, b2, w3, b3,
                                  res, bt=128, ic=128):
    n, c = x.shape
    inner = w2.shape[0]
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h = b1[None, :inner].astype(x.dtype)
    b1g = b1[None, inner:].astype(x.dtype)
    b2r = b2[None, :].astype(x.dtype)
    b3r = b3[None, :].astype(x.dtype)
    g32 = gamma[None, :].astype(jnp.float32)
    bt32 = beta[None, :].astype(jnp.float32)
    rep = lambda shp: pl.BlockSpec(shp, lambda t: tuple(0 for _ in shp))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_kernel_ln_proj, inner=inner, ic=ic, eps=_LN_EPS),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
            rep((1, c)), rep((1, c)),
            rep((c, inner)), rep((1, inner)),
            rep((c, inner)), rep((1, inner)),
            rep((inner, c)), rep((1, c)),
            rep((c, c)), rep((1, c)),
            pl.BlockSpec((bt, c), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=True,
    )(x, g32, bt32, w1h, b1h, w1g, b1g, w2, b2r, w3.astype(x.dtype), b3r, res)


@pytest.mark.critical
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 5e-2)])
def test_ln_proj_kernel_matches_reference_interpret(dtype, tol):
    args = _ln_proj_args(256, 32, dtype)
    out = _run_kernel_ln_proj_interpret(*args)
    ref = _ln_proj_reference(*args)
    ref32 = ref.astype(jnp.float32)
    diff = jnp.max(jnp.abs(out.astype(jnp.float32) - ref32))
    rel = float(diff) / float(jnp.max(jnp.abs(ref32)))
    assert rel < tol, (float(diff), rel)


def test_ln_proj_reference_matches_unfused_tail():
    """_ln_proj_reference == (x + FF(LN(x))) @ w3 + b3 + res, the exact
    chain the unfused SpatialTransformer3D tail runs (proj_out 1x1 conv
    == matmul over tokens)."""
    args = _ln_proj_args(128, 16, jnp.bfloat16)
    x, gamma, beta, w1, b1, w2, b2, w3, b3, res = args
    y = _ln_reference(x, gamma, beta, w1, b1, w2, b2)
    want = (jnp.dot(y, w3, preferred_element_type=jnp.float32)
            .astype(x.dtype) + b3) + res
    got = _ln_proj_reference(*args)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_ln_proj_custom_vjp_matches_autodiff_of_reference():
    args = _ln_proj_args(64, 16, jnp.float32)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(ln_geglu_ff_proj(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_ln_proj_reference(*a)))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_site_tail_fusion_param_tree_identical_and_function_equal(monkeypatch):
    """SpatialTransformer3D with the fused tail (forced on CPU via the XLA
    reference) == the unfused module: same param tree (proj_out/conv/*
    zero-init shell), same outputs.  Exercises the production wiring:
    temporal + causal + cond_frame=0 + depth=1 + in_channels == inner."""
    from seervideoldm_tpu.models import transformer3d as t3d
    from seervideoldm_tpu.ops.pallas import geglu_ff as gmod

    dim, heads, dh = 16, 2, 8
    x5 = _rand((1, 4, 8, 8, dim), 40, jnp.bfloat16)

    def build_and_run():
        st = t3d.SpatialTransformer3D(
            in_channels=dim, n_heads=heads, d_head=dh, depth=1,
            temporal=True, causal=True, cond_frame=0,
            norm_num_groups=4, dtype=jnp.bfloat16)
        p = st.init(jax.random.PRNGKey(5), x5)
        return st.apply(p, x5), p

    out_plain, tree_plain = build_and_run()

    monkeypatch.setattr(gmod, "geglu_ff_supported", lambda *a, **k: True)
    monkeypatch.setattr(gmod, "ln_geglu_ff_proj_preferred",
                        lambda *a, **k: True)
    monkeypatch.setattr(gmod, "ln_geglu_ff_proj", gmod._ln_proj_reference)
    monkeypatch.setattr(gmod, "geglu_ff", gmod._reference)
    monkeypatch.setattr(gmod, "ln_geglu_ff", gmod._ln_reference)
    out_fused, tree_fused = build_and_run()

    fa = jax.tree_util.tree_flatten_with_path(tree_plain)[0]
    fb = jax.tree_util.tree_flatten_with_path(tree_fused)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (_, a), (_, b) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # zero-init proj_out makes the site output == its input regardless of
    # path; also check with a perturbed (non-zero) proj_out kernel so the
    # fused tail's matmul genuinely participates
    np.testing.assert_allclose(np.asarray(out_fused, np.float32),
                               np.asarray(out_plain, np.float32),
                               rtol=2e-2, atol=2e-2)

    import flax.traverse_util as tu
    flat = tu.flatten_dict(tree_plain["params"])
    key = ("proj_out", "conv", "kernel")
    assert key in flat, sorted(flat)[:10]
    bumped = dict(flat)
    bumped[key] = 0.3 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(6), flat[key].shape),
        np.float32)
    ptree = {"params": tu.unflatten_dict(bumped)}
    st = t3d.SpatialTransformer3D(
        in_channels=dim, n_heads=heads, d_head=dh, depth=1,
        temporal=True, causal=True, cond_frame=0,
        norm_num_groups=4, dtype=jnp.bfloat16)
    out_fused2 = st.apply(ptree, x5)
    monkeypatch.undo()
    out_plain2 = st.apply(ptree, x5)
    np.testing.assert_allclose(np.asarray(out_fused2, np.float32),
                               np.asarray(out_plain2, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_site_tail_fusion_engages_in_unet_jaxpr(monkeypatch):
    """With the TPU gates forced on, a cond_frame=0 SeerUNet trace contains
    ln_geglu_ff_proj custom_vjp calls at every temporal site whose width
    passes the channel gate — and a cond_frame>0 (training) trace contains
    NONE (the FF-skip split keeps the unfused tail)."""
    from seervideoldm_tpu.models import transformer3d as t3d
    from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig
    from seervideoldm_tpu.ops.pallas import geglu_ff as gmod

    calls = []

    def recording_proj(*a):
        calls.append(a[0].shape)
        return gmod._ln_proj_reference(*a)

    monkeypatch.setattr(gmod, "geglu_ff_supported",
                        lambda n, c, inner, dtype: True)
    monkeypatch.setattr(gmod, "ln_geglu_ff_proj_preferred",
                        lambda n, c, inner, dtype: True)
    monkeypatch.setattr(gmod, "ln_geglu_ff_proj", recording_proj)
    monkeypatch.setattr(gmod, "ln_geglu_ff", gmod._ln_reference)
    monkeypatch.setattr(gmod, "geglu_ff", gmod._reference)

    cfg = SeerUNetConfig(
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
        cross_attention_dim=32, attention_head_dim=4)
    unet = SeerUNet(config=cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 4, 16, 16, 4), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 4, 7, 32), jnp.bfloat16)
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx, 0)

    calls.clear()
    unet.apply(params, x, t, ctx, 0)
    # temporal sites where in_channels == n_heads*d_head: every level here
    # (ch 32 and 64 with d_head=4 -> heads=ch/4) -> one call per temporal
    # transformer (down 2 + mid 1 + up 2 with layers_per_block=1... count
    # is architecture-dependent; require at least one per level width)
    assert len(calls) >= 2, calls
    widths = {s[-1] for s in calls}
    assert 32 in widths and 64 in widths, calls

    calls.clear()
    unet.apply(params, x, t, ctx, 2)
    assert calls == [], calls  # training (cond_frame>0) keeps unfused tail
