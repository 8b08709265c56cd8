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
