"""Fused SWAT kernel vs the unfused XLA reference (interpreter mode)."""
import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

swat = importlib.import_module("seervideoldm_tpu.ops.pallas.swat_attention")


@pytest.fixture(autouse=True)
def interpret_mode():
    swat._INTERPRET = True
    yield
    swat._INTERPRET = False


@pytest.mark.parametrize("f,h,w,d,ws", [(3, 8, 8, 40, 4), (2, 8, 8, 64, 8),
                                        (4, 4, 8, 32, 4)])
def test_swat_kernel_matches_unfused(f, h, w, d, ws):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    scale = d**-0.5
    rot = min(32, d)
    got = np.asarray(swat.swat_attention(q, k, v, scale, True, ws, rot))
    want = np.asarray(swat._unfused_reference(q, k, v, scale, True, ws, rot))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_swat_kernel_noncausal():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    got = np.asarray(swat.swat_attention(q, q, q, 0.25, False, 4, 16))
    want = np.asarray(swat._unfused_reference(q, q, q, 0.25, False, 4, 16))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_swat_gradients_match_unfused():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(swat.swat_attention(q, k, v, 0.25, True, 4, 16) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(swat._unfused_reference(q, k, v, 0.25, True, 4, 16) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_swat_multigroup_causal_decomposition_gradients(monkeypatch):
    """f=9 > gsz at ws=4 (with _GROUP_ROWS pinned to 128) forces MULTIPLE
    frame-row groups, exercising the
    backward kernel's prefix dk/dv accumulation across groups (a single
    group degenerates to the full-square path)."""
    monkeypatch.setattr(swat, "_GROUP_ROWS", 128)
    rng = np.random.RandomState(3)
    f, h, w, d, ws = 9, 8, 8, 16, 4
    q = jnp.asarray(rng.randn(1, f, h, w, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, f, h, w, d).astype(np.float32))
    v = jnp.asarray(rng.randn(1, f, h, w, d).astype(np.float32))
    scale, rot = d**-0.5, 16

    got = np.asarray(swat.swat_attention(q, k, v, scale, True, ws, rot))
    want = np.asarray(swat._unfused_reference(q, k, v, scale, True, ws, rot))
    np.testing.assert_allclose(got, want, atol=3e-5)

    def loss_fused(q, k, v):
        return jnp.sum(swat.swat_attention(q, k, v, scale, True, ws, rot) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(swat._unfused_reference(q, k, v, scale, True, ws, rot) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_swat_kernel_prerotated_rot0():
    """rot_dim=0 (caller pre-rotates in XLA) == in-kernel rotary path.

    This is the production dispatch since r3: WindowTemporalAttention
    applies rotary via apply_rotary before the kernel (in-kernel trig
    measured 36% of kernel runtime), so kernel(rotated q/k, rot_dim=0)
    must equal kernel(raw q/k, rot_dim=rot)."""
    from seervideoldm_tpu.ops.rotary import apply_rotary, rotary_freqs

    rng = np.random.RandomState(4)
    f, h, w, d, ws = 3, 8, 8, 40, 4
    q = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    scale, rot = d**-0.5, min(32, d)
    n = f * h * w
    freqs = rotary_freqs(jnp.arange(n), rot)
    pre = lambda t: apply_rotary(t.reshape(2, n, d), freqs).reshape(t.shape)  # noqa: E731

    got = np.asarray(swat.swat_attention(pre(q), pre(k), v, scale, True, ws, 0))
    want = np.asarray(swat.swat_attention(q, k, v, scale, True, ws, rot))
    np.testing.assert_allclose(got, want, atol=3e-5)

    # gradients: fused bwd kernel with rot_dim=0 vs XLA vjp of the whole
    # pre-rotate + windowed-attention composition
    def loss_fused(q, k, v):
        return jnp.sum(
            swat.swat_attention(pre(q), pre(k), v, scale, True, ws, 0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(swat._unfused_reference(q, k, v, scale, True, ws, rot) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_window_temporal_attention_swat_dispatch_parity():
    """Full WindowTemporalAttention module: fused-SWAT dispatch (interpreter)
    == XLA path.  Exercises the r3 caller wiring — XLA pre-rotation feeding
    the kernel with rot_dim=0 — at ws=8 (h=32, the only size that takes the
    fused path in production)."""
    from seervideoldm_tpu.ops.attention import WindowTemporalAttention

    attn = WindowTemporalAttention(query_dim=32, heads=2, dim_head=16,
                                   causal=True, use_flash=True)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 2, 32, 32, 32).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), x)
    got = np.asarray(attn.apply(params, x))  # _INTERPRET=True → SWAT kernel
    swat._INTERPRET = False  # available() False on CPU → XLA path
    want = np.asarray(attn.apply(params, x))
    swat._INTERPRET = True
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("f,h,w,d,ws", [
    (3, 8, 8, 40, 4),
    pytest.param(2, 8, 16, 64, 8, marks=pytest.mark.slow),
    pytest.param(2, 8, 32, 40, 8, marks=pytest.mark.slow),
    # widths NOT divisible by 16: the old sw=min(16,w) grid left trailing
    # columns unwritten (ADVICE r2 medium)
    pytest.param(2, 8, 24, 40, 8, marks=pytest.mark.slow),
    pytest.param(2, 8, 40, 32, 8, marks=pytest.mark.slow),
    (2, 4, 12, 32, 4)])
def test_swat_fused_backward_kernel(f, h, w, d, ws):
    """Pallas backward kernel (in-kernel rotary adjoint) vs XLA vjp."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    g = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    scale, rot = d**-0.5, min(32, d)
    got = swat._swat_backward(q, k, v, g, scale, True, ws, rot)

    def fn(q, k, v):
        return swat._unfused_reference(q, k, v, scale, True, ws, rot)

    _, vjp = jax.vjp(fn, q, k, v)
    want = vjp(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
