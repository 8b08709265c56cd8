"""Ring attention over the 'seq' (frame) mesh axis (ops/ring.py).

Beyond reference: SURVEY §5's "shard frames across devices with a
collective-permute ring".  Parity bar: the ring path must match the
single-device SWAT windowed attention (the xformers
LowerTriangularMask-over-f-major-tokens semantics, SURVEY §2.5.1) — in
values AND gradients — while keeping the frame axis sharded end to end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.ops.attention import (
    WindowTemporalAttention, causal_mask, dot_product_attention,
)
from seervideoldm_tpu.ops.pallas import set_activation_mesh
from seervideoldm_tpu.ops.ring import (
    ring_attention_applicable, ring_window_attention, set_ring_enabled,
)
from seervideoldm_tpu.ops.windows import window_partition, window_reverse
from seervideoldm_tpu.parallel.mesh import create_mesh, video_sharding

requires_4 = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")


def _qkv(bh=4, f=8, h=4, w=4, d=8, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(bh, f, h, w, d).astype(np.float32))
    return mk(), mk(), mk()


def _reference(q, k, v, scale, causal, ws):
    """Single-device SWAT attention in the exact windowed layout."""
    bh, f, h, w, d = q.shape
    if ws is None:
        flat = lambda x: x.reshape(bh, f * h * w, d)
        out = dot_product_attention(flat(q), flat(k), flat(v), scale,
                                    causal=causal, use_flash=False)
        return out.reshape(bh, f, h, w, d)
    qw, kw, vw = (window_partition(x, ws) for x in (q, k, v))
    ow = dot_product_attention(qw, kw, vw, scale, causal=causal,
                               use_flash=False)
    return window_reverse(ow, ws, f, h, w)


@pytest.fixture
def seq_mesh():
    mesh = create_mesh({"data": 2, "seq": 2})
    set_activation_mesh(mesh)
    yield mesh
    set_activation_mesh(None)


@requires_4
@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("ws", [2, None])
def test_ring_matches_reference(seq_mesh, causal, ws):
    q, k, v = _qkv()
    out = ring_window_attention(q, k, v, 0.3, causal, ws)
    assert out is not None
    want = _reference(q, k, v, 0.3, causal, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@requires_4
@pytest.mark.slow
def test_ring_four_way_seq(causal=True):
    """All devices on the seq axis (no batch axis): 4 ring hops."""
    mesh = create_mesh({"seq": 4})
    set_activation_mesh(mesh)
    try:
        q, k, v = _qkv(bh=3, f=8, h=4, w=4)  # bh NOT divisible by anything
        out = ring_window_attention(q, k, v, 0.25, causal, 2)
        want = _reference(q, k, v, 0.25, causal, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
    finally:
        set_activation_mesh(None)


@requires_4
@pytest.mark.slow
def test_ring_gradients_match(seq_mesh):
    """Autodiff through the remat scan + ppermute ring == the einsum path's
    gradients — training under sequence parallelism is exact."""
    q, k, v = _qkv(f=4, h=2, w=2, d=4)

    def loss_ring(q, k, v):
        out = ring_window_attention(q, k, v, 0.5, True, 2)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_ref(q, k, v):
        out = _reference(q, k, v, 0.5, True, 2)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=1e-5, rtol=1e-4)


@requires_4
def test_ring_fallbacks(seq_mesh):
    # frames not divisible by the seq axis -> None (caller falls back)
    q, k, v = _qkv(f=7)
    assert ring_window_attention(q, k, v, 0.3, True, 2) is None
    # knob off -> None
    set_ring_enabled(False)
    try:
        q, k, v = _qkv()
        assert not ring_attention_applicable()
        assert ring_window_attention(q, k, v, 0.3, True, 2) is None
    finally:
        set_ring_enabled(True)


def test_not_applicable_without_mesh():
    assert not ring_attention_applicable()
    q, k, v = _qkv(bh=2, f=2, h=2, w=2, d=4)
    assert ring_window_attention(q, k, v, 0.3, True, 2) is None


@requires_4
def test_module_under_seq_mesh_matches_replicated(seq_mesh):
    """WindowTemporalAttention end to end: module output on a seq-sharded
    input (ring path engaged) == the unsharded module output, rotary and
    output projection included."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 4, 4, 16).astype(np.float32))

    mod = WindowTemporalAttention(query_dim=16, heads=2, dim_head=8,
                                  causal=True, use_flash=False)
    params = mod.init(jax.random.PRNGKey(0), x)

    set_activation_mesh(None)
    want = np.asarray(jax.jit(mod.apply)(params, x))

    set_activation_mesh(seq_mesh)
    xs = jax.device_put(x, video_sharding(seq_mesh))
    got = jax.jit(mod.apply)(params, xs)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
    # the ring path must actually have been taken
    assert ring_attention_applicable()
