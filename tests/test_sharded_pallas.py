"""Pallas kernels under multi-device meshes via shard_map.

pallas_call is an opaque custom call GSPMD cannot partition, so under a
data/seq-sharded mesh the kernels run inside shard_map with axis-0 (batch)
partitioning — registered through ``ops.pallas.set_activation_mesh`` by the
entry points.  These tests run the kernels in interpreter mode on a 2x2
data×seq CPU mesh and assert parity with the einsum paths, plus the
non-divisible-batch fallback.
"""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seervideoldm_tpu.ops.attention import dot_product_attention
from seervideoldm_tpu.ops.pallas import (
    get_activation_mesh,
    maybe_shard_batched,
    set_activation_mesh,
)
from seervideoldm_tpu.parallel.mesh import create_mesh

fa = importlib.import_module("seervideoldm_tpu.ops.pallas.flash_attention")
swat = importlib.import_module("seervideoldm_tpu.ops.pallas.swat_attention")


@pytest.fixture
def mesh22():
    """2x2 data×seq mesh with interpreter-mode kernels registered."""
    mesh = create_mesh({"data": 2, "seq": 2})
    fa._INTERPRET = True
    swat._INTERPRET = True
    set_activation_mesh(mesh)
    yield mesh
    set_activation_mesh(None)
    fa._INTERPRET = False
    swat._INTERPRET = False


def test_flash_dispatches_through_shard_map(mesh22):
    """dot_product_attention must route long sequences through the
    shard_map-wrapped flash kernel and match the einsum path."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(8, 1, 512, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(8, 1, 512, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(8, 1, 512, 16).astype(np.float32))
    scale = 16**-0.5
    assert get_activation_mesh() is not None
    got = np.asarray(dot_product_attention(q, k, v, scale))
    want = np.asarray(dot_product_attention(q, k, v, scale, use_flash=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_flash_shard_map_gradients(mesh22):
    """custom_vjp (fused Pallas backward) composes with shard_map."""
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 512, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 512, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 512, 8).astype(np.float32))
    scale = 8**-0.5

    def loss_sharded(q, k, v):
        out = maybe_shard_batched(
            lambda qs, ks, vs: fa.flash_attention(qs, ks, vs, scale, True),
            q, k, v)
        assert out is not None
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, scale, causal=True,
                                  use_flash=False) ** 2)

    got = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-4, rtol=1e-4)


def test_non_divisible_batch_falls_back_to_einsum(mesh22):
    """Axis 0 not divisible by the mesh: no kernel, no error — einsum."""
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(3, 1, 512, 8).astype(np.float32))  # 3 % 4 != 0
    scale = 8**-0.5
    got = np.asarray(dot_product_attention(q, q, q, scale))
    want = np.asarray(dot_product_attention(q, q, q, scale, use_flash=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_swat_module_shard_map_parity(mesh22):
    """WindowTemporalAttention takes the fused SWAT kernel under the mesh
    (ws=8 at h=32) and matches its own XLA path bit-for-semantics."""
    from seervideoldm_tpu.ops.attention import WindowTemporalAttention

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 32, 32, 16).astype(np.float32))
    kernel_mod = WindowTemporalAttention(query_dim=16, heads=2, dim_head=8,
                                         causal=True, use_flash=True)
    xla_mod = WindowTemporalAttention(query_dim=16, heads=2, dim_head=8,
                                      causal=True, use_flash=False)
    params = xla_mod.init(jax.random.PRNGKey(0), x)
    want = np.asarray(xla_mod.apply(params, x))
    got = np.asarray(kernel_mod.apply(params, x))  # bh=4 divides the 2x2 mesh
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_swat_shard_map_gradients(mesh22):
    """Fused SWAT backward under shard_map matches the unfused vjp."""
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(4, 2, 32, 32, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 2, 32, 32, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 2, 32, 32, 8).astype(np.float32))
    scale = 8**-0.5

    def loss_sharded(q, k, v):
        out = maybe_shard_batched(
            lambda qs, ks, vs: swat.swat_attention(qs, ks, vs, scale, True, 8, 0),
            q, k, v)
        assert out is not None
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(swat._unfused_reference(q, k, v, scale, True, 8, 0) ** 2)

    got = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-4, rtol=1e-4)


def test_flash_under_tensor_parallel_mesh():
    """A 'model' (TP) mesh axis also routes kernels through shard_map —
    head-sharded activations reaching a raw pallas_call would be opaque
    to GSPMD exactly like data/seq-sharded ones."""
    mesh = create_mesh({"data": 2, "model": 2})
    fa._INTERPRET = True
    set_activation_mesh(mesh)
    try:
        reg = get_activation_mesh()
        assert reg is not None and reg[1] == ("data", "model")
        rng = np.random.RandomState(5)
        q = jnp.asarray(rng.randn(4, 2, 512, 8).astype(np.float32))
        scale = 8**-0.5
        got = np.asarray(dot_product_attention(q, q, q, scale))
        want = np.asarray(dot_product_attention(q, q, q, scale,
                                                use_flash=False))
        np.testing.assert_allclose(got, want, atol=2e-5)
    finally:
        set_activation_mesh(None)
        fa._INTERPRET = False
