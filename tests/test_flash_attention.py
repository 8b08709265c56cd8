"""Pallas flash attention vs the einsum reference (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import importlib

fa = importlib.import_module("seervideoldm_tpu.ops.pallas.flash_attention")
from seervideoldm_tpu.ops.attention import causal_mask, dot_product_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    fa._INTERPRET = True
    yield
    fa._INTERPRET = False


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("q_len,kv_len,d", [(256, 256, 64), (192, 192, 40), (128, 77, 80)])
def test_flash_matches_einsum(causal, q_len, kv_len, d):
    if causal and q_len != kv_len:
        pytest.skip("causal only used for self-attention")
    rng = np.random.RandomState(0)
    q = rng.randn(2, 2, q_len, d).astype(np.float32)
    k = rng.randn(2, 2, kv_len, d).astype(np.float32)
    v = rng.randn(2, 2, kv_len, d).astype(np.float32)
    scale = d**-0.5
    got = np.asarray(fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                        scale, causal))
    mask = causal_mask(q_len, kv_len) if causal else None
    want = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v), scale, mask=mask))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_multiblock_online_softmax():
    """seq larger than one K block exercises the streaming accumulation."""
    rng = np.random.RandomState(1)
    q = rng.randn(1, 1, 640, 64).astype(np.float32) * 3  # large logits
    got = np.asarray(fa.flash_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                                        64**-0.5, True))
    mask = causal_mask(640, 640)
    want = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(q),
                                            jnp.asarray(q), 64**-0.5, mask=mask))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_flash_gradients_match_einsum():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 128, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 128, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 128, 64).astype(np.float32))
    scale = 64**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, scale, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, scale, mask=causal_mask(128, 128)) ** 2
        )

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("q_len,kv_len,causal", [(256, 77, False), (640, 640, True), (256, 512, True)])
def test_fused_backward_kernel(q_len, kv_len, causal):
    """Grad parity of the Pallas backward kernel vs einsum recompute."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, q_len, 40).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, kv_len, 40).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, kv_len, 40).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 2, q_len, 40).astype(np.float32))
    scale = 40**-0.5

    got = fa._bwd(scale, causal, (q, k, v), g)
    want = fa._bwd_einsum(scale, causal, (q, k, v), g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_backward_long_seq_falls_back_to_einsum(monkeypatch):
    """Beyond the single-shot regime the einsum recompute path is used."""
    monkeypatch.setattr(fa, "_SINGLE_SHOT_MAX_KV", 64)
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 1, 128, 32).astype(np.float32))

    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 32**-0.5, True) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, q, q)
    from seervideoldm_tpu.ops.attention import causal_mask, dot_product_attention

    def loss_ref(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, 32**-0.5, mask=causal_mask(128, 128)) ** 2
        )

    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, q, q)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)
