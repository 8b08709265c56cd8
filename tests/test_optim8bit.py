"""8-bit AdamW: trajectory parity vs fp32 AdamW + int8 state layout.

Reference feature: ``use_8bit_adam`` (bitsandbytes AdamW8bit,
``/root/reference/train.py:214-222``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from seervideoldm_tpu.training.optim8bit import (
    _dequantize_signed,
    _dequantize_sqrt,
    _quantize_signed,
    _quantize_sqrt,
    adamw_8bit,
)


def test_quantize_roundtrip_signed():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 500)) * 0.01
    q = _quantize_signed(x)
    assert q.codes.dtype == jnp.int8
    back = _dequantize_signed(q, x.shape)
    # blockwise absmax linear: error bounded by absmax/127 per block
    err = np.abs(np.asarray(back - x))
    bound = float(jnp.max(jnp.abs(x))) / 127 + 1e-12
    assert err.max() <= bound * 1.01


def test_quantize_roundtrip_sqrt():
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (1000,))) ** 4 * 1e-6
    q = _quantize_sqrt(x)
    assert q.codes.dtype == jnp.int8
    back = _dequantize_sqrt(q, x.shape)
    # sqrt-space quantization: relative error on sqrt(v) <= 1/255 of block max
    rel = np.abs(np.sqrt(np.asarray(back)) - np.sqrt(np.asarray(x)))
    assert rel.max() <= float(jnp.sqrt(jnp.max(x))) / 255 + 1e-12


def test_zero_block_stable():
    x = jnp.zeros((700,))
    assert float(jnp.max(jnp.abs(_dequantize_signed(_quantize_signed(x), x.shape)))) == 0
    assert float(jnp.max(_dequantize_sqrt(_quantize_sqrt(x), x.shape))) == 0


@pytest.mark.parametrize("shape", [(37,), (16, 33)])
def test_trajectory_tracks_fp32_adamw(shape):
    """A quadratic-bowl descent: the 8-bit trajectory must track fp32 AdamW
    closely (quantization noise, not divergence)."""

    def loss(p):
        return jnp.sum((p - 1.5) ** 2) + 0.1 * jnp.sum(p**4)

    lr = 1e-2
    tx8 = adamw_8bit(lr, weight_decay=1e-2)
    txf = optax.adamw(lr, weight_decay=1e-2)
    p0 = jnp.linspace(-1, 1, int(np.prod(shape))).reshape(shape)
    p8 = pf = p0
    s8, sf = tx8.init(p8), txf.init(pf)
    step8 = jax.jit(lambda p, s: _step(tx8, p, s))
    stepf = jax.jit(lambda p, s: _step(txf, p, s))
    for _ in range(60):
        p8, s8 = step8(p8, s8)
        pf, sf = stepf(pf, sf)
    assert float(loss(p8)) < float(loss(p0))
    np.testing.assert_allclose(np.asarray(p8), np.asarray(pf), atol=0.05)


def _step(tx, p, s):
    g = jax.grad(lambda q: jnp.sum((q - 1.5) ** 2) + 0.1 * jnp.sum(q**4))(p)
    u, s = tx.update(g, s, p)
    return optax.apply_updates(p, u), s


def test_state_is_int8():
    params = {"w": jnp.ones((300, 5)), "b": jnp.zeros((7,))}
    tx = adamw_8bit(1e-3)
    state = tx.init(params)
    adam_state = state[0]
    for q in jax.tree.leaves(adam_state.mu, is_leaf=lambda x: hasattr(x, "codes")):
        assert q.codes.dtype == jnp.int8
        assert q.scales.dtype == jnp.float32
    # memory: codes dominate; scales are 1/256 of the element count
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    code_bytes = sum(q.codes.size for q in jax.tree.leaves(
        adam_state.mu, is_leaf=lambda x: hasattr(x, "codes")))
    assert code_bytes <= n + 2 * 256  # padding bound


def test_build_optimizer_8bit_wiring():
    from seervideoldm_tpu.training.optim import build_optimizer

    params = {"fstext": {"w": jnp.ones((4, 4))}}
    tx, _ = build_optimizer(params, 1e-3, partitioned=True, use_8bit=True,
                            accumulation_steps=1)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, state, params)
    assert jax.tree.leaves(u)[0].shape == (4, 4)
