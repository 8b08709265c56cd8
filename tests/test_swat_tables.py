"""Table-rotary SWAT kernel (swat_attention_tables) vs the trig reference.

The production fused path now feeds fp32 cos/sin tables into the kernel
instead of pre-rotating q/k in XLA (the pre-rotation measured 2.14 ms of
the 12.26 ms 512px-L0 temporal site — tools/probe_temporal_site.py).
These tests pin: value parity against the established rot_dim>0 unfused
reference (same trig, different plumbing), gradient parity through the
fused table backward, multi-frame-group causal decomposition, and the
WindowTemporalAttention module dispatching through the table path.
"""
import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.ops.rotary import rotary_tables

swat = importlib.import_module("seervideoldm_tpu.ops.pallas.swat_attention")


@pytest.fixture(autouse=True)
def interpret_mode():
    swat._INTERPRET = True
    yield
    swat._INTERPRET = False


def _tabs(f, h, w, d):
    return rotary_tables(f, h, w, d, min(32, d))  # (cos, sin)


@pytest.mark.critical
@pytest.mark.parametrize("f,h,w,d,ws", [(3, 8, 8, 40, 4), (2, 8, 8, 64, 8),
                                        (4, 4, 8, 32, 4)])
def test_tables_kernel_matches_trig_reference(f, h, w, d, ws):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, f, h, w, d).astype(np.float32))
    scale = d**-0.5
    tabs = _tabs(f, h, w, d)
    got = np.asarray(
        swat.swat_attention_tables(q, k, v, *tabs, scale, True, ws))
    want = np.asarray(
        swat._unfused_reference(q, k, v, scale, True, ws, min(32, d)))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_tables_noncausal():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    tabs = _tabs(2, 4, 4, 16)
    got = np.asarray(
        swat.swat_attention_tables(q, q, q, *tabs, 0.25, False, 4))
    want = np.asarray(swat._unfused_reference(q, q, q, 0.25, False, 4, 16))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_tables_gradients_match_trig_reference():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 4, 4, 16).astype(np.float32))
    tabs = _tabs(2, 4, 4, 16)

    def loss_tab(q, k, v):
        return jnp.sum(
            swat.swat_attention_tables(q, k, v, *tabs, 0.25, True, 4) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(swat._unfused_reference(q, k, v, 0.25, True, 4, 16) ** 2)

    g1 = jax.grad(loss_tab, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_tables_multigroup_causal_gradients(monkeypatch):
    """f=9 > gsz at ws=4 (with _GROUP_ROWS pinned to 128) forces multiple
    frame-row groups in the fused table backward (prefix dk/dv
    accumulation)."""
    monkeypatch.setattr(swat, "_GROUP_ROWS", 128)
    rng = np.random.RandomState(3)
    f, h, w, d, ws = 9, 4, 8, 16, 4
    q = jnp.asarray(rng.randn(1, f, h, w, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, f, h, w, d).astype(np.float32))
    v = jnp.asarray(rng.randn(1, f, h, w, d).astype(np.float32))
    tabs = _tabs(f, h, w, d)

    def loss_tab(q, k, v):
        return jnp.sum(
            swat.swat_attention_tables(q, k, v, *tabs, 0.25, True, ws) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            swat._unfused_reference(q, k, v, 0.25, True, ws, min(32, d)) ** 2)

    g1 = jax.grad(loss_tab, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_module_dispatches_table_path():
    """WindowTemporalAttention under interpreter mode takes the table-kernel
    path (no XLA pre-rotation) and matches the einsum path bitwise-ish."""
    from seervideoldm_tpu.ops.attention import WindowTemporalAttention

    rng = np.random.RandomState(4)
    b, f, h, w, c = 1, 2, 8, 8, 32
    x = jnp.asarray(rng.randn(b, f, h, w, c).astype(np.float32))
    mod_kernel = WindowTemporalAttention(query_dim=c, heads=2, dim_head=16,
                                         causal=True, use_flash=True)
    params = mod_kernel.init(jax.random.PRNGKey(0), x)
    mod_einsum = WindowTemporalAttention(query_dim=c, heads=2, dim_head=16,
                                         causal=True, use_flash=False)
    got = np.asarray(mod_kernel.apply(params, x))
    want = np.asarray(mod_einsum.apply(params, x))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.critical
def test_non_divisible_shapes_raise_loudly():
    """h/w must tile exactly into ws-windows: the kernel grid is
    (batch, h // ws) with a w // ws column loop, so e.g. resolution 288
    (h=36, ws=8) would leave remainder rows/columns UNWRITTEN — silent
    garbage.  Direct kernel calls must raise; the module dispatcher must
    not select the kernel for such shapes (advisor r4 medium)."""
    f, h, w, d, ws = 2, 12, 8, 8, 8  # h % ws == 4
    q = jnp.zeros((1, f, h, w, d), jnp.float32)
    tabs = _tabs(f, h, w, d)
    with pytest.raises(ValueError, match="h % ws"):
        swat.swat_attention_tables(q, q, q, *tabs, 1.0, True, ws)
    with pytest.raises(ValueError, match="h % ws"):
        swat.swat_attention(q, q, q, 1.0, True, ws, 4)

    # the module never dispatches the kernel on a non-divisible latent:
    # use_tab_kernel's h % ws / w % ws guard rejects it before the kernel
    from seervideoldm_tpu.ops.attention import WindowTemporalAttention

    mod = WindowTemporalAttention(query_dim=16, heads=2, dim_head=8)
    x = jnp.zeros((1, 2, 36, 36, 16), jnp.float32)  # ws=8, 36 % 8 != 0
    params = jax.eval_shape(mod.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 8, 8, 16), jnp.float32))
    # eval_shape through the module: must NOT hit the unwritten-output
    # kernel path; the XLA window_partition fallback fails loudly on the
    # reshape instead (36 != 4*8) — loud beats silent garbage.
    with pytest.raises(Exception):
        jax.eval_shape(lambda p, v: mod.apply(p, v), params, x)
