"""Core op tests: rotary convention vs an independent torch re-derivation,
window partition round-trip + ordering, attention math vs torch einsum,
GroupNorm/LayerNorm vs torch."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from seervideoldm_tpu.ops.rotary import apply_rotary, rotary_freqs
from seervideoldm_tpu.ops.windows import (
    select_window_size,
    window_partition,
    window_reverse,
)
from seervideoldm_tpu.ops.attention import causal_mask, dot_product_attention
from seervideoldm_tpu.ops.norms import GroupNorm, LayerNorm


# --- independent torch re-derivation of rotary-embedding-torch 0.1.5 ---

pytestmark = pytest.mark.critical

def torch_rotary(t: torch.Tensor, rot_dim: int, theta: float = 10000.0) -> torch.Tensor:
    """'lang' freqs, interleaved pairs, first rot_dim channels rotated."""
    seq = t.shape[-2]
    inv_freq = 1.0 / (theta ** (torch.arange(0, rot_dim, 2).float() / rot_dim))
    freqs = torch.einsum("i,j->ij", torch.arange(seq).float(), inv_freq)
    freqs = freqs.repeat_interleave(2, dim=-1)  # (seq, rot_dim)
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    x = t_rot.reshape(*t_rot.shape[:-1], rot_dim // 2, 2)
    rotated_half = torch.stack([-x[..., 1], x[..., 0]], dim=-1).reshape(t_rot.shape)
    out = t_rot * freqs.cos() + rotated_half * freqs.sin()
    return torch.cat([out, t_pass], dim=-1)


@pytest.mark.parametrize("head_dim,rot_dim", [(40, 32), (96, 32), (16, 16)])
def test_rotary_matches_torch_rederivation(head_dim, rot_dim):
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, head_dim).astype(np.float32)
    freqs = rotary_freqs(jnp.arange(7), rot_dim)
    got = np.asarray(apply_rotary(jnp.asarray(x), freqs))
    want = torch_rotary(torch.from_numpy(x), rot_dim).numpy()
    # fp32 pow() differs by ~1 ulp between XLA and torch; immaterial
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_rotary_relative_phase():
    # attention logits under rotary depend only on relative positions
    rot_dim = 16
    q = jnp.asarray(np.random.RandomState(1).randn(1, 5, rot_dim).astype(np.float32))
    f1 = rotary_freqs(jnp.arange(5), rot_dim)
    f2 = rotary_freqs(jnp.arange(5) + 11, rot_dim)
    l1 = np.einsum("bnd,bmd->bnm", apply_rotary(q, f1), apply_rotary(q, f1))
    l2 = np.einsum("bnd,bmd->bnm", apply_rotary(q, f2), apply_rotary(q, f2))
    np.testing.assert_allclose(l1, l2, atol=1e-4)


def test_window_partition_roundtrip():
    b, f, h, w, c = 2, 3, 8, 8, 5
    x = jnp.asarray(np.random.RandomState(2).randn(b, f, h, w, c).astype(np.float32))
    for ws in (4, 8):
        win = window_partition(x, ws)
        assert win.shape == (b * (h // ws) * (w // ws), f * ws * ws, c)
        back = window_reverse(win, ws, f, h, w)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_matches_torch_reference_ordering():
    """Replicate the reference permute(2,4,0,1,3,5,6) with torch ops."""
    b, f, h, w, c = 2, 2, 4, 4, 3
    ws = 2
    x = np.random.RandomState(3).randn(b, f, h, w, c).astype(np.float32)
    xt = torch.from_numpy(x)
    ref = (
        xt.view(b, f, h // ws, ws, w // ws, ws, c)
        .permute(2, 4, 0, 1, 3, 5, 6)
        .contiguous()
        .view(-1, f * ws * ws, c)
        .numpy()
    )
    got = np.asarray(window_partition(jnp.asarray(x), ws))
    np.testing.assert_array_equal(got, ref)


def test_select_window_size_rule():
    assert select_window_size(4) is None  # full-frame at <=4
    assert select_window_size(2) is None
    assert select_window_size(8) == 4  # 8//8=1 < 4
    assert select_window_size(16) == 4  # 16//8=2 < 4
    assert select_window_size(32) == 8  # 32//8=4 >= 4
    assert select_window_size(64) == 8


def test_causal_mask_tril_semantics():
    m = np.asarray(causal_mask(4, 4))
    want = np.tril(np.ones((4, 4), dtype=bool))
    np.testing.assert_array_equal(m, want)
    # rectangular: tril(j - i)
    m2 = np.asarray(causal_mask(3, 5))
    want2 = np.tril(np.ones((3, 5), dtype=bool), k=2)
    np.testing.assert_array_equal(m2, want2)


def test_dot_product_attention_vs_torch():
    rng = np.random.RandomState(4)
    q = rng.randn(2, 3, 6, 8).astype(np.float32)
    k = rng.randn(2, 3, 10, 8).astype(np.float32)
    v = rng.randn(2, 3, 10, 8).astype(np.float32)
    scale = 8**-0.5
    got = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    logits = torch.einsum("bhnd,bhmd->bhnm", qt, kt) * scale
    want = torch.einsum("bhnm,bhmd->bhnd", logits.softmax(-1), vt).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dot_product_attention_causal_vs_torch():
    rng = np.random.RandomState(5)
    q = rng.randn(1, 2, 6, 8).astype(np.float32)
    k = rng.randn(1, 2, 6, 8).astype(np.float32)
    v = rng.randn(1, 2, 6, 8).astype(np.float32)
    scale = 8**-0.5
    mask = causal_mask(6, 6)
    got = np.asarray(
        dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, mask=mask)
    )
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    logits = torch.einsum("bhnd,bhmd->bhnm", qt, kt) * scale
    logits = logits.masked_fill(~torch.tril(torch.ones(6, 6, dtype=torch.bool)), -torch.finfo(torch.float32).max)
    want = torch.einsum("bhnm,bhmd->bhnd", logits.softmax(-1), vt).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_group_norm_vs_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 3, 4, 4, 32).astype(np.float32)  # (b, f, h, w, c)
    gn = GroupNorm(num_groups=8, eps=1e-6)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize affine
    scale = rng.randn(32).astype(np.float32)
    bias = rng.randn(32).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(gn.apply(params, jnp.asarray(x)))
    # torch GroupNorm over NC(FHW): move channels to dim 1
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    tgn = torch.nn.GroupNorm(8, 32, eps=1e-6)
    tgn.weight.data = torch.from_numpy(scale)
    tgn.bias.data = torch.from_numpy(bias)
    want = tgn(xt).permute(0, 2, 3, 4, 1).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layer_norm_vs_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 5, 16).astype(np.float32)
    ln = LayerNorm()
    scale = rng.randn(16).astype(np.float32)
    bias = rng.randn(16).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(ln.apply(params, jnp.asarray(x)))
    tln = torch.nn.LayerNorm(16)
    tln.weight.data = torch.from_numpy(scale)
    tln.bias.data = torch.from_numpy(bias)
    want = tln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
