"""flax → torch export (inverse converter).

The export must reproduce the reference checkpoint contract exactly: every
key of the vendored full-scale manifests sourced from our param trees with
the inverse layout transforms, plus the analytic ``rotary_emb.freqs``
buffers the strict torch load requires (rotary-embedding-torch 0.1.5
persists them; reference load at ``inference.py:119-128``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.io.convert import torch_to_flax
from seervideoldm_tpu.io.export import (
    _rotary_freqs,
    export_reference_checkpoint,
    flax_to_torch,
    load_reference_manifests,
)


def test_roundtrip_exact_values():
    """torch -> flax -> torch is the identity on names AND values."""
    target = {
        "dense": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros((8,))},
        "block_0": {"conv1": {"conv": {"kernel": jnp.zeros((3, 3, 2, 5)),
                                       "bias": jnp.zeros((5,))}}},
        "norm": {"scale": jnp.zeros((6,)), "bias": jnp.zeros((6,))},
        "emb": {"embedding": jnp.zeros((7, 4))},
        "pos_embed": jnp.zeros((1, 9, 4)),
    }
    rng = np.random.RandomState(0)
    sd = {
        "dense.weight": rng.randn(8, 4).astype(np.float32),
        "dense.bias": rng.randn(8).astype(np.float32),
        "block.0.conv1.weight": rng.randn(5, 2, 3, 3).astype(np.float32),
        "block.0.conv1.bias": rng.randn(5).astype(np.float32),
        "norm.weight": rng.randn(6).astype(np.float32),
        "norm.bias": rng.randn(6).astype(np.float32),
        "emb.weight": rng.randn(7, 4).astype(np.float32),
        "pos_embed": rng.randn(1, 9, 4).astype(np.float32),
    }
    tree, missing, unmatched = torch_to_flax(sd, target)
    assert not missing and not unmatched
    manifest = {k: list(v.shape) for k, v in sd.items()}
    out, missing, unused = flax_to_torch(tree, manifest)
    assert missing == [] and unused == []
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_bf16_params_export_as_fp32():
    tree = {"dense": {"kernel": jnp.ones((2, 3), jnp.bfloat16)}}
    out, _, _ = flax_to_torch(tree, {"dense.weight": [3, 2]})
    assert out["dense.weight"].dtype == np.float32
    np.testing.assert_array_equal(out["dense.weight"], np.ones((3, 2)))


def test_rotary_freqs_analytic():
    """Synthesized buffers equal ops.rotary's 'lang' table (itself
    parity-tested against the torch pin's convention)."""
    from seervideoldm_tpu.ops.rotary import rotary_freqs as ours

    for dim in (32, 16):
        want = 1.0 / (10000.0 ** (np.arange(0, dim, 2, np.float32) / dim))
        got = _rotary_freqs(dim)
        np.testing.assert_allclose(got, want, rtol=0)
        # ops.rotary at position 1 carries inv_freq duplicated per lane pair
        table = np.asarray(ours(jnp.array([1.0]), dim))[0]
        np.testing.assert_allclose(np.repeat(got, 2), table, rtol=1e-6)


@pytest.fixture(scope="module")
def manifests():
    return load_reference_manifests()


@pytest.mark.slow
def test_full_scale_seer_unet_export(manifests):
    """Shape-only at real SD-1.5 scale: every manifest key is produced, no
    flax leaf is left behind, and all shapes match the reference contract."""
    from seervideoldm_tpu.models.unet3d import SeerUNet

    unet = SeerUNet()
    shapes = jax.eval_shape(
        lambda k, x, t, ctx: unet.init(k, x, t, ctx, 0),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 8, 8, 4), jnp.float32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 77, 768), jnp.float32),
    )["params"]
    out, missing, unused = flax_to_torch(
        shapes, manifests["seer_unet"], materialize=False)
    assert missing == [], f"{len(missing)} unproduced keys: {missing[:10]}"
    assert unused == [], f"{len(unused)} unexported leaves: {unused[:10]}"
    for k, s in manifests["seer_unet"].items():
        assert out[k] == tuple(s), k


def test_full_scale_fstext_export(manifests):
    from seervideoldm_tpu.models.fstext import FSTextTransformer

    fstext = FSTextTransformer(num_frames=16)
    shapes = jax.eval_shape(
        fstext.init, jax.random.PRNGKey(0), jnp.zeros((1, 77, 768), jnp.float32)
    )["params"]
    out, missing, unused = flax_to_torch(
        shapes, manifests["fstext"], materialize=False)
    assert missing == [] and unused == []
    assert set(out) == set(manifests["fstext"])


def test_export_reference_checkpoint_files(tmp_path):
    """The two-file layout written and torch-loadable with exact values."""
    import torch

    rng = np.random.RandomState(1)
    unet_tree = {"conv_in": {"conv": {"kernel": jnp.asarray(
        rng.randn(3, 3, 2, 4).astype(np.float32))}}}
    fst_tree = {"learnable_query": jnp.asarray(
        rng.randn(1, 1, 1, 8).astype(np.float32))}
    mini = {
        "seer_unet": {"conv_in.weight": [4, 2, 3, 3],
                      "rotary_emb.freqs": [16]},
        "fstext": {"learnable_query": [1, 1, 1, 8]},
    }
    p_unet, p_fst = export_reference_checkpoint(
        unet_tree, fst_tree, str(tmp_path), manifests=mini)
    sd = torch.load(p_unet, weights_only=True)
    assert set(sd) == {"conv_in.weight", "rotary_emb.freqs"}
    np.testing.assert_array_equal(
        sd["conv_in.weight"].numpy(),
        np.asarray(unet_tree["conv_in"]["conv"]["kernel"]).transpose(3, 2, 0, 1))
    np.testing.assert_allclose(sd["rotary_emb.freqs"].numpy(),
                               _rotary_freqs(32), rtol=0)
    sd1 = torch.load(p_fst, weights_only=True)
    np.testing.assert_array_equal(sd1["learnable_query"].numpy(),
                                  np.asarray(fst_tree["learnable_query"]))


def test_missing_leaf_raises(manifests):
    with pytest.raises(ValueError, match="no source leaf"):
        flax_to_torch({}, {"dense.weight": [3, 2]}, strict=True)
