"""Full-SD-1.5-scale VALUE round-trip through the converter pair.

The manifest audit (tests/test_convert_manifest.py) is shape-only; square
kernels transposed the wrong way, fused-vs-split orderings, and sign
conventions all pass shape checks.  Here every torch key of the full-scale
SeerUNet (1006 keys / 1082.8M params) and FSText (276 / 182.6M) checkpoints
gets a DETERMINISTIC fp16 value derived from its name, runs
torch→flax→torch through the production ``torch_to_flax``/``flax_to_torch``
pair, and must come back **bitwise identical** (fp16→fp32 is exact).

Proves the strict-load contract (``/root/reference/inference.py:119-128``)
by values, not shapes (VERDICT r3 task 7).  fp16 bounds RAM (~1.7 GB per
tree copy); values are generated lazily per key.
"""
from __future__ import annotations

import zlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from seervideoldm_tpu.io.convert import torch_to_flax  # noqa: E402
from seervideoldm_tpu.io.export import (  # noqa: E402
    _rotary_freqs,
    flax_to_torch,
    load_reference_manifests,
)


def _det_value(key: str, shape) -> np.ndarray:
    rs = np.random.RandomState(zlib.crc32(key.encode()) & 0x7FFFFFFF)
    return (rs.standard_normal(tuple(shape)) * 0.02).astype(np.float16)


class _LazySD:
    """Mapping over a manifest generating each value on first touch only —
    torch_to_flax iterates .items() exactly once."""

    def __init__(self, manifest):
        self._m = manifest

    def items(self):
        for k, s in self._m.items():
            yield k, _det_value(k, s)


def _fp16_template(shapes_tree):
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.float16), shapes_tree)


def _roundtrip(manifest, shapes_tree):
    tree, missing, unmatched = torch_to_flax(
        _LazySD(manifest), _fp16_template(shapes_tree), strict=True)
    assert missing == [] and unmatched == []
    out, missing, unused = flax_to_torch(tree, manifest)
    assert missing == [] and unused == []
    assert set(out) == set(manifest)
    bad = []
    for name, shape in manifest.items():
        got = out.pop(name)  # free as we go
        if name.endswith("rotary_emb.freqs"):
            # synthesized analytically, not round-tripped: check the formula
            if not np.array_equal(got, _rotary_freqs(2 * tuple(shape)[0])):
                bad.append(name)
            continue
        want = _det_value(name, shape).astype(np.float32)
        if got.shape != want.shape or not np.array_equal(got, want):
            bad.append(name)
    assert bad == [], f"{len(bad)} keys not bitwise round-tripped: {bad[:10]}"


@pytest.fixture(scope="module")
def manifests():
    return load_reference_manifests()


@pytest.mark.slow
def test_seer_unet_fullscale_value_roundtrip(manifests):
    from seervideoldm_tpu.models.unet3d import SeerUNet

    unet = SeerUNet()
    shapes = jax.eval_shape(
        lambda k, x, t, ctx: unet.init(k, x, t, ctx, 0),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 8, 8, 4), jnp.float32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 77, 768), jnp.float32),
    )["params"]
    _roundtrip(manifests["seer_unet"], shapes)


@pytest.mark.slow
def test_fstext_fullscale_value_roundtrip(manifests):
    from seervideoldm_tpu.models.fstext import FSTextTransformer

    fstext = FSTextTransformer(num_frames=16)
    shapes = jax.eval_shape(
        fstext.init, jax.random.PRNGKey(0), jnp.zeros((1, 77, 768), jnp.float32)
    )["params"]
    _roundtrip(manifests["fstext"], shapes)
