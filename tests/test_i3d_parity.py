"""Numeric value parity of the Flax I3D vs the REAL reference torch I3D.

The FVD protocol's credibility rests entirely on the I3D logits; shape
checks cannot catch TF-SAME pad asymmetries, BN folding errors, or kernel
transposition bugs (SURVEY §7 "hard parts": "I3D-exact FVD ... must be
reproduced in JAX or FVD shifts").  This test builds the reference's own
``InceptionI3d`` (``/root/reference/utils/models/i3d.py:135-315``) with
deterministic random weights, converts them through the production
``load_i3d_params`` path (torch.save → .pt → converter), and asserts the
logits match.

224×224 spatial input is REQUIRED by the architecture (the (2,7,7) VALID
avg-pool at ``i3d.py:276`` needs exactly-7 spatial maps after 5 halvings),
so this is inherently a heavier test; t=9 keeps it as small as the conv
stack allows while still exercising the stride-2 temporal SAME pads
(9 is odd → asymmetric pad split in ``compute_pad``, ``i3d.py:9-13``).
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref_i3d():
    sys.path.insert(0, REFERENCE)
    try:
        from utils.models.i3d import InceptionI3d as TorchI3d
    finally:
        sys.path.remove(REFERENCE)

    model = TorchI3d(num_classes=400)
    model.eval()  # dropout off, BN running stats — the FVD inference mode
    g = torch.Generator().manual_seed(1234)
    sd = model.state_dict()
    with torch.no_grad():
        for k, v in sd.items():
            if not v.dtype.is_floating_point:
                continue  # num_batches_tracked
            if k.endswith("running_var"):
                v.copy_(torch.rand(v.shape, generator=g) * 0.5 + 0.5)
            elif k.endswith("running_mean"):
                v.copy_(torch.randn(v.shape, generator=g) * 0.1)
            elif k.endswith("bn.weight"):
                v.copy_(torch.rand(v.shape, generator=g) * 0.5 + 0.75)
            elif k.endswith("bn.bias"):
                v.copy_(torch.randn(v.shape, generator=g) * 0.1)
            else:  # conv kernels / logits bias: fan-in-ish scale so the
                # 22-layer stack neither vanishes nor saturates
                fan_in = int(np.prod(v.shape[1:])) if v.ndim > 1 else 1
                v.copy_(torch.randn(v.shape, generator=g) / np.sqrt(fan_in))
    return model


@pytest.mark.slow
def test_i3d_logits_match_reference(ref_i3d, tmp_path):
    from seervideoldm_tpu.evaluation.i3d import InceptionI3d, load_i3d_params

    path = str(tmp_path / "i3d_random.pt")
    torch.save(ref_i3d.state_dict(), path)

    b, t = 1, 9
    rng = np.random.RandomState(7)
    video = rng.uniform(-1.0, 1.0, (b, t, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        want = ref_i3d(torch.from_numpy(video).permute(0, 4, 1, 2, 3)).numpy()

    flax_i3d = InceptionI3d()
    template = jax.eval_shape(
        flax_i3d.init, jax.random.PRNGKey(0), jnp.zeros((1, t, 224, 224, 3))
    )["params"]
    params = load_i3d_params(path, template)
    got = np.asarray(flax_i3d.apply({"params": params}, jnp.asarray(video)))

    assert got.shape == want.shape == (b, 400)
    assert np.isfinite(want).all()
    scale = float(np.abs(want).max())
    assert scale > 1e-3, "degenerate oracle logits — weight init collapsed"
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * scale)


@pytest.mark.slow
def test_i3d_logits_match_reference_fvd_shape(ref_i3d, tmp_path):
    """The FVD protocol's exact (b=2, t=16, 224, 224) shape — even temporal
    length takes the symmetric-pad branch of ``compute_pad``."""
    from seervideoldm_tpu.evaluation.i3d import InceptionI3d, load_i3d_params

    path = str(tmp_path / "i3d_random.pt")
    torch.save(ref_i3d.state_dict(), path)

    rng = np.random.RandomState(11)
    video = rng.uniform(-1.0, 1.0, (2, 16, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref_i3d(torch.from_numpy(video).permute(0, 4, 1, 2, 3)).numpy()

    flax_i3d = InceptionI3d()
    template = jax.eval_shape(
        flax_i3d.init, jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3))
    )["params"]
    params = load_i3d_params(path, template)
    got = np.asarray(flax_i3d.apply({"params": params}, jnp.asarray(video)))
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * scale)
