"""Numeric value parity of the Flax C3D (inception-score network) vs a
torch oracle of the reference's chainer C3D.

The reference C3D (``/root/reference/utils/models/c3d.py:20-166``) is
chainer code; chainer is not installed here, so the oracle is an
independent torch re-implementation of the exact chainer semantics the
Flax port hand-derived — the point is that two INDEPENDENT derivations of
those semantics (cover_all pooling == ceil_mode, ``F.resize_images`` ==
bilinear align_corners=True, BGR×128 pre-conv at ``c3d.py:65-67``, the
128−mean bias at ``c3d.py:68-71``, chainer's (C,T,H,W)-major Linear
flatten) agree on values, through the production ``load_c3d_params``
converter (chainer .npz layout: ``name/W`` (out,in,t,h,w), ``name/b``).
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as TF  # noqa: E402


def _torch_c3d(sd: dict, mean: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Oracle forward: x (b, 16, h, w, 3) RGB in [-1, 1] -> (b, 101)."""
    t = torch.from_numpy(x).permute(0, 4, 1, 2, 3).float()  # (b, 3, t, h, w)
    t = t.flip(1) * 128.0  # pre: RGB->BGR x128 (c3d.py:65-67)
    b, c, f, h, w = t.shape
    t = t.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
    t = TF.interpolate(t, (112, 112), mode="bilinear", align_corners=True)
    t = t.reshape(b, f, c, 112, 112).permute(0, 2, 1, 3, 4)
    t = t + torch.from_numpy(128.0 - mean[:, :, 8 : 8 + 112, 8 : 8 + 112])

    def conv(name, y):
        wt = torch.from_numpy(sd[f"{name}/W"])
        bi = torch.from_numpy(sd[f"{name}/b"])
        return TF.conv3d(y, wt, bi, padding=1)

    def pool(y, k):  # chainer cover_all == torch ceil_mode (pad 0)
        return TF.max_pool3d(y, k, stride=k, ceil_mode=True)

    t = pool(TF.relu(conv("conv1a", t)), (1, 2, 2))
    t = pool(TF.relu(conv("conv2a", t)), (2, 2, 2))
    t = TF.relu(conv("conv3b", TF.relu(conv("conv3a", t))))
    t = pool(t, (2, 2, 2))
    t = TF.relu(conv("conv4b", TF.relu(conv("conv4a", t))))
    t = pool(t, (2, 2, 2))
    t = TF.relu(conv("conv5b", TF.relu(conv("conv5a", t))))
    t = pool(t, (2, 2, 2))
    t = t.reshape(t.shape[0], -1)  # (C,T,H,W)-major, chainer Linear layout
    for name, act in [("fc6", True), ("fc7", True), ("fc8", False)]:
        wt = torch.from_numpy(sd[f"{name}/W"])
        bi = torch.from_numpy(sd[f"{name}/b"])
        t = TF.linear(t, wt, bi)
        if act:
            t = TF.relu(t)
    return t.numpy()


@pytest.mark.slow
def test_c3d_logits_match_torch_oracle(tmp_path):
    from seervideoldm_tpu.evaluation.c3d import C3D, load_c3d_params

    rng = np.random.RandomState(42)
    chans = [("conv1a", 3, 64), ("conv2a", 64, 128), ("conv3a", 128, 256),
             ("conv3b", 256, 256), ("conv4a", 256, 512), ("conv4b", 512, 512),
             ("conv5a", 512, 512), ("conv5b", 512, 512)]
    sd = {}
    for name, cin, cout in chans:
        fan_in = cin * 27
        sd[f"{name}/W"] = (rng.randn(cout, cin, 3, 3, 3) / np.sqrt(fan_in)).astype(np.float32)
        sd[f"{name}/b"] = (rng.randn(cout) * 0.05).astype(np.float32)
    for name, nin, nout in [("fc6", 512 * 16, 4096), ("fc7", 4096, 4096),
                            ("fc8", 4096, 101)]:
        sd[f"{name}/W"] = (rng.randn(nout, nin) / np.sqrt(nin)).astype(np.float32)
        sd[f"{name}/b"] = (rng.randn(nout) * 0.05).astype(np.float32)
    mean = (rng.rand(3, 16, 120, 120) * 255).astype(np.float32)

    npz_path = str(tmp_path / "conv3d_deepnetA_ucf.npz")
    mean_path = str(tmp_path / "mean2.npz")
    np.savez(npz_path, **sd)
    np.savez(mean_path, mean=mean)

    # reference protocol shape: 16 frames, 64x64 RGB in [-1, 1]
    video = rng.uniform(-1.0, 1.0, (2, 16, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = _torch_c3d(sd, mean, video)

    c3d = C3D()
    template = jax.eval_shape(
        c3d.init, jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3))
    )["params"]
    params = load_c3d_params(npz_path, mean_path, template)
    # converter contract: every produced leaf matches the template's shape
    flat_t = jax.tree_util.tree_leaves_with_path(template)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(params))
    for path, leaf in flat_t:
        assert path in flat_p and tuple(flat_p[path].shape) == tuple(leaf.shape)
    got = np.asarray(c3d.apply({"params": params}, jnp.asarray(video)))

    assert got.shape == want.shape == (2, 101)
    scale = float(np.abs(want).max())
    assert scale > 1e-3, "degenerate oracle logits"
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * scale)
