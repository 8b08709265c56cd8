"""Golden parity against the ACTUAL reference source at /root/reference.

Round-1 parity ran only against ``tests/torch_ref.py`` (a re-derivation a
shared misunderstanding could slip through).  These tests import the real
reference modules that need only torch/numpy/einops/sklearn:

- ``ldm/modules/diffusionmodules/util.py`` — beta schedules, DDIM timestep
  subsequence (+1 offset), DDIM sampling parameters;
- ``dataset/data_utils.py::cast_num_frames`` — trilinear temporal resample
  / zero pad (torchvision stubbed: only a default arg needs it);
- ``utils/fvd.py`` — Fréchet distance (TF-GAN svd sqrt) and polynomial MMD,
  plus the VideoGPT resize/crop preprocessing.
"""
from __future__ import annotations

import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"



pytestmark = pytest.mark.critical

@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (torchvision stubbed for data_utils)."""
    sys.path.insert(0, REFERENCE)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class _ToTensor:  # only referenced as a default argument
            def __call__(self, x):
                return x

        tr.ToTensor = _ToTensor
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    from dataset import data_utils as ref_data_utils
    from ldm.modules.diffusionmodules import util as ref_util
    from utils import fvd as ref_fvd

    ns = types.SimpleNamespace(
        util=ref_util, data_utils=ref_data_utils, fvd=ref_fvd
    )
    yield ns
    sys.path.remove(REFERENCE)


# --- schedules (ldm/modules/diffusionmodules/util.py:21-74) ---


@pytest.mark.parametrize("schedule", ["linear", "cosine", "sqrt_linear", "sqrt"])
@pytest.mark.parametrize("start,end", [(1e-4, 2e-2), (0.00085, 0.012)])
def test_beta_schedule_matches_reference(ref, schedule, start, end):
    from seervideoldm_tpu.diffusion.schedules import make_beta_schedule

    want = ref.util.make_beta_schedule(
        schedule, 1000, linear_start=start, linear_end=end
    )
    want = np.asarray(want)
    got = make_beta_schedule(schedule, 1000, linear_start=start, linear_end=end)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)


@pytest.mark.parametrize("method", ["uniform", "quad"])
@pytest.mark.parametrize("S,T", [(30, 1000), (50, 1000), (7, 100)])
def test_ddim_timesteps_match_reference(ref, method, S, T):
    from seervideoldm_tpu.diffusion.schedules import make_ddim_timesteps

    want = ref.util.make_ddim_timesteps(
        ddim_discr_method=method, num_ddim_timesteps=S,
        num_ddpm_timesteps=T, verbose=False,
    )
    got = make_ddim_timesteps(method, S, T)
    np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.parametrize("eta", [0.0, 0.5, 1.0])
def test_ddim_sampling_parameters_match_reference(ref, eta):
    from seervideoldm_tpu.diffusion.schedules import (
        DiffusionSchedule, make_ddim_sampling_parameters, make_ddim_timesteps,
    )

    sched = DiffusionSchedule.create(1000)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    want_s, want_a, want_ap = ref.util.make_ddim_sampling_parameters(
        alphacums=torch.from_numpy(sched.alphas_cumprod.astype(np.float64)),
        ddim_timesteps=ts, eta=eta, verbose=False,
    )
    got_s, got_a, got_ap = make_ddim_sampling_parameters(
        sched.alphas_cumprod.astype(np.float64), ts, eta
    )
    np.testing.assert_allclose(got_s, np.asarray(want_s), rtol=1e-10)
    np.testing.assert_allclose(got_a, np.asarray(want_a), rtol=1e-10)
    np.testing.assert_allclose(got_ap, np.asarray(want_ap), rtol=1e-10)


def test_full_ddim_tables_match_reference_composition(ref):
    """End-to-end: our stacked reverse-order tables == composing the
    reference helpers the way DDIMSampler.make_schedule does."""
    from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule

    sched = DiffusionSchedule.create(1000)
    tables = sched.ddim_tables(30, eta=0.0)
    betas = ref.util.make_beta_schedule("linear", 1000, linear_start=1e-4,
                                        linear_end=2e-2)
    acp = np.cumprod(1.0 - np.asarray(betas))
    ts = ref.util.make_ddim_timesteps(ddim_discr_method="uniform",
                                      num_ddim_timesteps=30,
                                      num_ddpm_timesteps=1000, verbose=False)
    sig, al, alp = ref.util.make_ddim_sampling_parameters(
        alphacums=torch.from_numpy(acp), ddim_timesteps=ts, eta=0.0,
        verbose=False)
    np.testing.assert_array_equal(tables.timesteps, ts[::-1])
    np.testing.assert_allclose(tables.alphas, np.asarray(al)[::-1], rtol=1e-5)
    np.testing.assert_allclose(tables.alphas_prev, np.asarray(alp)[::-1], rtol=1e-5)
    # tables are stored float32; 1e-4 covers fp32 rounding of the sqrt
    np.testing.assert_allclose(
        tables.sqrt_one_minus_alphas, np.sqrt(1 - np.asarray(al))[::-1], rtol=1e-4
    )


# --- cast_num_frames (dataset/data_utils.py:21-31) ---


@pytest.mark.parametrize("f_in,f_out", [(20, 12), (16, 12), (12, 12), (7, 12)])
def test_cast_num_frames_matches_reference(ref, f_in, f_out):
    from seervideoldm_tpu.data.transforms import cast_num_frames

    rng = np.random.RandomState(0)
    video = rng.rand(f_in, 10, 8, 3).astype(np.float32)  # ours: (f, h, w, c)
    got = cast_num_frames(video, f_out)
    # reference layout: (c, f, h, w)
    t = torch.from_numpy(video.transpose(3, 0, 1, 2))
    want = ref.data_utils.cast_num_frames(t, frames=f_out).numpy()
    np.testing.assert_allclose(
        got.transpose(3, 0, 1, 2), want, atol=1e-6, rtol=1e-5
    )


# --- FVD math (utils/fvd.py:55-122) ---


def test_frechet_distance_matches_reference(ref):
    from seervideoldm_tpu.evaluation.fvd import frechet_distance

    rng = np.random.RandomState(1)
    x = rng.randn(64, 40).astype(np.float64)
    y = (rng.randn(64, 40) * 1.5 + 0.3).astype(np.float64)
    want = float(ref.fvd.frechet_distance(torch.from_numpy(x.copy()),
                                          torch.from_numpy(y.copy())))
    got = frechet_distance(x, y)
    assert got == pytest.approx(want, rel=1e-4)


def test_polynomial_mmd_matches_reference(ref):
    from seervideoldm_tpu.evaluation.fvd import polynomial_mmd

    rng = np.random.RandomState(2)
    x = rng.randn(48, 32)
    y = rng.randn(56, 32) * 0.8 + 0.2
    want = float(ref.fvd.polynomial_mmd(x, y))
    got = polynomial_mmd(x, y)
    assert got == pytest.approx(want, rel=1e-8)


def test_fvd_preprocess_matches_reference(ref):
    """VideoGPT resize-shorter-side-to-R + center crop + [-1,1] scaling."""
    from seervideoldm_tpu.evaluation.fvd import preprocess_videos

    rng = np.random.RandomState(3)
    videos = rng.randint(0, 255, (2, 3, 30, 44, 3), dtype=np.uint8)
    got = preprocess_videos(videos, resolution=24)  # (b,t,24,24,c)
    for b in range(videos.shape[0]):
        # preprocess_single -> CTHW in [-0.5, 0.5]; preprocess() then *2
        want = 2.0 * ref.fvd.preprocess_single(
            torch.from_numpy(videos[b]), resolution=24
        ).numpy()
        got_b = got[b].transpose(3, 0, 1, 2)  # (c, t, h, w)
        np.testing.assert_allclose(got_b, want, atol=2e-2)


def test_c3d_resize_matches_align_corners_bilinear(ref):
    """The C3D IS preprocessing resize must be align_corners=True bilinear
    with no antialiasing — chainer F.resize_images semantics
    (reference c3d.py:161-166)."""
    from seervideoldm_tpu.evaluation.c3d import _resize_bilinear_align_corners

    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    x = rng.rand(1, 2, 20, 26, 3).astype(np.float32)
    got = np.asarray(_resize_bilinear_align_corners(jnp.asarray(x), 112, 112))
    xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3).reshape(2, 3, 20, 26))
    want = torch.nn.functional.interpolate(
        xt, size=(112, 112), mode="bilinear", align_corners=True
    ).numpy().reshape(1, 2, 3, 112, 112).transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)
