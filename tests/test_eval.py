"""Evaluation math tests: Fréchet distance on synthetic Gaussians, MMD vs
sklearn, preprocess shapes, I3D/C3D forward shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.evaluation.fvd import (
    frechet_distance,
    polynomial_mmd,
    preprocess_videos,
)


def test_frechet_identical_is_zero():
    x = np.random.RandomState(0).randn(200, 16)
    assert abs(frechet_distance(x, x)) < 1e-8


def test_frechet_mean_shift_closed_form():
    """For equal covariance, FD = ||m1 - m2||^2."""
    rng = np.random.RandomState(1)
    x = rng.randn(200000, 4)
    shift = np.array([1.0, -2.0, 0.5, 0.0])
    fd = frechet_distance(x, x + shift)
    assert abs(fd - np.sum(shift**2)) < 0.05


def test_frechet_variance_closed_form():
    """1-D Gaussians: FD = (m1-m2)^2 + (s1-s2)^2."""
    rng = np.random.RandomState(2)
    n = 500000
    x = (rng.randn(n, 1) * 1.0).astype(np.float64)
    y = (rng.randn(n, 1) * 3.0).astype(np.float64)
    fd = frechet_distance(x, y)
    assert abs(fd - (3.0 - 1.0) ** 2) < 0.05


def test_polynomial_mmd_matches_sklearn():
    from sklearn.metrics.pairwise import polynomial_kernel

    rng = np.random.RandomState(3)
    x = rng.randn(50, 8)
    y = rng.randn(60, 8)
    got = polynomial_mmd(x, y)
    k_xx = polynomial_kernel(x)
    k_yy = polynomial_kernel(y)
    k_xy = polynomial_kernel(x, y)
    m, n = 50, 60
    want = (
        (k_xx.sum() - np.diagonal(k_xx).sum()) / (m * (m - 1))
        + (k_yy.sum() - np.diagonal(k_yy).sum()) / (n * (n - 1))
        - 2 * k_xy.sum() / (m * n)
    )
    assert abs(got - want) < 1e-9


def test_preprocess_videos_shapes_and_range():
    vids = (np.random.RandomState(4).rand(2, 3, 64, 96, 3) * 255).astype(np.uint8)
    out = preprocess_videos(vids, resolution=32)
    assert out.shape == (2, 3, 32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_i3d_forward_shape():
    from seervideoldm_tpu.evaluation.i3d import InceptionI3d

    i3d = InceptionI3d()
    # abstract-only: shapes/param-count via eval_shape, zero compile/compute
    # (the 224px numeric path is covered by the FVD golden-parity tests;
    # suite budget, VERDICT r2 #7)
    x = jax.ShapeDtypeStruct((1, 8, 224, 224, 3), jnp.float32)
    params = jax.eval_shape(i3d.init, jax.random.PRNGKey(0), x)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_params > 12_000_000  # I3D Kinetics-400 has ~12.7M params
    out = jax.eval_shape(i3d.apply, params, x)
    assert out.shape == (1, 400)


def test_c3d_forward_shape():
    # abstract-shape only (~30 s of 1-core compile saved; the numeric C3D
    # forward runs in the eval.py IS e2e test, test_entry_scripts.py)
    from seervideoldm_tpu.evaluation.c3d import C3D

    c3d = C3D()
    x = jax.ShapeDtypeStruct((1, 16, 112, 112, 3), jnp.float32)
    params = jax.eval_shape(c3d.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(c3d.apply, params, x)
    assert out.shape == (1, 101)


def test_inception_score_uniform_is_one():
    from seervideoldm_tpu.evaluation.inception_score import inception_score

    # constant logits -> uniform softmax -> IS == 1
    classify = lambda v: np.zeros((len(v), 101))  # noqa: E731
    samples = np.zeros((30, 16, 8, 8, 3), dtype=np.float32)
    mean, std, stack = inception_score(classify, samples, batchsize=10, splits=3)
    assert abs(mean - 1.0) < 1e-6


def test_inception_score_confident_classifier():
    from seervideoldm_tpu.evaluation.inception_score import inception_score

    # each sample strongly predicts a distinct class -> IS ~= num classes used
    def classify(v):
        n = len(v)
        logits = np.full((n, 101), -20.0)
        for i in range(n):
            logits[i, i % 10] = 20.0
        return logits

    samples = np.zeros((100, 16, 8, 8, 3), dtype=np.float32)
    mean, std, _ = inception_score(classify, samples, batchsize=100, splits=1)
    assert abs(mean - 10.0) < 0.5
