"""Geometry layer tests: batched Jacobi linalg, transform solvers, RANSAC.

Oracles are numpy/np.linalg (the role the reference's GSL-derived SVD plays,
``src/gpu/kernels/svd.cu:26-27``) plus synthetic ground-truth transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.geometry import (
    align_points,
    apply_homography,
    fit_essential,
    fit_homography,
    fit_similarity,
    fit_translation,
    inv3x3,
    jacobi_eigh,
    ransac,
    sampson_sq_error,
    smallest_eigvec,
    solve3x3,
    svd3x3,
    transfer_sq_error,
)


# ---------------------------------------------------------------------------
# linalg
# ---------------------------------------------------------------------------

def test_jacobi_eigh_matches_numpy(rng):
    A = rng.normal(size=(16, 9, 9)).astype(np.float32)
    S = (A + np.swapaxes(A, -1, -2)) / 2
    w, V = jax.jit(jacobi_eigh)(jnp.asarray(S))
    w, V = np.asarray(w), np.asarray(V)
    w_ref = np.sort(np.linalg.eigvalsh(S), axis=-1)
    np.testing.assert_allclose(np.sort(w, axis=-1), w_ref, atol=1e-3)
    # Eigen equation A V = V diag(w)
    resid = S @ V - V * w[..., None, :]
    assert np.abs(resid).max() < 1e-3


def test_smallest_eigvec_null_space(rng):
    # Build PSD matrices with a known null vector.
    B = rng.normal(size=(8, 6, 9)).astype(np.float32)
    M = np.swapaxes(B, -1, -2) @ B  # rank <= 6 -> nontrivial null space
    v = np.asarray(smallest_eigvec(jnp.asarray(M)))
    # M v should be ~0
    Mv = np.einsum("bij,bj->bi", M, v)
    assert np.abs(Mv).max() < 1e-2
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)


def test_svd3x3(rng):
    E = rng.normal(size=(12, 3, 3)).astype(np.float32)
    U, S, Vt = svd3x3(jnp.asarray(E))
    U, S, Vt = np.asarray(U), np.asarray(S), np.asarray(Vt)
    recon = U @ (S[..., :, None] * Vt)
    np.testing.assert_allclose(recon, E, atol=2e-3)
    s_ref = np.linalg.svd(E, compute_uv=False)
    np.testing.assert_allclose(S, s_ref, atol=2e-3)


def test_solve3x3_and_inv(rng):
    A = rng.normal(size=(10, 3, 3)).astype(np.float32) + 3 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(10, 3)).astype(np.float32)
    x = np.asarray(solve3x3(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("bij,bj->bi", A, x), b, atol=1e-3)
    Ainv = np.asarray(inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(A @ Ainv, np.broadcast_to(np.eye(3), A.shape), atol=1e-3)


# ---------------------------------------------------------------------------
# solvers
# ---------------------------------------------------------------------------

def _random_homography(rng):
    H = np.eye(3) + 0.1 * rng.normal(size=(3, 3))
    H[2, 2] = 1.0
    return H.astype(np.float32)


def test_fit_translation(rng):
    src = rng.uniform(0, 100, size=(20, 2)).astype(np.float32)
    t = np.array([5.0, -3.0], np.float32)
    dst = src + t
    w = np.ones(20, np.float32)
    H = np.asarray(fit_translation(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(H[:2, 2], t, atol=1e-4)
    np.testing.assert_allclose(H[:2, :2], np.eye(2), atol=1e-6)


def test_fit_similarity_exact(rng):
    theta, s = 0.3, 1.4
    R = s * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([10.0, -4.0])
    src = rng.uniform(0, 100, size=(30, 2))
    dst = src @ R.T + t
    w = np.ones(30, np.float32)
    H = np.asarray(
        fit_similarity(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), jnp.asarray(w)
        )
    )
    np.testing.assert_allclose(H[:2, :2], R, atol=1e-3)
    np.testing.assert_allclose(H[:2, 2], t, atol=1e-2)


def test_fit_similarity_minimal_two_points(rng):
    theta, s = -0.7, 0.8
    R = s * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([1.0, 2.0])
    src = np.array([[0.0, 0.0], [10.0, 5.0]])
    dst = src @ R.T + t
    w = np.ones(2, np.float32)
    H = np.asarray(
        fit_similarity(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), jnp.asarray(w)
        )
    )
    proj = np.asarray(
        apply_homography(jnp.asarray(H), jnp.asarray(src, jnp.float32))
    )
    np.testing.assert_allclose(proj, dst, atol=1e-3)


def test_fit_homography_exact(rng):
    H_true = _random_homography(rng)
    src = rng.uniform(0, 200, size=(40, 2)).astype(np.float32)
    dst = np.asarray(apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
    w = np.ones(40, np.float32)
    H = np.asarray(fit_homography(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    err = np.asarray(
        transfer_sq_error(jnp.asarray(H), jnp.asarray(src), jnp.asarray(dst))
    )
    assert err.max() < 1e-2
    np.testing.assert_allclose(H / H[2, 2], H_true, atol=5e-3)


def test_fit_homography_weighted_ignores_outliers(rng):
    H_true = _random_homography(rng)
    src = rng.uniform(0, 200, size=(40, 2)).astype(np.float32)
    dst = np.array(apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
    dst[30:] += rng.uniform(50, 100, size=(10, 2)).astype(np.float32)
    w = np.ones(40, np.float32)
    w[30:] = 0.0
    H = np.asarray(fit_homography(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(H / H[2, 2], H_true, atol=5e-3)


def test_fit_essential_epipolar_constraint(rng):
    # Synthetic two-view: R, t with normalized camera coords.
    theta = 0.2
    R = np.array(
        [
            [np.cos(theta), 0, np.sin(theta)],
            [0, 1, 0],
            [-np.sin(theta), 0, np.cos(theta)],
        ]
    )
    t = np.array([1.0, 0.2, 0.1])
    t /= np.linalg.norm(t)
    pts3 = rng.uniform(-1, 1, size=(60, 3))
    pts3[:, 2] += 4.0
    x1 = pts3[:, :2] / pts3[:, 2:3]
    p2 = pts3 @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:3]
    w = np.ones(60, np.float32)
    E = np.asarray(
        fit_essential(
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), jnp.asarray(w)
        )
    )
    # Epipolar constraint x2_h^T E x1_h ~ 0
    x1h = np.concatenate([x1, np.ones((60, 1))], axis=1)
    x2h = np.concatenate([x2, np.ones((60, 1))], axis=1)
    resid = np.einsum("ni,ij,nj->n", x2h, E, x1h)
    assert np.abs(resid).max() < 1e-3
    errs = np.asarray(
        sampson_sq_error(jnp.asarray(E), jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32))
    )
    assert errs.max() < 1e-5


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------

def test_align_points():
    xa = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    ya = jnp.asarray([10.0, 11.0, 12.0, 13.0])
    xb = jnp.asarray([5.0, 6.0, 7.0])
    yb = jnp.asarray([20.0, 21.0, 22.0])
    idx = jnp.asarray([2, -1, 0, 1])
    src, dst, mask = align_points(xa, ya, xb, yb, idx)
    np.testing.assert_array_equal(np.asarray(mask), [True, False, True, True])
    np.testing.assert_allclose(np.asarray(src)[0], [0.0, 10.0])
    np.testing.assert_allclose(np.asarray(dst)[0], [7.0, 22.0])
    np.testing.assert_allclose(np.asarray(dst)[1], [0.0, 0.0])  # masked row zeroed


@pytest.mark.parametrize("model", ["translation", "similarity", "homography"])
def test_ransac_recovers_transform_with_outliers(rng, model):
    if model == "translation":
        H_true = np.eye(3, dtype=np.float32)
        H_true[:2, 2] = [7.0, -2.0]
    elif model == "similarity":
        th, s = 0.25, 1.1
        H_true = np.array(
            [
                [s * np.cos(th), -s * np.sin(th), 4.0],
                [s * np.sin(th), s * np.cos(th), -6.0],
                [0, 0, 1],
            ],
            np.float32,
        )
    else:
        H_true = _random_homography(rng)
    N = 256
    src = rng.uniform(0, 300, size=(N, 2)).astype(np.float32)
    dst = np.array(apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
    n_out = N // 3
    dst[:n_out] = rng.uniform(0, 300, size=(n_out, 2)).astype(np.float32)
    mask = np.ones(N, bool)
    mask[-8:] = False  # some invalid slots too

    res = jax.jit(
        lambda s, d, m: ransac(
            s, d, m, RansacConfig(iterations=512, inlier_threshold=4.0), model=model
        )
    )(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask))
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    # All true inliers (excluding invalid slots) should be recovered.
    true_inl = np.ones(N, bool)
    true_inl[:n_out] = False
    true_inl[-8:] = False
    assert (inl & ~true_inl).sum() <= 5  # few false positives
    assert (true_inl & inl).sum() >= true_inl.sum() * 0.95
    err = np.asarray(
        transfer_sq_error(res.transform, jnp.asarray(src), jnp.asarray(dst))
    )[true_inl]
    assert np.median(err) < 1.0


@pytest.mark.slow
def test_ransac_too_few_points_fails_gracefully(rng):
    src = jnp.zeros((16, 2), jnp.float32)
    dst = jnp.zeros((16, 2), jnp.float32)
    mask = jnp.zeros((16,), bool).at[0].set(True)
    res = ransac(src, dst, mask, RansacConfig(iterations=32), model="homography")
    assert not bool(res.success)


@pytest.mark.slow
def test_ransac_deterministic(rng):
    H_true = _random_homography(rng)
    src = rng.uniform(0, 300, size=(64, 2)).astype(np.float32)
    dst = np.asarray(apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
    mask = np.ones(64, bool)
    cfg = RansacConfig(iterations=128, seed=7)
    r1 = ransac(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask), cfg)
    r2 = ransac(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask), cfg)
    np.testing.assert_array_equal(np.asarray(r1.transform), np.asarray(r2.transform))
