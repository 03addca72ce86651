"""Nister 5-point minimal essential solver tests.

Validates the TPU-native pipeline (9x9 Jacobi null space -> numeric monomial
expansion -> Gauss-Jordan -> Durand-Kerner roots -> linear (x, y) recovery)
against synthetic exact two-view geometry, and the RANSAC-level claim that
motivates it: the 5-point minimal sample reaches the 8-point inlier set with
several times fewer iterations on contaminated matches
(``/root/reference/src/gpu/kernels/ransac.cu:637-694`` minimal-k philosophy).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.geometry.fivepoint import essential_from_five
from niftymatch_tpu.geometry.ransac import ransac


def _two_view(rng, n, theta=0.25, noise=0.0):
    """Exact synthetic two-view correspondences in normalised coords."""
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    pts3 = rng.uniform(-1, 1, size=(n, 3))
    pts3[:, 2] += 4.0
    x1 = pts3[:, :2] / pts3[:, 2:3]
    p2 = pts3 @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:3]
    if noise:
        x1 = x1 + rng.normal(0, noise, x1.shape)
        x2 = x2 + rng.normal(0, noise, x2.shape)
    E = K_hat(t) @ R
    return (
        x1.astype(np.float32),
        x2.astype(np.float32),
        E / np.linalg.norm(E),
    )


def K_hat(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
    )


@pytest.mark.slow
def test_five_point_recovers_exact_essential():
    hits = 0
    for seed in range(20):
        rng = np.random.default_rng(seed)
        x1, x2, E_true = _two_view(rng, 5)
        E, valid = essential_from_five(jnp.asarray(x1), jnp.asarray(x2))
        E, valid = np.asarray(E), np.asarray(valid)
        assert valid.any()
        diffs = [
            min(np.abs(e - E_true).max(), np.abs(e + E_true).max())
            for e, v in zip(E, valid)
            if v
        ]
        if min(diffs) < 2e-2:
            hits += 1
    # fp32 + fixed-iteration root finding: a small per-sample failure rate
    # is expected and harmless under RANSAC scoring.
    assert hits >= 16


def test_five_point_candidates_satisfy_epipolar():
    rng = np.random.default_rng(7)
    x1, x2, _ = _two_view(rng, 5)
    E, valid = essential_from_five(jnp.asarray(x1), jnp.asarray(x2))
    E, valid = np.asarray(E), np.asarray(valid)
    h1 = np.concatenate([x1, np.ones((5, 1), np.float32)], axis=1)
    h2 = np.concatenate([x2, np.ones((5, 1), np.float32)], axis=1)
    best = np.inf
    for e, v in zip(E, valid):
        if not v:
            continue
        resid = np.abs(np.einsum("ni,ij,nj->n", h2, e, h1)).max()
        best = min(best, resid)
    # All five minimal points lie on the epipolar constraint.
    assert best < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("outlier_frac", [0.4])
def test_ransac_essential5_fewer_iterations(outlier_frac):
    """Same-seed RANSAC: 5-point at I/4 iterations reaches (>=) the 8-point
    inlier set at I iterations on contaminated matches (VERDICT item 5)."""
    rng = np.random.default_rng(11)
    n = 200
    x1, x2, _ = _two_view(rng, n, noise=1e-4)
    n_out = int(outlier_frac * n)
    idx = rng.choice(n, n_out, replace=False)
    x2[idx] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
    mask = jnp.ones(n, bool)
    src, dst = jnp.asarray(x1), jnp.asarray(x2)
    thr = 1e-5

    cfg8 = RansacConfig(iterations=512, inlier_threshold=thr, seed=0)
    cfg5 = RansacConfig(iterations=128, inlier_threshold=thr, seed=0)
    res8 = ransac(src, dst, mask, cfg8, model="essential")
    res5 = ransac(src, dst, mask, cfg5, model="essential5")
    n8, n5 = int(res8.num_inliers), int(res5.num_inliers)
    true_inliers = n - n_out
    assert bool(res5.success)
    # 5-point at quarter budget matches the 8-point result and finds
    # (nearly) the whole uncontaminated set.
    assert n5 >= min(n8, true_inliers) - 5
    assert n5 >= int(0.9 * true_inliers)
