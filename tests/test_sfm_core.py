"""SE(3) and triangulation tests (numpy/scipy oracles + synthetic scenes)."""

import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.sfm.se3 import (
    hat,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_identity,
    se3_inverse,
    se3_log,
    se3_relative,
    so3_exp,
    so3_log,
)
from niftymatch_tpu.sfm.triangulation import (
    decompose_essential,
    recover_pose,
    reprojection_error,
    triangulate_dlt,
    triangulate_midpoint,
)
from niftymatch_tpu.geometry import fit_essential


def _rand_xi(rng, n, scale=1.0):
    xi = rng.normal(size=(n, 6)).astype(np.float32) * scale
    return jnp.asarray(xi)


def test_so3_exp_log_roundtrip(rng):
    phi = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    phi = phi / jnp.maximum(jnp.linalg.norm(phi, axis=-1, keepdims=True), 1e-9)
    phi = phi * jnp.asarray(
        rng.uniform(1e-6, 3.0, size=(32, 1)).astype(np.float32)
    )
    R = so3_exp(phi)
    # Orthonormality
    RtR = np.asarray(jnp.swapaxes(R, -1, -2) @ R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    back = np.asarray(so3_log(R))
    np.testing.assert_allclose(back, np.asarray(phi), atol=1e-3)


def test_so3_small_angle():
    phi = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], jnp.float32)
    R = so3_exp(phi)
    np.testing.assert_allclose(
        np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(so3_log(R)), np.zeros((2, 3)), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = _rand_xi(rng, 24, 0.8)
    T = se3_exp(xi)
    back = np.asarray(se3_log(T))
    np.testing.assert_allclose(back, np.asarray(xi), atol=2e-3)


def test_se3_group_ops(rng):
    xi = _rand_xi(rng, 8, 0.5)
    T = se3_exp(xi)
    Tinv = se3_inverse(T)
    I = np.asarray(se3_compose(T, Tinv))
    np.testing.assert_allclose(
        I, np.asarray(se3_identity((8,))), atol=1e-5
    )
    # compose/apply consistency
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(8, 10, 3)).astype(np.float32))
    a = se3_apply(se3_compose(T, Tinv), pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(pts), atol=1e-4)
    # relative: T_ab composed onto Ta gives Tb
    Tb = se3_exp(_rand_xi(rng, 8, 0.5))
    Tab = se3_relative(T, Tb)
    np.testing.assert_allclose(
        np.asarray(se3_compose(T, Tab)), np.asarray(Tb), atol=1e-4
    )


def test_hat_antisymmetric(rng):
    v = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    K = np.asarray(hat(v))
    np.testing.assert_allclose(K, -np.swapaxes(K, -1, -2), atol=0)
    # hat(v) w = v x w
    w = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", K, w), np.cross(np.asarray(v), w), atol=1e-6
    )


def _two_view_scene(rng, n=80):
    theta = 0.15
    R = np.array(
        [
            [np.cos(theta), 0, np.sin(theta)],
            [0, 1, 0],
            [-np.sin(theta), 0, np.cos(theta)],
        ],
        np.float32,
    )
    t = np.array([0.8, 0.1, 0.05], np.float32)
    pts3 = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    pts3[:, 2] += 6.0
    x1 = pts3[:, :2] / pts3[:, 2:3]
    p2 = pts3 @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:3]
    T_a = np.concatenate([np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)], 1)
    T_b = np.concatenate([R, t[:, None]], 1)
    return T_a, T_b, pts3, x1, x2, R, t


def test_triangulation_recovers_points(rng):
    T_a, T_b, pts3, x1, x2, _, _ = _two_view_scene(rng)
    for tri in (triangulate_midpoint, triangulate_dlt):
        rec = np.asarray(
            tri(jnp.asarray(T_a), jnp.asarray(T_b), jnp.asarray(x1), jnp.asarray(x2))
        )
        np.testing.assert_allclose(rec, pts3, atol=5e-2)
        err = np.asarray(
            reprojection_error(jnp.asarray(T_b), jnp.asarray(rec), jnp.asarray(x2))
        )
        assert err.max() < 1e-4


def test_decompose_essential_contains_truth(rng):
    T_a, T_b, pts3, x1, x2, R_true, t_true = _two_view_scene(rng)
    E = fit_essential(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones((x1.shape[0],), jnp.float32)
    )
    R1, R2, t = decompose_essential(E)
    t_unit = t_true / np.linalg.norm(t_true)
    found_R = min(
        np.abs(np.asarray(R1) - R_true).max(), np.abs(np.asarray(R2) - R_true).max()
    )
    found_t = min(
        np.abs(np.asarray(t) - t_unit).max(), np.abs(-np.asarray(t) - t_unit).max()
    )
    assert found_R < 5e-3
    assert found_t < 5e-3


def test_recover_pose_cheirality(rng):
    T_a, T_b, pts3, x1, x2, R_true, t_true = _two_view_scene(rng)
    n = x1.shape[0]
    E = fit_essential(jnp.asarray(x1), jnp.asarray(x2), jnp.ones((n,), jnp.float32))
    rec = recover_pose(E, jnp.asarray(x1), jnp.asarray(x2), jnp.ones((n,), bool))
    assert int(rec.num_good) >= n - 2
    np.testing.assert_allclose(np.asarray(rec.R), R_true, atol=5e-3)
    t_unit = t_true / np.linalg.norm(t_true)
    np.testing.assert_allclose(np.asarray(rec.t), t_unit, atol=5e-3)
    # Triangulated points match up to the global scale ||t_true||
    scale = np.linalg.norm(t_true)
    np.testing.assert_allclose(np.asarray(rec.points) * scale, pts3, atol=0.1)
    # Regression (ADVICE r4 high): cheirality must be BOOL — an int32
    # 0/1 array silently turns downstream numpy masking (system.py
    # _scale_vs_unit / _resolve_scale) into integer fancy-indexing.
    assert np.asarray(rec.cheirality).dtype == np.bool_
