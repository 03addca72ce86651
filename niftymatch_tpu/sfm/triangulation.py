"""Batched two-view triangulation and essential-matrix pose recovery.

New capability (SURVEY.md §7 M2/M4: "triangulation ... essential matrix for
SLAM"); the reference has no 3-D layer.  All functions are fixed-shape,
mask-aware and vmap over correspondence sets.

Conventions: camera poses are world->camera Rt (3, 4) as in ``se3.py``;
image points are *normalised camera coordinates* (x, y) = (X/Z, Y/Z) unless
a K matrix is explicitly involved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32

from ..geometry.linalg import smallest_eigvec
from .se3 import se3_apply


@f32
def triangulate_midpoint(
    T_a: jnp.ndarray,
    T_b: jnp.ndarray,
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
) -> jnp.ndarray:
    """Midpoint triangulation of (N, 2) normalized correspondences.

    Fast closed form; good conditioning for well-separated rays."""
    # Camera centers and ray directions in world frame.
    Ra, ta = T_a[..., :3], T_a[..., 3]
    Rb, tb = T_b[..., :3], T_b[..., 3]
    Ca = -(jnp.swapaxes(Ra, -1, -2) @ ta[..., None])[..., 0]
    Cb = -(jnp.swapaxes(Rb, -1, -2) @ tb[..., None])[..., 0]
    da = jnp.concatenate([pts_a, jnp.ones_like(pts_a[..., :1])], axis=-1)
    db = jnp.concatenate([pts_b, jnp.ones_like(pts_b[..., :1])], axis=-1)
    da = da @ Ra  # R^T d : camera ray to world
    db = db @ Rb
    da = da / jnp.linalg.norm(da, axis=-1, keepdims=True)
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    # Solve for s, t minimizing ||Ca + s da - Cb - t db||
    w = Ca - Cb
    a = jnp.sum(da * da, axis=-1)
    b = jnp.sum(da * db, axis=-1)
    c = jnp.sum(db * db, axis=-1)
    d = jnp.sum(da * w, axis=-1)
    e = jnp.sum(db * w, axis=-1)
    denom = a * c - b * b
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    s = (b * e - c * d) / denom
    t = (a * e - b * d) / denom
    return 0.5 * (Ca + s[..., None] * da + Cb + t[..., None] * db)


@f32
def triangulate_dlt(
    T_a: jnp.ndarray,
    T_b: jnp.ndarray,
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
) -> jnp.ndarray:
    """Linear (DLT) triangulation: smallest eigenvector of the 4x4 normal
    matrix per correspondence (batched Jacobi, same machinery as the 2-D
    DLT solvers)."""
    rows = []
    for T, pts in ((T_a, pts_a), (T_b, pts_b)):
        P = T  # (3, 4) with identity intrinsics
        x, y = pts[..., 0], pts[..., 1]
        rows.append(x[..., None] * P[..., 2, :] - P[..., 0, :])
        rows.append(y[..., None] * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (N, 4, 4)
    M = jnp.swapaxes(A, -1, -2) @ A
    X = smallest_eigvec(M)
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    return X[..., :3] / w[..., None]


@f32
def reprojection_error(
    T: jnp.ndarray, pts3: jnp.ndarray, obs: jnp.ndarray
) -> jnp.ndarray:
    """Squared reprojection error (normalized coords) of (N, 3) points
    against (N, 2) observations under pose T."""
    pc = se3_apply(T, pts3)
    z = jnp.where(jnp.abs(pc[..., 2]) > 1e-9, pc[..., 2], 1e-9)
    proj = pc[..., :2] / z[..., None]
    d = proj - obs
    return jnp.sum(d * d, axis=-1)


@f32
def depths(T: jnp.ndarray, pts3: jnp.ndarray) -> jnp.ndarray:
    """Z-depth of world points in camera T."""
    return se3_apply(T, pts3)[..., 2]


class PoseRecovery(NamedTuple):
    R: jnp.ndarray          # (3, 3) rotation of the winning hypothesis
    t: jnp.ndarray          # (3,) unit translation
    points: jnp.ndarray     # (N, 3) triangulated points (winning hypothesis)
    cheirality: jnp.ndarray # (N,) bool both-camera positive depth
    num_good: jnp.ndarray   # () int32


@f32
def decompose_essential(E: jnp.ndarray):
    """E -> two rotations + unit translation (four (R, t) hypotheses).

    Uses the standard U W V^T construction with det corrections."""
    from ..geometry.linalg import svd3x3

    U, S, Vt = svd3x3(E)
    # Enforce proper rotations.
    dU = jnp.linalg.det(U)
    dV = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))
    U = U * jnp.stack([jnp.ones_like(dU), jnp.ones_like(dU), dU], -1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(dV), jnp.ones_like(dV), dV], -1)[..., :, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return R1, R2, t


@f32
def recover_pose(
    E: jnp.ndarray,
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
    mask: jnp.ndarray,
) -> PoseRecovery:
    """Cheirality-voted (R, t) from an essential matrix and inlier
    correspondences (normalized coords).  Convention: x_b ~ R x_a + t
    (camera A is the world frame)."""
    R1, R2, t = decompose_essential(E)
    # All four hypotheses ride one candidate axis through ONE triangulation
    # (the previous per-hypothesis Python unroll compiled triangulate_dlt
    # four times — seconds of XLA compile per call site, VERDICT r3 #4).
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)           # (..., 4, 3, 3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)             # (..., 4, 3)
    return _vote_cheirality(Rs, ts, pts_a, pts_b, mask)


@f32
def _vote_cheirality(
    Rs: jnp.ndarray,      # (..., K, 3, 3) candidate rotations
    ts: jnp.ndarray,      # (..., K, 3) candidate translations (unit)
    pts_a: jnp.ndarray,   # (..., N, 2)
    pts_b: jnp.ndarray,   # (..., N, 2)
    mask: jnp.ndarray,    # (..., N) bool
) -> PoseRecovery:
    """Triangulate every candidate (R, t) in one batched DLT and pick the
    one maximising both-camera positive depths.  Shared by essential and
    homography pose recovery."""
    k = Rs.shape[-3]
    n = pts_a.shape[-2]
    dtype = Rs.dtype
    eye34 = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], -1
    )
    T_b = jnp.concatenate([Rs, ts[..., None]], axis=-1)  # (..., K, 3, 4)
    T_b_e = T_b[..., :, None, :, :]                      # (..., K, 1, 3, 4)
    pa = jnp.broadcast_to(pts_a[..., None, :, :], (*Rs.shape[:-2], n, 2))
    pb = jnp.broadcast_to(pts_b[..., None, :, :], (*Rs.shape[:-2], n, 2))
    pts = triangulate_dlt(eye34, T_b_e, pa, pb)          # (..., K, N, 3)
    good = (
        (depths(eye34, pts) > 0)
        & (depths(T_b, pts) > 0)
        & mask[..., None, :]
    )
    counts = jnp.sum(good.astype(jnp.int32), axis=-1)    # (..., K)
    best = jnp.argmax(counts, axis=-1)
    # One-hot selection (a length-K gather compiles to a slow generic
    # gather at these batch shapes; K is tiny and static).
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, counts.shape, counts.ndim - 1)
        == best[..., None]
    )
    ohf = oh.astype(dtype)
    R = jnp.sum(ohf[..., None, None] * Rs, axis=-3)
    tt = jnp.sum(ohf[..., None] * ts, axis=-2)
    pts_w = jnp.sum(ohf[..., None, None] * pts, axis=-3)
    # any(), not sum(): a bool sum promotes to int32, and host code uses
    # cheirality as a numpy mask — an int32 0/1 array would silently turn
    # boolean masking into integer fancy-indexing (ADVICE r4 high).
    good_w = jnp.any(good & oh[..., None], axis=-2)
    num = jnp.sum(jnp.where(oh, counts, 0), axis=-1)
    return PoseRecovery(
        R=R, t=tt, points=pts_w, cheirality=good_w, num_good=num
    )
