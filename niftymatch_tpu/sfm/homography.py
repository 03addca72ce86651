"""Calibrated homography decomposition and planar pose recovery.

Quasi-planar scenes make the essential matrix unrecoverable (the 8-point
system develops a 2-D null space and a one-parameter family of E's explains
the data).  Production SLAM front-ends therefore run BOTH models and pick
per-pair (ORB-SLAM's H/F selection); when the homography wins, relative
pose comes from its decomposition ``H = R + t n^T / d``.

This module implements the Faugeras/Malis SVD decomposition, branchless and
batched: 4 sign candidates x {+t, -t}, resolved by cheirality voting with
the same triangulation machinery as ``recover_pose``.  The near-pure-
rotation case (all singular values equal) falls out naturally (t -> 0).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.linalg import svd3x3
from ..utils.precision import f32
from .triangulation import PoseRecovery, _vote_cheirality


@f32
def decompose_homography(H: jnp.ndarray):
    """Decompose a calibrated homography into candidate (R, t_dir, n).

    ``H`` maps normalized coords of view A to view B: x_b ~ H x_a, with
    ``H = R + t n^T / d`` (plane n.x = d in A's frame).  Returns stacked
    candidates (..., 4, 3, 3), (..., 4, 3), (..., 4, 3): four (eps1, eps3)
    sign choices; callers should also try -t (plane-side ambiguity) during
    cheirality.
    """
    U, S, Vt = svd3x3(H)
    d1, d2, d3 = S[..., 0], S[..., 1], S[..., 2]
    # Scale so the middle singular value is 1.
    d1 = d1 / jnp.maximum(d2, 1e-12)
    d3 = d3 / jnp.maximum(d2, 1e-12)
    s = jnp.linalg.det(U) * jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1m = jnp.sqrt(jnp.clip((d1 * d1 - 1.0) / denom, 0.0, None))
    x3m = jnp.sqrt(jnp.clip((1.0 - d3 * d3) / denom, 0.0, None))

    Rs, ts, ns = [], [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            x1 = e1 * x1m
            x3 = e3 * x3m
            sin_t = (d1 - d3) * x1 * x3
            cos_t = d1 * x3 * x3 + d3 * x1 * x1
            # Normalise the (cos, sin) pair (guards d2-scaling drift).
            nrm = jnp.maximum(jnp.sqrt(sin_t**2 + cos_t**2), 1e-12)
            sin_t = sin_t / nrm
            cos_t = cos_t / nrm
            zero = jnp.zeros_like(cos_t)
            one = jnp.ones_like(cos_t)
            Rp = jnp.stack(
                [
                    jnp.stack([cos_t, zero, -sin_t], -1),
                    jnp.stack([zero, one, zero], -1),
                    jnp.stack([sin_t, zero, cos_t], -1),
                ],
                -2,
            )
            tp = jnp.stack([(d1 - d3) * x1, zero, -(d1 - d3) * x3], -1)
            np_ = jnp.stack([x1, zero, x3], -1)
            R = s[..., None, None] * (U @ Rp @ Vt)
            t = (U @ tp[..., None])[..., 0]
            n = (jnp.swapaxes(Vt, -1, -2) @ np_[..., None])[..., 0]
            Rs.append(R)
            ts.append(t)
            ns.append(n)
    # Candidate axis goes BEFORE the matrix/vector dims (axis -3 / -2) so
    # the decomposition stays batch-polymorphic under leading batch dims.
    return (jnp.stack(Rs, axis=-3), jnp.stack(ts, axis=-2),
            jnp.stack(ns, axis=-2))


@f32
def recover_pose_homography(
    H: jnp.ndarray,
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
    mask: jnp.ndarray,
) -> PoseRecovery:
    """Cheirality-voted (R, t) from a calibrated homography.

    Tries the 4 decomposition candidates and both translation signs; the
    winner maximises points with positive depth in both cameras (same
    voting pattern as ``recover_pose`` for E).  ``t`` is unit-normalised
    (the 1/d plane-depth scale is unobservable, like E's baseline)."""
    Rs, ts, _ = decompose_homography(H)
    # Both translation signs per decomposition candidate, all eight voted
    # through ONE batched triangulation (_vote_cheirality) — the previous
    # 8-way Python unroll compiled triangulate_dlt eight times per call
    # site (VERDICT r3 #4 compile-latency fix).
    tn = ts / jnp.maximum(
        jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12
    )
    R8 = jnp.concatenate([Rs, Rs], axis=-3)              # (..., 8, 3, 3)
    t8 = jnp.concatenate([tn, -tn], axis=-2)             # (..., 8, 3)
    return _vote_cheirality(R8, t8, pts_a, pts_b, mask)
