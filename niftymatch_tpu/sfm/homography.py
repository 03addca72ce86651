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
from .triangulation import PoseRecovery, depths, triangulate_dlt


@f32
def decompose_homography(H: jnp.ndarray):
    """Decompose a calibrated homography into candidate (R, t_dir, n).

    ``H`` maps normalized coords of view A to view B: x_b ~ H x_a, with
    ``H = R + t n^T / d`` (plane n.x = d in A's frame).  Returns stacked
    candidates (4, 3, 3), (4, 3), (4, 3): four (eps1, eps3) sign choices;
    callers should also try -t (plane-side ambiguity) during cheirality.
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
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ns)


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
    eye34 = jnp.concatenate(
        [jnp.eye(3, dtype=H.dtype), jnp.zeros((3, 1), H.dtype)], -1
    )

    def hypo(R, t):
        tn = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        T_b = jnp.concatenate([R, tn[..., None]], axis=-1)
        pts = triangulate_dlt(eye34, T_b, pts_a, pts_b)
        good = (depths(eye34, pts) > 0) & (depths(T_b, pts) > 0) & mask
        return tn, pts, good, jnp.sum(good.astype(jnp.int32))

    cands = []
    for k in range(4):
        cands.append(hypo(Rs[k], ts[k]))
        cands.append(hypo(Rs[k], -ts[k]))
    counts = jnp.stack([c[3] for c in cands])
    best = jnp.argmax(counts)
    R = jnp.stack([Rs[k // 2] for k in range(8)])[best]
    t = jnp.stack([c[0] for c in cands])[best]
    pts = jnp.stack([c[1] for c in cands])[best]
    good = jnp.stack([c[2] for c in cands])[best]
    return PoseRecovery(R=R, t=t, points=pts, cheirality=good, num_good=counts[best])
