"""SLAM front-end: two-view geometry estimation between keyframes.

Composes the NiftyMatch-equivalent front-end (detect -> match, SURVEY.md
§3.1-3.2) with the new epipolar layer: essential-matrix RANSAC on
calibration-normalised correspondences, cheirality-voted pose recovery and
triangulation.  One jittable function per pair — the per-frame unit of the
sequential SLAM loop (BASELINE config 2).

Intrinsics are passed as a static (fx, fy, cx, cy) tuple: they are
per-dataset constants, and keeping them static lets the pixel-space RANSAC
threshold fold into the compiled program.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..config import RansacConfig
from ..features import Features
from ..geometry.ransac import align_points, ransac
from ..ops.match import MatchResult
from ..sfm.triangulation import depths, recover_pose, triangulate_dlt
from ..sift import match_pair


class TwoViewResult(NamedTuple):
    """Fixed-shape two-view estimate between frames A and B.

    ``(R, t)`` is the pose of camera B with A as the world frame
    (x_b = R x_a + t, unit-norm t).  ``points`` are triangulated in A's
    frame at that unit scale."""

    matches: MatchResult
    E: jnp.ndarray             # (3, 3) essential matrix
    inliers: jnp.ndarray       # (N,) bool over A's feature slots
    num_inliers: jnp.ndarray   # () int32
    R: jnp.ndarray             # (3, 3)
    t: jnp.ndarray             # (3,) unit translation
    points: jnp.ndarray        # (N, 3) triangulated points in A's frame
    point_valid: jnp.ndarray   # (N,) bool (inlier & cheirality)
    success: jnp.ndarray       # () bool


def normalize_points(
    pts: jnp.ndarray, intrinsics: Sequence[float]
) -> jnp.ndarray:
    """Pixel -> normalized camera coords with static (fx, fy, cx, cy)."""
    fx, fy, cx, cy = intrinsics
    return jnp.stack(
        [(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], axis=-1
    )


def estimate_two_view(
    feats_a: Features,
    feats_b: Features,
    intrinsics: tuple[float, float, float, float],
    ransac_config: RansacConfig = RansacConfig(inlier_threshold=4.0),
    ambiguity: float = 0.7,
    mutual: bool = True,
    key: jax.Array | None = None,
) -> TwoViewResult:
    """Match two feature sets and estimate relative pose via E-RANSAC.

    ``ransac_config.inlier_threshold`` is a squared *pixel* threshold; it is
    statically rescaled to the normalised-coordinate Sampson error.
    ``mutual=True`` cross-checks matches in both directions before RANSAC
    (markedly higher inlier fraction; the 8-point minimal sample needs it)."""
    m = match_pair(feats_a, feats_b, ambiguity=ambiguity)
    if mutual:
        from ..ops.match import mutual_matches

        bwd = match_pair(feats_b, feats_a, ambiguity=ambiguity)
        m = m._replace(indices=mutual_matches(m, bwd))
    src, dst, mask = align_points(
        feats_a.x, feats_a.y, feats_b.x, feats_b.y, m.indices, feats_a.valid
    )
    srcn = normalize_points(src, intrinsics)
    dstn = normalize_points(dst, intrinsics)
    f_mean = 0.5 * (float(intrinsics[0]) + float(intrinsics[1]))
    cfg = RansacConfig(
        iterations=ransac_config.iterations,
        inlier_threshold=ransac_config.inlier_threshold / (f_mean * f_mean),
        seed=ransac_config.seed,
    )
    res = ransac(srcn, dstn, mask, cfg, model="essential", key=key)
    inliers = res.inliers
    rec = recover_pose(res.transform, srcn, dstn, inliers)

    # Nonlinear polish: GN on the 5-DoF (R, t) manifold over the inliers —
    # the minimal-sample E carries pixel noise; algebraic refits are
    # unreliable (see sfm/two_view_refine.py).
    from ..geometry.transforms import sampson_sq_error
    from ..sfm.se3 import hat
    from ..sfm.two_view_refine import refine_relative_pose

    R, t, _ = refine_relative_pose(
        rec.R, rec.t, srcn, dstn, inliers.astype(jnp.float32)
    )
    E = hat(t) @ R
    err = sampson_sq_error(E, srcn, dstn)
    inl2 = (err < cfg.inlier_threshold) & mask
    better = jnp.sum(inl2) >= jnp.sum(inliers)
    E = jnp.where(better, E, res.transform)
    inliers = jnp.where(better, inl2, inliers)
    rec2 = recover_pose(E, srcn, dstn, inliers)
    num = jnp.sum(inliers.astype(jnp.int32))
    success = res.success & (rec2.num_good >= (num // 2)) & (num >= 8)
    return TwoViewResult(
        matches=m,
        E=E,
        inliers=inliers,
        num_inliers=num,
        R=rec2.R,
        t=rec2.t,
        points=rec2.points,
        point_valid=rec2.cheirality & inliers,
        success=success,
    )


def triangulate_in_world(
    T_wa: jnp.ndarray,
    T_wb: jnp.ndarray,
    feats_a: Features,
    feats_b: Features,
    m: MatchResult,
    intrinsics: tuple[float, float, float, float],
):
    """Triangulate matched features given *world* poses of both cameras.

    Returns ((N, 3) world points, (N,) bool valid) aligned to A's slots."""
    src, dst, mask = align_points(
        feats_a.x, feats_a.y, feats_b.x, feats_b.y, m.indices, feats_a.valid
    )
    srcn = normalize_points(src, intrinsics)
    dstn = normalize_points(dst, intrinsics)
    pts = triangulate_dlt(T_wa, T_wb, srcn, dstn)
    valid = mask & (depths(T_wa, pts) > 1e-3) & (depths(T_wb, pts) > 1e-3)
    return pts, valid
