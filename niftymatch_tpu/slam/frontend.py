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
    return two_view_from_matches(
        feats_a, feats_b, m, intrinsics, ransac_config, key=key
    )


def two_view_from_matches(
    feats_a: Features,
    feats_b: Features,
    m: MatchResult,
    intrinsics: tuple[float, float, float, float],
    ransac_config: RansacConfig = RansacConfig(inlier_threshold=4.0),
    key: jax.Array | None = None,
) -> TwoViewResult:
    """Two-view pose estimate from PRECOMPUTED match indices — the geometry
    half of :func:`estimate_two_view`.  Lets callers that already hold
    correspondences (the ring all-pairs sweep's per-pair indices,
    ``parallel.matching.ring_allpairs_match``) skip the matching GEMM."""
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
    from ..geometry.transforms import sampson_sq_error
    from ..sfm.homography import recover_pose_homography
    from ..sfm.se3 import hat
    from ..sfm.two_view_refine import refine_relative_pose

    # Run BOTH models (ORB-SLAM-style H/E selection): quasi-planar scenes
    # make E unrecoverable (2-D null space in the 8-point system) but are
    # exactly a homography; general scenes prefer E.
    res_e = ransac(srcn, dstn, mask, cfg, model="essential", key=key)
    key_h = None if key is None else jax.random.fold_in(key, 1)
    res_h = ransac(srcn, dstn, mask, cfg, model="homography", key=key_h)

    # Model selection by truncated symmetric-transfer-error score (the
    # ORB-SLAM heuristic), not inlier count: each masked correspondence
    # contributes max(0, T - err) per direction, and H wins when it holds
    # > 45% of the combined score.  Count-based selection is noisy near
    # degeneracy — a sloppy H can tie E on count while losing badly on
    # residual mass.
    from ..geometry.transforms import transfer_sq_error

    T_thr = cfg.inlier_threshold
    H = res_h.transform
    # Adjugate-based inverse with a clamped determinant: H comes from a
    # masked RANSAC and can be arbitrary when res_h.success is False.
    # (inv3x3/det3x3 are the repo's pure-XLA small-matrix routines; the
    # jnp.linalg equivalents lower to LAPACK custom calls on CPU, which
    # the AOT export cache cannot persist.)
    from ..geometry.linalg import inv3x3

    det = (
        H[0, 0] * (H[1, 1] * H[2, 2] - H[1, 2] * H[2, 1])
        - H[0, 1] * (H[1, 0] * H[2, 2] - H[1, 2] * H[2, 0])
        + H[0, 2] * (H[1, 0] * H[2, 1] - H[1, 1] * H[2, 0])
    )
    H_inv = inv3x3(
        H + jnp.where(jnp.abs(det) < 1e-12, 1e-6, 0.0) * jnp.eye(3)
    )
    err_h = transfer_sq_error(H, srcn, dstn) + transfer_sq_error(
        H_inv, dstn, srcn
    )
    # Sampson error is the symmetric first-order epipolar residual; double
    # its truncated score so one correspondence weighs the same 2T ceiling
    # in both branches.
    err_e_sel = sampson_sq_error(res_e.transform, srcn, dstn)
    s_h = jnp.sum(
        jnp.where(mask, jnp.maximum(2.0 * T_thr - err_h, 0.0), 0.0)
    )
    s_e = jnp.sum(
        jnp.where(mask, 2.0 * jnp.maximum(T_thr - err_e_sel, 0.0), 0.0)
    )
    use_h = res_h.success & (
        (~res_e.success) | (s_h > 0.45 * (s_h + s_e))
    )

    # Pose from the essential branch, with GN Sampson polish on inliers.
    rec_e = recover_pose(res_e.transform, srcn, dstn, res_e.inliers)
    R_e, t_e, _ = refine_relative_pose(
        rec_e.R, rec_e.t, srcn, dstn, res_e.inliers.astype(jnp.float32)
    )
    E_gn = hat(t_e) @ R_e
    err = sampson_sq_error(E_gn, srcn, dstn)
    inl_gn = (err < cfg.inlier_threshold) & mask
    keep_gn = jnp.sum(inl_gn) >= jnp.sum(res_e.inliers)
    E_e = jnp.where(keep_gn, E_gn, res_e.transform)
    inl_e = jnp.where(keep_gn, inl_gn, res_e.inliers)
    rec_e = recover_pose(E_e, srcn, dstn, inl_e)

    # Pose from the homography branch (Faugeras decomposition + cheirality).
    rec_h = recover_pose_homography(res_h.transform, srcn, dstn, res_h.inliers)
    E_h = hat(rec_h.t) @ rec_h.R

    pick = lambda h, e: jnp.where(use_h, h, e)
    inliers = pick(res_h.inliers, inl_e)
    E = pick(E_h, E_e)
    R = pick(rec_h.R, rec_e.R)
    t = pick(rec_h.t, rec_e.t)
    points = pick(rec_h.points, rec_e.points)
    cheir = pick(rec_h.cheirality, rec_e.cheirality)
    num_good = pick(rec_h.num_good, rec_e.num_good)

    num = jnp.sum(inliers.astype(jnp.int32))
    success = (
        (res_e.success | res_h.success)
        & (num_good >= (num // 2))
        & (num >= 8)
    )
    return TwoViewResult(
        matches=m,
        E=E,
        inliers=inliers,
        num_inliers=num,
        R=R,
        t=t,
        points=points,
        point_valid=cheir & inliers,
        success=success,
    )


class SlamStepResult(NamedTuple):
    """Everything the host bookkeeping needs from one SLAM frame, produced
    by a single compiled dispatch (one tunnel round-trip to fetch)."""

    indices: jnp.ndarray       # (N,) match indices into the new frame
    inliers: jnp.ndarray       # (N,) bool
    num_inliers: jnp.ndarray   # () int32
    success: jnp.ndarray       # () bool
    scale: jnp.ndarray         # () float32 resolved monocular scale
    pose: jnp.ndarray          # (3, 4) world->cam pose of the new frame
    points_w: jnp.ndarray      # (N, 3) world points (A-slot aligned)
    points_valid: jnp.ndarray  # (N,) bool (mask & cheirality in both views)


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``values[mask]`` (numpy convention: mean of the two middle
    elements for even counts).  Returns an arbitrary value when the mask is
    empty — guard at the call site."""
    k = jnp.sum(mask.astype(jnp.int32))
    s = jnp.sort(jnp.where(mask, values, jnp.inf))
    lo = s[jnp.maximum((k - 1) // 2, 0)]
    hi = s[jnp.maximum(k // 2, 0)]
    return 0.5 * (lo + hi)


def slam_step(
    last_feats: Features,
    feats: Features,
    last_pose: jnp.ndarray,
    last_world: jnp.ndarray,
    has_track: jnp.ndarray,
    intrinsics: tuple[float, float, float, float],
    ransac_config: RansacConfig,
    min_scale_obs: int = 5,
) -> SlamStepResult:
    """One fused SLAM frame: two-view estimate vs. the last keyframe,
    monocular scale from re-observed landmarks, pose composition, and
    triangulation of the matches at the new world pose.

    This is the whole device side of ``SlamSystem.process_features`` as a
    single jitted program: the reference's host-driven per-stage dispatch
    (SURVEY.md §3.1, one launch + sync per stage) becomes one launch and a
    single host fetch — essential when the accelerator sits behind a
    network tunnel where every readback is a full round-trip.

    ``last_world``/``has_track`` are the stored landmark positions (and
    their liveness) gathered at the last keyframe's feature slots — tiny
    host->device uploads that replace a device->host pose/point fetch.

    Scale resolution: median over re-observed ANCHORED landmarks of
    (stored landmark depth in the last camera) / (unit-baseline
    triangulated depth); identity when fewer than ``min_scale_obs``
    ratios survive.  The anchoring matters: the stored positions come
    from each track's birth (and windowed-BA refinement), not from this
    frame's re-triangulation, so the per-step median bias no longer
    re-chains multiplicatively (VERDICT r3 #5).  A direct per-ray
    reprojection estimator (s from u(Rp + st)_z = (Rp + st)_x) was
    evaluated here and REJECTED: its per-point estimates are heavy-
    tailed near the epipolar degeneracy and destabilised sparse scenes
    (a 100-keyframe 512-feature clip drifted 500x; the bounded depth
    ratio drifts < 2x on the same clip with anchoring)."""
    from ..sfm.se3 import se3_apply, se3_compose

    tv = estimate_two_view(last_feats, feats, intrinsics, ransac_config)

    d_world = se3_apply(last_pose, last_world)[:, 2]
    d_unit = tv.points[:, 2]
    ok = has_track & tv.point_valid & (d_unit > 1e-3) & (d_world > 1e-3)
    ratios = d_world / jnp.maximum(d_unit, 1e-9)
    scale = jnp.where(
        jnp.sum(ok.astype(jnp.int32)) >= min_scale_obs,
        masked_median(ratios, ok),
        jnp.float32(1.0),
    )

    T_rel = jnp.concatenate([tv.R, (scale * tv.t)[:, None]], axis=-1)
    pose = se3_compose(T_rel, last_pose)
    pts_w, valid_w = triangulate_in_world(
        last_pose, pose, last_feats, feats, tv.matches, intrinsics
    )
    return SlamStepResult(
        indices=tv.matches.indices,
        inliers=tv.inliers,
        num_inliers=tv.num_inliers,
        success=tv.success,
        scale=scale,
        pose=pose,
        points_w=pts_w,
        points_valid=valid_w,
    )


def slam_chunk(
    last_feats: Features,
    feats_batch: Features,
    last_pose: jnp.ndarray,
    last_world: jnp.ndarray,
    has_track: jnp.ndarray,
    intrinsics: tuple[float, float, float, float],
    ransac_config: RansacConfig,
    min_inliers: int,
    min_scale_obs: int = 5,
    anchor_landmarks: bool = True,
) -> tuple[SlamStepResult, jnp.ndarray]:
    """N sequential SLAM frames in ONE compiled program.

    ``lax.scan`` over ``slam_step`` with the *keyframe state* as the device
    carry: (features, pose, per-slot world points, per-slot track liveness).
    An accepted frame (success and enough inliers) becomes the new carry
    keyframe; its world context is the scatter of this frame's triangulated
    points into its own feature slots — exactly the host bookkeeping of
    ``SlamSystem._propagate_tracks``, minus track-ID minting (IDs stay host
    business, applied once per chunk from the batched fetch).  A rejected
    frame leaves the carry untouched, so the next frame matches against the
    same keyframe — identical drop semantics to the per-frame path.

    This is the tunnel-latency amortisation the per-frame loop can't reach:
    one dispatch + one fetch per N frames instead of per frame (the
    reference's client loop syncs per *stage*, SURVEY.md §3.1; the round-1
    system synced per frame).

    Returns (stacked per-frame ``SlamStepResult``, (N,) bool accepted)."""

    def step(carry, feats_i):
        kf_feats, pose, world, has = carry
        out = slam_step(
            kf_feats,
            feats_i,
            pose,
            world,
            has,
            intrinsics,
            ransac_config,
            min_scale_obs,
        )
        accept = out.success & (out.num_inliers >= min_inliers)
        # New keyframe's world context: scatter world points into the
        # slots its matches landed in (mode="drop" discards the sentinel
        # target used for unmatched/invalid slots).  A slot whose A-side
        # already carried a landmark KEEPS that landmark's position —
        # only genuinely new tracks take this frame's triangulation
        # (VERDICT r3 #5 scale anchoring: re-triangulating re-observed
        # landmarks every frame re-chains the monocular scale and
        # compounds the per-step median bias into multiplicative drift;
        # mirrors the host path's _propagate_tracks fix).
        cap = world.shape[0]
        matched = out.inliers & (out.indices >= 0)
        if anchor_landmarks:
            sel = matched & (has | out.points_valid)
            carried = jnp.where(has[:, None], world, out.points_w)
        else:
            # Fresh carry (pre-r4 semantics): every re-observed slot
            # takes this frame's triangulation.  Chains the per-step
            # scale (higher long-run gauge drift on dense clips) but
            # self-corrects when windowed BA is too sparse to keep the
            # anchored positions consistent with the current pose.
            sel = matched & out.points_valid
            carried = out.points_w
        tgt = jnp.where(sel, out.indices, cap)
        new_world = jnp.zeros_like(world).at[tgt].set(
            carried, mode="drop"
        )
        new_has = (
            jnp.zeros_like(has)
            .at[tgt]
            .set(jnp.ones_like(sel), mode="drop")
        )
        cand = (feats_i, out.pose, new_world, new_has)
        carry = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), cand, carry
        )
        return carry, (out, accept)

    _, (outs, accepts) = jax.lax.scan(
        step, (last_feats, last_pose, last_world, has_track), feats_batch
    )
    return outs, accepts


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
