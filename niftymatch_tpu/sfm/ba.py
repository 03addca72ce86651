"""Bundle adjustment: Schur-complement Levenberg-Marquardt, fully batched.

New capability (SURVEY.md §7 M4; BASELINE config 3).  TPU-first design:

* The observation set is a fixed-capacity table (obs_uv / obs_cam / obs_lm /
  obs_valid) — the BA analogue of the dense keypoint maps the reference uses
  (SURVEY.md §7.1): static shapes, masks instead of compaction.
* Per-observation analytic Jacobians are computed batched on the VPU; block
  reductions (J^T J, J^T r) are ``segment_sum`` scatters keyed by camera /
  landmark index — the TPU formulation of the scatter-heavy accumulations
  (SURVEY.md §7 hard part 2).
* Landmark blocks are 3x3 -> inverted in closed form (adjugate), the same
  shape class as the reference's 9x9 device SVD (``svd.cu``), then the
  reduced camera system S = H_cc - W H_ll^-1 W^T is assembled with one
  einsum (an MXU contraction over landmarks) and solved densely (6C x 6C,
  C = window size).
* The LM loop is a fixed-iteration ``lax.scan`` with branchless
  accept/reject — no host syncs anywhere.

Gauge freedom is fixed by a ``pose_fixed`` mask (rows/cols of fixed poses
are pinned to identity in S).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32

from ..config import BAConfig
from ..geometry.linalg import inv3x3
from .se3 import hat, se3_compose, se3_exp


class BAProblem(NamedTuple):
    """Fixed-shape bundle-adjustment state.

    poses: (C, 3, 4) world->camera.  landmarks: (L, 3) world points.
    intrinsics: (4,) = (fx, fy, cx, cy).  Observations are a flat table:
    obs_uv (O, 2) pixels, obs_cam/obs_lm (O,) int32, obs_valid (O,) bool.
    pose_fixed: (C,) bool gauge mask (at least one True).
    """

    poses: jnp.ndarray
    landmarks: jnp.ndarray
    intrinsics: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_valid: jnp.ndarray
    pose_fixed: jnp.ndarray


@f32
def project(
    poses: jnp.ndarray, landmarks: jnp.ndarray, intrinsics: jnp.ndarray,
    obs_cam: jnp.ndarray, obs_lm: jnp.ndarray,
):
    """Per-observation pinhole projection.  Returns (uv (O, 2), p_cam (O, 3))."""
    T = poses[obs_cam]                      # (O, 3, 4)
    X = landmarks[obs_lm]                   # (O, 3)
    p = (T[..., :3] @ X[..., None])[..., 0] + T[..., 3]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    z = jnp.where(jnp.abs(p[..., 2]) > 1e-6, p[..., 2], 1e-6)
    u = fx * p[..., 0] / z + cx
    v = fy * p[..., 1] / z + cy
    return jnp.stack([u, v], axis=-1), p


@f32
def residuals_and_weights(problem: BAProblem, huber_delta: float):
    """Reprojection residuals (O, 2) + Huber IRLS weights (O,)."""
    uv, p = project(
        problem.poses, problem.landmarks, problem.intrinsics,
        problem.obs_cam, problem.obs_lm,
    )
    r = uv - problem.obs_uv
    # Observations behind the camera get zero weight (cheirality guard).
    valid = problem.obs_valid & (p[..., 2] > 1e-6)
    norm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(norm <= huber_delta, 1.0, huber_delta / jnp.maximum(norm, 1e-12))
    w = w * valid.astype(jnp.float32)
    return r, w, p, valid


@f32
def ba_cost(problem: BAProblem, huber_delta: float) -> jnp.ndarray:
    """Total robust (Huber) cost."""
    r, w, _, valid = residuals_and_weights(problem, huber_delta)
    n2 = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, 1e-18))
    quad = 0.5 * n2
    lin = huber_delta * (n - 0.5 * huber_delta)
    cost = jnp.where(n <= huber_delta, quad, lin)
    return jnp.sum(cost * valid.astype(jnp.float32))


def _jacobians(problem: BAProblem, p: jnp.ndarray):
    """Analytic per-observation Jacobians.

    J_pose (O, 2, 6) wrt left-multiplied tangent exp(xi) T (rho, phi order);
    J_lm (O, 2, 3) wrt the world point."""
    fx, fy = problem.intrinsics[0], problem.intrinsics[1]
    x, y = p[..., 0], p[..., 1]
    z = jnp.where(jnp.abs(p[..., 2]) > 1e-6, p[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    # d(u,v)/dp  (O, 2, 3)
    dproj = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    # dp/dxi = [I | -hat(p)]  (O, 3, 6)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (*p.shape[:-1], 3, 3))
    dp_dxi = jnp.concatenate([I3, -hat(p)], axis=-1)
    J_pose = dproj @ dp_dxi                           # (O, 2, 6)
    R = problem.poses[problem.obs_cam][..., :3]        # (O, 3, 3)
    J_lm = dproj @ R                                   # (O, 2, 3)
    return J_pose, J_lm


class BAStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    lambdas: jnp.ndarray       # (iters,) damping trace
    costs: jnp.ndarray         # (iters,) accepted cost after each iteration


def _solve_step(problem: BAProblem, lam: jnp.ndarray, config: BAConfig):
    """One damped GN solve: returns (dxi (C, 6), dX (L, 3))."""
    C = problem.poses.shape[0]
    L = problem.landmarks.shape[0]

    r, w, p, _ = residuals_and_weights(problem, config.huber_delta)
    J_c, J_l = _jacobians(problem, p)
    sw = jnp.sqrt(w)[..., None]
    r_w = r * sw
    J_c = J_c * sw[..., None]
    J_l = J_l * sw[..., None]

    # Block reductions (segment scatters).
    Hcc = jax.ops.segment_sum(
        jnp.einsum("oij,oik->ojk", J_c, J_c), problem.obs_cam, num_segments=C
    )                                                   # (C, 6, 6)
    Hll = jax.ops.segment_sum(
        jnp.einsum("oij,oik->ojk", J_l, J_l), problem.obs_lm, num_segments=L
    )                                                   # (L, 3, 3)
    pair_id = problem.obs_cam * L + problem.obs_lm
    W = jax.ops.segment_sum(
        jnp.einsum("oij,oik->ojk", J_c, J_l), pair_id, num_segments=C * L
    ).reshape(C, L, 6, 3)
    b_c = -jax.ops.segment_sum(
        jnp.einsum("oij,oi->oj", J_c, r_w), problem.obs_cam, num_segments=C
    )                                                   # (C, 6)
    b_l = -jax.ops.segment_sum(
        jnp.einsum("oij,oi->oj", J_l, r_w), problem.obs_lm, num_segments=L
    )                                                   # (L, 3)

    # LM damping (additive, keeps unobserved blocks invertible).
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    eye3 = jnp.eye(3, dtype=Hll.dtype)
    Hcc = Hcc + (lam + 1e-8) * eye6
    Hll = Hll + (lam + 1e-8) * eye3

    # Schur complement onto cameras.
    Hll_inv = inv3x3(Hll)                               # (L, 3, 3)
    A = jnp.einsum("clij,ljk->clik", W, Hll_inv)        # (C, L, 6, 3)
    S_blocks = jnp.einsum("clij,dlkj->cdik", A, W)      # (C, C, 6, 6)
    S = (
        jnp.transpose(
            jnp.zeros((C, C, 6, 6), Hcc.dtype).at[
                jnp.arange(C), jnp.arange(C)
            ].set(Hcc)
            - S_blocks,
            (0, 2, 1, 3),
        ).reshape(C * 6, C * 6)
    )
    rhs = (b_c - jnp.einsum("clij,lj->ci", A, b_l)).reshape(C * 6)

    # Gauge: pin fixed poses (identity rows/cols, zero rhs).
    free = (~problem.pose_fixed).astype(S.dtype)
    fm = jnp.repeat(free, 6)
    S = S * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    rhs = rhs * fm

    dxi = jnp.linalg.solve(S, rhs).reshape(C, 6)

    # Back-substitute landmarks: dX = Hll^-1 (b_l - W^T dxi summed over cams)
    Wt_dxi = jnp.einsum("clij,ci->lj", W, dxi)          # (L, 3)
    dX = jnp.einsum("lij,lj->li", Hll_inv, b_l - Wt_dxi)
    return dxi, dX


def _apply_step(problem: BAProblem, dxi, dX) -> BAProblem:
    free = (~problem.pose_fixed)[:, None].astype(dxi.dtype)
    new_poses = se3_compose(se3_exp(dxi * free), problem.poses)
    new_lms = problem.landmarks + dX
    return problem._replace(poses=new_poses, landmarks=new_lms)


@f32
def bundle_adjust(
    problem: BAProblem, config: BAConfig = BAConfig()
) -> tuple[BAProblem, BAStats]:
    """Levenberg-Marquardt BA with Schur-complement camera solves.

    Fixed ``config.max_iterations`` iterations, branchless accept/reject:
    a step is kept iff it lowers the robust cost; damping follows the
    classic x0.5 / x4 schedule.  Everything stays on device."""
    init_cost = ba_cost(problem, config.huber_delta)

    def body(carry, _):
        prob, lam, cost = carry
        dxi, dX = _solve_step(prob, lam, config)
        cand = _apply_step(prob, dxi, dX)
        new_cost = ba_cost(cand, config.huber_delta)
        accept = new_cost < cost
        prob = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, prob
        )
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-10, 1e6)
        return (prob, lam, cost), (lam, cost)

    (prob, lam, cost), (lams, costs) = jax.lax.scan(
        body,
        (problem, jnp.float32(config.damping), init_cost),
        None,
        length=config.max_iterations,
    )
    return prob, BAStats(
        initial_cost=init_cost, final_cost=cost, lambdas=lams, costs=costs
    )
