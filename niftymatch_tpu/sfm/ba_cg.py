"""Matrix-free Schur-complement PCG bundle adjustment (global-BA scale).

The dense window solver (``sfm/ba.py``) materialises the camera-landmark
coupling block ``W`` as a ``(C, L, 6, 3)`` tensor — O(C*L) memory, fine for
sliding windows (C <= ~16) but intractable at BASELINE config-5 scale
(hundreds of cameras, 10^5+ landmarks).  This solver never forms ``W`` or
``S``:

* One linearisation per LM iteration stores only the per-observation
  Jacobians ``J_c (O, 2, 6)`` / ``J_l (O, 2, 3)`` — O(O) memory.
* The Schur operator ``S v = (H_cc + lam I) v - W (H_ll + lam I)^-1 W^T v``
  is applied in **observation space**: gathers + segmented reductions per
  apply (sparse block SpMV, SURVEY.md §7 hard part 2).
* **Segmented reductions are cumsum-differences over SORTED observations,
  not scatters.**  XLA's TPU scatter costs ~20-30 ms for 2M rows *per
  segment_sum* regardless of segment count (measured on a v5e chip); an
  associative-scan cumsum + boundary gather computes the identical sorted
  segment sum in ~1-3 ms.  Observations are argsorted once per solve into
  landmark order, with a precomputed permutation into camera order for the
  camera-side reductions — this is the difference between 0.85 and >3
  M obs-updates/s at 512 cams / 131k landmarks / 2M observations.
* Preconditioner: exact block-Jacobi of S.  Because a (camera, landmark)
  pair has at most one observation in BA, the diagonal correction
  ``sum_l W_cl H_ll^-1 W_cl^T`` is itself a segmented reduction over
  observations of ``(J_c^T J_l) H_ll^-1 (J_l^T J_c)``.
* PCG runs a fixed ``config.cg_iterations`` schedule inside ``lax.scan``
  with a branchless convergence freeze at ``config.cg_tol`` — no host
  syncs; the LM accept/reject loop wraps it exactly as in the dense solver.

This implements the solver the ``BAConfig.cg_iterations``/``cg_tol`` fields
advertise.  Numerical style follows the reference's batched-tiny-linalg
design (``/root/reference/src/gpu/kernels/svd.cu:201-360``): all block ops
are fixed-size (6x6 / 3x3) and batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BAConfig
from ..geometry.linalg import inv3x3
from ..utils.precision import f32
from .ba import BAProblem, BAStats, _jacobians, ba_cost, residuals_and_weights
from .se3 import se3_compose, se3_exp


class ObsLayout(NamedTuple):
    """Sorted-observation layout for scatter-free segmented reductions.

    All per-observation arrays downstream live in BY-LANDMARK order;
    ``perm_to_cam`` maps them into by-camera order when a camera-side
    reduction is needed."""

    order_lm: jnp.ndarray      # (O,) permutation: original -> by-landmark
    ends_lm: jnp.ndarray       # (L,) exclusive end index per landmark
    perm_to_cam: jnp.ndarray   # (O,) by-landmark -> by-camera
    ends_cam: jnp.ndarray      # (C,) exclusive end index per camera
    cam_sorted: jnp.ndarray    # (O,) camera id per by-landmark row
    lm_sorted: jnp.ndarray     # (O,) landmark id per by-landmark row


def build_obs_layout(cam: jnp.ndarray, lm: jnp.ndarray, C: int, L: int
                     ) -> ObsLayout:
    """Once-per-solve index tables (device argsorts; shapes static)."""
    order_lm = jnp.argsort(lm, stable=True)
    lm_sorted = lm[order_lm]
    cam_in_lm = cam[order_lm]
    perm_to_cam = jnp.argsort(cam_in_lm, stable=True)
    cam_sorted_by_cam = cam_in_lm[perm_to_cam]
    ends_lm = jnp.searchsorted(lm_sorted, jnp.arange(1, L + 1))
    ends_cam = jnp.searchsorted(cam_sorted_by_cam, jnp.arange(1, C + 1))
    return ObsLayout(
        order_lm=order_lm,
        ends_lm=ends_lm.astype(jnp.int32),
        perm_to_cam=perm_to_cam,
        ends_cam=ends_cam.astype(jnp.int32),
        cam_sorted=cam_in_lm,
        lm_sorted=lm_sorted,
    )


def _seg_reduce(vals: jnp.ndarray, ends: jnp.ndarray) -> jnp.ndarray:
    """Sorted segment sum via cumsum-difference: (O, k) -> (n_seg, k).

    Replaces ``segment_sum`` on sorted ids in the PER-CG-ITERATION
    operator applies (a TPU scatter-add costs ~10x more wall time).
    Precision note: a segment's absolute error scales with the global
    fp32 prefix magnitude, not the segment's — acceptable inside CG
    (signed summands, iterative solver, LM accept gate), but NOT for the
    once-per-iteration block sums (all-positive quadratic terms where a
    late small segment would lose ~eps * total relative accuracy); those
    use exact per-segment ``segment_sum`` accumulation instead
    (:func:`seg_sum_lm_exact` / :func:`seg_sum_cam_exact` — their
    scatter cost is paid once per LM iteration, not once per CG step)."""
    cs = jnp.cumsum(vals, axis=0)
    zero = jnp.zeros((1,) + vals.shape[1:], vals.dtype)
    cs = jnp.concatenate([zero, cs], axis=0)
    e = cs[ends]
    s = jnp.concatenate([zero, e[:-1]], axis=0)
    return e - s


def seg_reduce_lm(vals: jnp.ndarray, lay: ObsLayout) -> jnp.ndarray:
    """(O, ...) in by-landmark order -> (L, ...) (fast, prefix-diff)."""
    flat = vals.reshape(vals.shape[0], -1)
    out = _seg_reduce(flat, lay.ends_lm)
    return out.reshape((out.shape[0],) + vals.shape[1:])


def seg_reduce_cam(vals: jnp.ndarray, lay: ObsLayout) -> jnp.ndarray:
    """(O, ...) in by-landmark order -> (C, ...) (permutes internally)."""
    flat = vals.reshape(vals.shape[0], -1)[lay.perm_to_cam]
    out = _seg_reduce(flat, lay.ends_cam)
    return out.reshape((out.shape[0],) + vals.shape[1:])


def seg_sum_lm_exact(vals: jnp.ndarray, lay: ObsLayout, L: int) -> jnp.ndarray:
    """Exact (per-segment accumulated) landmark segment sum — see
    :func:`_seg_reduce` precision note."""
    return jax.ops.segment_sum(
        vals, lay.lm_sorted, num_segments=L, indices_are_sorted=True
    )


def seg_sum_cam_exact(vals: jnp.ndarray, lay: ObsLayout, C: int) -> jnp.ndarray:
    """Exact camera segment sum (permutes into by-camera order)."""
    return jax.ops.segment_sum(
        vals[lay.perm_to_cam],
        lay.cam_sorted[lay.perm_to_cam],
        num_segments=C,
        indices_are_sorted=True,
    )


def _linearize(problem: BAProblem, huber_delta: float):
    """Whitened Jacobians + residuals, stored FLAT: (O, 12), (O, 6), (O, 2).

    Rank-3 per-observation arrays like (O, 2, 6) are tile-padded by the
    TPU (8, 128) layout to 4 KiB/row (~85x), so anything that PERSISTS
    across the CG scan is kept 2-D; consumers reshape in-body, which XLA
    fuses without materialising the padded form (verified on-chip)."""
    r, w, p, _ = residuals_and_weights(problem, huber_delta)
    J_c, J_l = _jacobians(problem, p)
    sw = jnp.sqrt(w)[..., None]
    O = r.shape[0]
    return (
        (J_c * sw[..., None]).reshape(O, 12),
        (J_l * sw[..., None]).reshape(O, 6),
        r * sw,
    )


def _outer_flat(Ja: jnp.ndarray, Jb: jnp.ndarray, da: int, db: int):
    """Per-obs block outer product sum_i Ja_i Jb_i^T as flat (O, da*db)
    columns — never materialises an (O, da, db) rank-3 temporary."""
    cols = []
    for j in range(da):
        for k in range(db):
            cols.append(
                Ja[:, j] * Jb[:, k] + Ja[:, da + j] * Jb[:, db + k]
            )
    return jnp.stack(cols, axis=1)


def _schur_pcg_step(problem: BAProblem, lay: ObsLayout, lam: jnp.ndarray,
                    config: BAConfig, reduce_fn=lambda x: x):
    """One damped GN solve via matrix-free Schur PCG.

    ``problem``'s observation arrays must already be in ``lay``'s
    by-landmark order.  ``reduce_fn`` is applied to every camera-space
    partial sum — identity on one device, ``psum`` over the mesh axis in
    the landmark-sharded distributed solver (``parallel/ba.py``).
    Returns (dxi (C, 6), dX (L, 3))."""
    C = problem.poses.shape[0]
    cam, lm = problem.obs_cam, problem.obs_lm

    Jc_f, Jl_f, r_w = _linearize(problem, config.huber_delta)
    O = Jc_f.shape[0]

    def Jc3():
        return Jc_f.reshape(O, 2, 6)

    def Jl3():
        return Jl_f.reshape(O, 2, 3)

    # Block-diagonal terms (materialised: O(C + L), small).
    eye6 = jnp.eye(6, dtype=Jc_f.dtype)
    Hcc = reduce_fn(
        seg_sum_cam_exact(_outer_flat(Jc_f, Jc_f, 6, 6), lay, C)
        .reshape(C, 6, 6)
    ) + (lam + 1e-8) * eye6
    L = problem.landmarks.shape[0]
    Hll = seg_sum_lm_exact(_outer_flat(Jl_f, Jl_f, 3, 3), lay, L).reshape(
        L, 3, 3
    ) + (lam + 1e-8) * jnp.eye(3, dtype=Jl_f.dtype)
    Hll_inv = inv3x3(Hll)
    b_c = -reduce_fn(
        seg_sum_cam_exact(jnp.einsum("oij,oi->oj", Jc3(), r_w), lay, C)
    )
    b_l = -seg_sum_lm_exact(jnp.einsum("oij,oi->oj", Jl3(), r_w), lay, L)

    free = (~problem.pose_fixed).astype(Jc_f.dtype)[:, None]   # (C, 1)

    def w_t_apply(v):
        """W^T v: camera-space (C, 6) -> landmark-space (L, 3)."""
        u = jnp.einsum("oij,oj->oi", Jc3(), v[cam])            # (O, 2)
        return seg_reduce_lm(jnp.einsum("oij,oi->oj", Jl3(), u), lay)

    def w_apply(z):
        """W z (local shard): landmark-space (L, 3) -> camera (C, 6)."""
        u = jnp.einsum("oij,oj->oi", Jl3(), z[lm])             # (O, 2)
        return seg_reduce_cam(jnp.einsum("oij,oi->oj", Jc3(), u), lay)

    def v_in_fixed(v):
        return v * (1.0 - free)

    def S_apply(v):
        v = v * free
        Hv = jnp.einsum("cij,cj->ci", Hcc, v)
        y = jnp.einsum("lij,lj->li", Hll_inv, w_t_apply(v))
        # In the distributed solver this is THE per-iteration collective:
        # (C, 6) floats over the mesh.
        out = (Hv - reduce_fn(w_apply(y))) * free
        # Fixed poses act as identity rows (keeps S positive definite).
        return out + v_in_fixed(v)

    # rhs = b_c - W H_ll^-1 b_l, gauge rows zeroed.
    rhs = (
        b_c - reduce_fn(w_apply(jnp.einsum("lij,lj->li", Hll_inv, b_l)))
    ) * free

    # Exact block-Jacobi of S (one obs per (cam, lm) pair in BA):
    # G_o = A_o Hll_inv[lm_o] A_o^T with A_o = J_c^T J_l, all as flat
    # (O, k) column arithmetic (see _outer_flat).
    A = _outer_flat(Jc_f, Jl_f, 6, 3)                          # (O, 18)
    Hg = Hll_inv.reshape(L, 9)[lm]                             # (O, 9) sorted
    B = jnp.stack(
        [
            sum(A[:, a * 3 + b] * Hg[:, b * 3 + c] for b in range(3))
            for a in range(6)
            for c in range(3)
        ],
        axis=1,
    )                                                          # (O, 18)
    G = jnp.stack(
        [
            sum(B[:, a * 3 + c] * A[:, d * 3 + c] for c in range(3))
            for a in range(6)
            for d in range(6)
        ],
        axis=1,
    )                                                          # (O, 36)
    corr = reduce_fn(
        seg_sum_cam_exact(G, lay, C).reshape(C, 6, 6))
    P = Hcc - corr
    P = jnp.where(problem.pose_fixed[:, None, None], eye6, P)
    # Damped blocks are SPD; a plain inverse is fine at 6x6.
    P_inv = jnp.linalg.inv(P + 1e-6 * eye6)

    def precond(v):
        return jnp.einsum("cij,cj->ci", P_inv, v)

    # --- PCG with branchless convergence freeze ---
    rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs))
    tol = config.cg_tol * jnp.maximum(rhs_norm, 1e-30)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, rr, p, rz, active = carry
        Ap = S_apply(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
        x_n = x + alpha * p
        r_n = rr - alpha * Ap
        z_n = precond(r_n)
        rz_n = jnp.sum(r_n * z_n)
        beta = rz_n / jnp.where(jnp.abs(rz) > 1e-30, rz, 1.0)
        p_n = z_n + beta * p
        keep = active & (jnp.sqrt(jnp.sum(r_n * r_n)) > tol)
        sel = lambda a, b: jnp.where(active, a, b)
        return (
            sel(x_n, x), sel(r_n, rr), sel(p_n, p), sel(rz_n, rz), keep
        ), None

    (dxi, _, _, _, _), _ = jax.lax.scan(
        body,
        (x0, r0, p0, rz0, jnp.bool_(rhs_norm > 0)),
        None,
        length=config.cg_iterations,
    )

    # Landmark back-substitution: dX = H_ll^-1 (b_l - W^T dxi).
    dX = jnp.einsum("lij,lj->li", Hll_inv, b_l - w_t_apply(dxi * free))
    return dxi * free, dX


@f32
def bundle_adjust_cg(
    problem: BAProblem, config: BAConfig = BAConfig()
) -> tuple[BAProblem, BAStats]:
    """LM bundle adjustment with matrix-free Schur PCG camera solves.

    Drop-in interface match for ``bundle_adjust``; scales to global
    problems (memory O(O + C + L), never O(C*L))."""
    init_cost = ba_cost(problem, config.huber_delta)

    # Re-order observations once (invalid rows keep w=0 and contribute
    # zeros to every reduction, so they can sit anywhere in the order).
    C = problem.poses.shape[0]
    L = problem.landmarks.shape[0]
    lay = build_obs_layout(problem.obs_cam, problem.obs_lm, C, L)
    o = lay.order_lm
    sorted_problem = problem._replace(
        obs_uv=problem.obs_uv[o],
        obs_cam=lay.cam_sorted,
        obs_lm=lay.lm_sorted,
        obs_valid=problem.obs_valid[o],
    )

    def body(carry, _):
        prob, lam, cost = carry
        dxi, dX = _schur_pcg_step(prob, lay, lam, config)
        free = (~prob.pose_fixed)[:, None].astype(dxi.dtype)
        cand = prob._replace(
            poses=se3_compose(se3_exp(dxi * free), prob.poses),
            landmarks=prob.landmarks + dX,
        )
        new_cost = ba_cost(cand, config.huber_delta)
        accept = new_cost < cost
        prob = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, prob)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6
        )
        return (prob, lam, cost), (lam, cost)

    (prob, _, cost), (lams, costs) = jax.lax.scan(
        body,
        (sorted_problem, jnp.float32(config.damping), init_cost),
        None,
        length=config.max_iterations,
    )
    out = problem._replace(poses=prob.poses, landmarks=prob.landmarks)
    return out, BAStats(
        initial_cost=init_cost, final_cost=cost, lambdas=lams, costs=costs
    )
