"""Matrix-free Schur-complement PCG bundle adjustment (global-BA scale).

The dense window solver (``sfm/ba.py``) materialises the camera-landmark
coupling block ``W`` as a ``(C, L, 6, 3)`` tensor — O(C*L) memory, fine for
sliding windows (C <= ~16) but intractable at BASELINE config-5 scale
(hundreds of cameras, 10^5+ landmarks).  This solver never forms ``W`` or
``S``:

* One linearisation per LM iteration stores only the per-observation
  Jacobians ``J_c (O, 2, 6)`` / ``J_l (O, 2, 3)`` — O(O) memory.
* The Schur operator ``S v = (H_cc + lam I) v - W (H_ll + lam I)^-1 W^T v``
  is applied in **observation space**: two gathers + two ``segment_sum``
  scatters per apply (the TPU formulation of sparse block SpMV; the same
  scatter-as-segment-sum reformulation the dense solver uses, SURVEY.md §7
  hard part 2).
* Preconditioner: exact block-Jacobi of S.  Because a (camera, landmark)
  pair has at most one observation in BA, the diagonal correction
  ``sum_l W_cl H_ll^-1 W_cl^T`` is itself a single segment-sum over
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

import jax
import jax.numpy as jnp

from ..config import BAConfig
from ..geometry.linalg import inv3x3
from ..utils.precision import f32
from .ba import BAProblem, BAStats, _jacobians, ba_cost, residuals_and_weights
from .se3 import se3_compose, se3_exp


def _chunk_scan(arrays, chunk, body, init):
    """Scan ``body`` over observation chunks of the given flat arrays.

    Pads the leading axis to a chunk multiple (callers must make padded
    elements inert, e.g. segment ids == num_segments are dropped by
    ``segment_sum``) and accumulates ``init`` through ``body``."""
    O = arrays[0][0].shape[0]
    n = -(-O // chunk)
    pad = n * chunk - O

    def prep(a, fill):
        widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        a = jnp.pad(a, widths, constant_values=fill)
        return a.reshape(n, chunk, *a.shape[1:])

    xs = tuple(prep(a, f) for a, f in arrays)

    def step(acc, x):
        return body(acc, *x), None

    acc, _ = jax.lax.scan(step, init, xs)
    return acc


def _segment_outer(J_a, J_b, seg, num_segments, chunk):
    """``segment_sum(einsum("oij,oik->ojk", J_a, J_b), seg)`` with the
    (O, d_a, d_b) temporary bounded to ``chunk`` observations.

    Under the TPU (8, 128) tile a (O, 6, 6) float32 temporary pads ~28x
    (4 KiB/row for 144 B of data) — at global-BA scale that alone exceeds
    HBM.  Chunking keeps the padded transient at a few hundred MB while
    the accumulator stays the exact (num_segments, d_a, d_b) block sum."""
    da, db = J_a.shape[2], J_b.shape[2]

    def contrib(ja, jb, s):
        return jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", ja, jb), s, num_segments=num_segments
        )

    if J_a.shape[0] <= chunk:
        return contrib(J_a, J_b, seg)
    return _chunk_scan(
        ((J_a, 0), (J_b, 0), (seg, num_segments)),
        chunk,
        lambda acc, ja, jb, s: acc + contrib(ja, jb, s),
        jnp.zeros((num_segments, da, db), J_a.dtype),
    )


def _precond_corr(J_c, J_l, Hll_inv, cam, lm, num_cams, chunk):
    """Block-diagonal of ``W H_ll^-1 W^T``: per-camera segment sum of
    ``A_o H_ll^-1[lm_o] A_o^T`` with ``A_o = J_c^T J_l`` — observation-
    chunked for the same tile-padding reason as :func:`_segment_outer`."""

    def contrib(jc, jl, c, l):
        A = jnp.einsum("oij,oik->ojk", jc, jl)            # (o, 6, 3)
        return jax.ops.segment_sum(
            jnp.einsum("oab,obc,odc->oad", A, Hll_inv[l], A),
            c,
            num_segments=num_cams,
        )

    if J_c.shape[0] <= chunk:
        return contrib(J_c, J_l, cam, lm)
    return _chunk_scan(
        ((J_c, 0), (J_l, 0), (cam, num_cams), (lm, 0)),
        chunk,
        lambda acc, jc, jl, c, l: acc + contrib(jc, jl, c, l),
        jnp.zeros((num_cams, 6, 6), J_c.dtype),
    )


def _linearize(problem: BAProblem, huber_delta: float):
    """Whitened Jacobians + residuals at the current state."""
    r, w, p, _ = residuals_and_weights(problem, huber_delta)
    J_c, J_l = _jacobians(problem, p)
    sw = jnp.sqrt(w)[..., None]
    return J_c * sw[..., None], J_l * sw[..., None], r * sw


def _schur_pcg_step(problem: BAProblem, lam: jnp.ndarray, config: BAConfig):
    """One damped GN solve via matrix-free Schur PCG.

    Returns (dxi (C, 6), dX (L, 3))."""
    C = problem.poses.shape[0]
    L = problem.landmarks.shape[0]
    cam, lm = problem.obs_cam, problem.obs_lm

    J_c, J_l, r_w = _linearize(problem, config.huber_delta)

    # Block-diagonal terms (materialised: O(C + L), small).
    chunk = config.obs_chunk
    Hcc = _segment_outer(J_c, J_c, cam, C, chunk) + (
        lam + 1e-8
    ) * jnp.eye(6, dtype=J_c.dtype)
    Hll = _segment_outer(J_l, J_l, lm, L, chunk) + (
        lam + 1e-8
    ) * jnp.eye(3, dtype=J_l.dtype)
    Hll_inv = inv3x3(Hll)
    b_c = -jax.ops.segment_sum(
        jnp.einsum("oij,oi->oj", J_c, r_w), cam, num_segments=C
    )
    b_l = -jax.ops.segment_sum(
        jnp.einsum("oij,oi->oj", J_l, r_w), lm, num_segments=L
    )

    free = (~problem.pose_fixed).astype(J_c.dtype)[:, None]   # (C, 1)

    def w_t_apply(v):
        """W^T v: camera-space (C, 6) -> landmark-space (L, 3)."""
        u = jnp.einsum("oij,oj->oi", J_c, v[cam])             # (O, 2)
        return jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", J_l, u), lm, num_segments=L
        )

    def w_apply(z):
        """W z: landmark-space (L, 3) -> camera-space (C, 6)."""
        u = jnp.einsum("oij,oj->oi", J_l, z[lm])              # (O, 2)
        return jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", J_c, u), cam, num_segments=C
        )

    def S_apply(v):
        v = v * free
        Hv = jnp.einsum("cij,cj->ci", Hcc, v)
        y = jnp.einsum("lij,lj->li", Hll_inv, w_t_apply(v))
        out = (Hv - w_apply(y)) * free
        # Fixed poses act as identity rows (keeps S positive definite).
        return out + v_in_fixed(v)

    def v_in_fixed(v):
        return v * (1.0 - free)

    # rhs = b_c - W H_ll^-1 b_l, gauge rows zeroed.
    rhs = (b_c - w_apply(jnp.einsum("lij,lj->li", Hll_inv, b_l))) * free

    # Exact block-Jacobi of S (one obs per (cam, lm) pair in BA).
    corr = _precond_corr(J_c, J_l, Hll_inv, cam, lm, C, chunk)  # (C, 6, 6)
    P = Hcc - corr
    eye6 = jnp.eye(6, dtype=P.dtype)
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

    def body(carry, _):
        prob, lam, cost = carry
        dxi, dX = _schur_pcg_step(prob, lam, config)
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
        (problem, jnp.float32(config.damping), init_cost),
        None,
        length=config.max_iterations,
    )
    return prob, BAStats(
        initial_cost=init_cost, final_cost=cost, lambdas=lams, costs=costs
    )
