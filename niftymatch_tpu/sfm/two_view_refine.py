"""Nonlinear two-view refinement: Gauss-Newton on the (R, t) manifold.

The 8-point minimal sample that wins RANSAC carries pixel noise straight
into the essential matrix, and algebraic least-squares refits are unreliable
(they minimise the wrong norm and collapse on near-degenerate inlier sets).
The standard fix — and the missing step between RANSAC and BA — is a small
Gauss-Newton on the 5-DoF relative pose itself: 3 rotation tangents + 2
translation-sphere tangents, minimising the Sampson epipolar error over all
inlier correspondences.  Fully batched, fixed iteration count, branchless
accept/reject.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.linalg import cholesky_solve_small
from ..utils.precision import f32
from .se3 import hat, so3_exp


def _essential_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return hat(t) @ R


def _sampson_residuals(E, pts_a, pts_b):
    """Signed Sampson residual per correspondence (N,)."""
    x, y = pts_a[..., 0], pts_a[..., 1]
    u, v = pts_b[..., 0], pts_b[..., 1]
    l0 = E[0, 0] * x + E[0, 1] * y + E[0, 2]
    l1 = E[1, 0] * x + E[1, 1] * y + E[1, 2]
    l2 = E[2, 0] * x + E[2, 1] * y + E[2, 2]
    lp0 = E[0, 0] * u + E[1, 0] * v + E[2, 0]
    lp1 = E[0, 1] * u + E[1, 1] * v + E[2, 1]
    num = u * l0 + v * l1 + l2
    den = jnp.sqrt(jnp.maximum(l0 * l0 + l1 * l1 + lp0 * lp0 + lp1 * lp1, 1e-12))
    return num / den


def _tangent_basis(t: jnp.ndarray):
    """Two unit vectors orthogonal to t (columns of a (3, 2) basis)."""
    # Pick the axis least aligned with t for a stable first cross product.
    ref = jnp.where(
        jnp.abs(t[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], t.dtype),
        jnp.asarray([0.0, 1.0, 0.0], t.dtype),
    )
    b1 = jnp.cross(t, ref)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t, b1)
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2), 1e-12)
    return jnp.stack([b1, b2], axis=-1)


@f32
def refine_relative_pose(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
    weights: jnp.ndarray,
    iterations: int = 10,
    damping: float = 1e-6,
):
    """Refine (R, t) minimising weighted Sampson error.

    Args:
      R0, t0: initial rotation / unit translation (x_b ~ R x_a + t).
      pts_a, pts_b: (N, 2) normalized correspondences.
      weights: (N,) inlier weights (0/1 or robust).
      iterations: fixed GN iterations (branchless accept/reject).

    Returns (R, t, final_cost)."""
    w = weights

    def cost_of(R, t):
        r = _sampson_residuals(_essential_from_rt(R, t), pts_a, pts_b)
        return jnp.sum(w * r * r)

    def residuals_of(params, R, t):
        phi = params[:3]
        dt = params[3:]
        Rp = so3_exp(phi) @ R
        B = _tangent_basis(t)
        tp = t + B @ dt
        tp = tp / jnp.maximum(jnp.linalg.norm(tp), 1e-12)
        E = _essential_from_rt(Rp, tp)
        return jnp.sqrt(jnp.maximum(w, 0.0)) * _sampson_residuals(E, pts_a, pts_b)

    def body(carry, _):
        R, t, lam, cost = carry
        zero = jnp.zeros((5,), R.dtype)
        J = jax.jacfwd(residuals_of)(zero, R, t)      # (N, 5)
        r = residuals_of(zero, R, t)                   # (N,)
        H = J.T @ J + (lam + 1e-9) * jnp.eye(5, dtype=R.dtype)
        g = J.T @ r
        # Unrolled Cholesky: jnp.linalg.solve would lower to a LAPACK
        # custom call on CPU (un-exportable, see utils/aot.py) and HLO
        # LU on TPU; H is SPD by construction.
        step = -cholesky_solve_small(H, g)
        Rn = so3_exp(step[:3]) @ R
        B = _tangent_basis(t)
        tn = t + B @ step[3:]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        new_cost = cost_of(Rn, tn)
        accept = new_cost < cost
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 10.0), 1e-10, 1e4)
        return (R, t, lam, cost), cost

    init_cost = cost_of(R0, t0)
    (R, t, _, cost), _ = jax.lax.scan(
        body,
        (R0, t0, jnp.asarray(damping, R0.dtype), init_cost),
        None,
        length=iterations,
    )
    return R, t, cost
