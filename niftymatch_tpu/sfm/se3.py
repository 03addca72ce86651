"""Batched SO(3)/SE(3) operations (new capability; no reference analogue —
the reference stops at 2-D transforms, SURVEY.md §2).

Conventions:
* Rotations are (..., 3, 3) matrices; poses are (R, t) pairs packed as
  (..., 3, 4) "Rt" matrices mapping world -> camera: x_cam = R x_world + t.
* Tangent vectors are (..., 6) = (rho, phi) with translation first,
  matching the common BA Jacobian layout.

All ops are branchless (Taylor fallbacks near theta = 0) so they are safe
under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi)
    K2 = K @ K
    th2 = theta * theta
    small = theta < 1e-4
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(theta) / jnp.maximum(theta, _EPS))
    B = jnp.where(
        small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(th2, _EPS)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + A * K + B * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle (|phi| <= pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta[..., None] < 1e-4
    # near 0: w ~ 2 phi ; generic: phi = theta / (2 sin theta) * w
    scale = jnp.where(
        small,
        0.5 + theta[..., None] ** 2 / 12.0,
        theta[..., None] / jnp.maximum(2.0 * sin_t[..., None], _EPS),
    )
    # near pi the vee formula degenerates; fall back to the diagonal form.
    near_pi = (theta > 3.0)[..., None]
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis_sq)
    # sign disambiguation from the off-diagonal sums
    sgn = jnp.stack(
        [
            jnp.sign(R[..., 2, 1] - R[..., 1, 2]),
            jnp.sign(R[..., 0, 2] - R[..., 2, 0]),
            jnp.sign(R[..., 1, 0] - R[..., 0, 1]),
        ],
        axis=-1,
    )
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    pi_branch = axis * sgn * theta[..., None]
    return jnp.where(near_pi, pi_branch, scale * w)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) = (rho, phi) -> (..., 3, 4) Rt."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi)
    K2 = K @ K
    th2 = theta * theta
    small = theta < 1e-4
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(th2, _EPS))
    C = jnp.where(
        small,
        1.0 / 6.0 - th2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(th2 * theta, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + B * K + C * K2
    t = (V @ rho[..., None])[..., 0]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) Rt -> (..., 6)."""
    R, t = T[..., :3], T[..., 3]
    phi = so3_log(R)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi)
    K2 = K @ K
    th2 = theta * theta
    small = theta < 1e-4
    # V^{-1} = I - K/2 + (1/theta^2)(1 - A/(2B)) K^2
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(theta) / jnp.maximum(theta, _EPS))
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(th2, _EPS))
    coef = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        (1.0 - A / jnp.maximum(2.0 * B, _EPS)) / jnp.maximum(th2, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * K2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    T = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], axis=-1)
    return jnp.broadcast_to(T, (*batch_shape, 3, 4))


def se3_compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """Ta * Tb (apply Tb first): (Ra Rb | Ra tb + ta)."""
    Ra, ta = Ta[..., :3], Ta[..., 3]
    Rb, tb = Tb[..., :3], Tb[..., 3]
    R = Ra @ Rb
    t = (Ra @ tb[..., None])[..., 0] + ta
    return jnp.concatenate([R, t[..., None]], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R, t = T[..., :3], T[..., 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    return jnp.concatenate([Rt, ti[..., None]], axis=-1)


def se3_apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 3, 4) to points (..., N, 3) (or (..., 3))."""
    R, t = T[..., :3], T[..., 3]
    if pts.ndim == R.ndim - 1:  # single point per pose
        return (R @ pts[..., None])[..., 0] + t
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def se3_relative(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """T_ab = Ta^-1 * Tb (pose of b in a's frame)."""
    return se3_compose(se3_inverse(Ta), Tb)
