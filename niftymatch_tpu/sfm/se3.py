"""Batched SO(3)/SE(3) operations (new capability; no reference analogue —
the reference stops at 2-D transforms, SURVEY.md §2).

Conventions:
* Rotations are (..., 3, 3) matrices; poses are (R, t) pairs packed as
  (..., 3, 4) "Rt" matrices mapping world -> camera: x_cam = R x_world + t.
* Tangent vectors are (..., 6) = (rho, phi) with translation first,
  matching the common BA Jacobian layout.

Numerical design (fp32 + autodiff safe):
* Small-angle branches switch at theta = 0.1 — below that the *generic*
  closed forms lose all fp32 precision to cancellation (e.g. the
  ``(1 - A/2B)/theta^2`` coefficient in V^-1 is ~theta^2/12 with absolute
  fp32 error ~1e-7), while two-term Taylor series are accurate to ~1e-5
  relative.
* Taylor branches are expressed in smooth quantities (theta^2 = sum(phi^2),
  2(1 - cos theta)) — never in ``norm`` or ``arccos`` outputs, whose
  derivatives are inf/NaN at the identity and would poison jacfwd/grad
  through ``where`` (the pose-graph optimizer differentiates these maps).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.precision import f32

_EPS = 1e-12
_SMALL = 0.1  # branch threshold on theta


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


def _exp_coeffs(th2: jnp.ndarray):
    """(A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) from theta^2,
    smooth and fp32-stable on both sides of the branch."""
    small = th2 < _SMALL * _SMALL
    # Generic branch evaluated at a safe theta (discarded where small).
    th2_safe = jnp.maximum(th2, _SMALL * _SMALL)
    t = jnp.sqrt(th2_safe)
    A = jnp.where(small, 1.0 - th2 / 6.0 + th2 * th2 / 120.0, jnp.sin(t) / t)
    B = jnp.where(
        small, 0.5 - th2 / 24.0 + th2 * th2 / 720.0, (1.0 - jnp.cos(t)) / th2_safe
    )
    C = jnp.where(
        small,
        1.0 / 6.0 - th2 / 120.0 + th2 * th2 / 5040.0,
        (t - jnp.sin(t)) / (th2_safe * t),
    )
    return A, B, C


@f32
def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    th2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    K = hat(phi)
    K2 = K @ K
    A, B, _ = _exp_coeffs(th2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + A * K + B * K2


@f32
def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle (|phi| <= pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # scale = theta / (2 sin theta); small branch in t2 = 2(1 - cos theta)
    # (smooth in R — no arccos, whose derivative blows up at theta = 0).
    t2 = 2.0 * (1.0 - cos_t)  # = theta^2 - theta^4/12 + ...
    small = (t2 < _SMALL * _SMALL)[..., None]
    cos_safe = jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_safe)
    generic = theta / jnp.maximum(2.0 * jnp.sin(theta), _EPS)
    taylor = 0.5 + t2 / 12.0 + t2 * t2 / 144.0
    scale = jnp.where(small, taylor[..., None], generic[..., None])
    main = scale * w
    # Near pi the vee vector w -> 0; recover the axis from the diagonal.
    near_pi = (cos_t < -0.9999)[..., None]
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum(
        (diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0
    )
    axis = jnp.sqrt(axis_sq)
    sgn = jnp.where(w >= 0.0, 1.0, -1.0)
    pi_branch = axis * sgn * theta[..., None]
    return jnp.where(near_pi, pi_branch, main)


@f32
def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) = (rho, phi) -> (..., 3, 4) Rt."""
    rho, phi = xi[..., :3], xi[..., 3:]
    th2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    K = hat(phi)
    K2 = K @ K
    A, B, C = _exp_coeffs(th2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + A * K + B * K2
    V = eye + B * K + C * K2
    t = (V @ rho[..., None])[..., 0]
    return jnp.concatenate([R, t[..., None]], axis=-1)


@f32
def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) Rt -> (..., 6)."""
    R, t = T[..., :3], T[..., 3]
    phi = so3_log(R)
    th2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    K = hat(phi)
    K2 = K @ K
    # V^-1 = I - K/2 + coef K^2 with coef = (1 - A/(2B)) / theta^2.
    # Generic form cancels catastrophically in fp32 below theta ~ 0.1;
    # the Taylor tail 1/12 + theta^2/720 is exact to ~1e-9 there.
    small = th2 < _SMALL * _SMALL
    th2_safe = jnp.maximum(th2, _SMALL * _SMALL)
    th = jnp.sqrt(th2_safe)
    A = jnp.sin(th) / th
    B = (1.0 - jnp.cos(th)) / th2_safe
    coef = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0 + th2 * th2 / 30240.0,
        (1.0 - A / (2.0 * B)) / th2_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * K2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    T = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], axis=-1)
    return jnp.broadcast_to(T, (*batch_shape, 3, 4))


@f32
def se3_compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """Ta * Tb (apply Tb first): (Ra Rb | Ra tb + ta)."""
    Ra, ta = Ta[..., :3], Ta[..., 3]
    Rb, tb = Tb[..., :3], Tb[..., 3]
    R = Ra @ Rb
    t = (Ra @ tb[..., None])[..., 0] + ta
    return jnp.concatenate([R, t[..., None]], axis=-1)


@f32
def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R, t = T[..., :3], T[..., 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    return jnp.concatenate([Rt, ti[..., None]], axis=-1)


@f32
def se3_apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 3, 4) to points (..., N, 3) (or (..., 3))."""
    R, t = T[..., :3], T[..., 3]
    if pts.ndim == R.ndim - 1:  # single point per pose
        return (R @ pts[..., None])[..., 0] + t
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


@f32
def se3_relative(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """T_ab = Ta^-1 * Tb (pose of b in a's frame)."""
    return se3_compose(se3_inverse(Ta), Tb)


@f32
def camera_center(T: jnp.ndarray) -> jnp.ndarray:
    """World-frame camera center -R^T t of world->cam poses (..., 3, 4)."""
    R, t = T[..., :3], T[..., 3]
    return -(jnp.swapaxes(R, -1, -2) @ t[..., None])[..., 0]
