"""Sim(3) — similarity transforms for scale-drift-aware monocular SLAM.

Monocular odometry accumulates SCALE drift as well as rotation/translation
drift; an SE(3) pose graph cannot absorb it (the scale error has nowhere to
go), so loop closure must optimize over Sim(3) (Strasdat et al., "Scale
Drift-Aware Large Scale Monocular SLAM", RSS 2010 — the ORB-SLAM loop
closing formulation).  This module provides the group ops; the graph
optimizer lives in ``sfm/posegraph.py``.

Representation: ``(s, T)`` with scalar scale ``s`` and ``T = [R | t]``
(3, 4); action ``x -> s R x + t``.  Composition/inverse follow from the
action; the GN *retraction* uses component-wise exp (SO(3) exp for the
rotation block, additive translation, exponential scale), which is a valid
chart around the identity — full sim3 exp/log closed forms are not needed
for a damped GN that re-linearises each iteration.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.precision import f32
from .se3 import so3_exp, so3_log


@f32
def sim3_compose(sa, Ta, sb, Tb):
    """(sa, Ta) o (sb, Tb): x -> sa Ra (sb Rb x + tb) + ta."""
    Ra, ta = Ta[..., :3], Ta[..., 3]
    Rb, tb = Tb[..., :3], Tb[..., 3]
    R = Ra @ Rb
    t = sa * (Ra @ tb[..., None])[..., 0] + ta
    return sa * sb, jnp.concatenate([R, t[..., None]], axis=-1)


@f32
def sim3_inverse(s, T):
    R, t = T[..., :3], T[..., 3]
    s_inv = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -s_inv * (Rt @ t[..., None])[..., 0]
    return s_inv, jnp.concatenate([Rt, t_inv[..., None]], axis=-1)


@f32
def sim3_apply(s, T, pts):
    """pts (..., 3) -> s R pts + t."""
    R, t = T[..., :3], T[..., 3]
    return s * (pts @ jnp.swapaxes(R, -1, -2)) + t


@f32
def sim3_retract(xi, s, T):
    """Left retraction by tangent xi = (rho(3), phi(3), sigma(1))."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    dR = so3_exp(phi)
    dT = jnp.concatenate([dR, rho[..., None]], axis=-1)
    return sim3_compose(jnp.exp(sigma), dT, s, T)


@f32
def sim3_error(s, T):
    """(7,) component-wise error of a near-identity sim3: zero iff
    (s, T) == identity.  Used as the edge residual metric."""
    return jnp.concatenate(
        [T[..., 3], so3_log(T[..., :3]), jnp.log(s)[..., None]], axis=-1
    )
