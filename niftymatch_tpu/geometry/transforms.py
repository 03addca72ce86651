"""2-D / two-view transform estimators (minimal-sample and least-squares).

Reference parity (``src/gpu/kernels/ransac.cu``):

* ``compute_translation`` (:314-320)          -> :func:`fit_translation`
* ``compute_similarity_transform`` (:322-434) -> :func:`fit_similarity`
  (the reference solves a Hartley-normalised 4x5 system via Jacobi SVD; we
  use the closed-form normal equations of the same LS problem, which handle
  the minimal 2-point case and arbitrary-k refits identically)
* ``compute_homography_2`` (:84-215)          -> :func:`fit_homography`
  (Hartley-normalised DLT; null vector from Jacobi eigh of A^T A instead of
  a 9x9 SVD — same subspace, symmetric form is cheaper and batches better)
* essential/fundamental 8-point (new, required for SLAM — SURVEY.md §7 M2)

All solvers are mask-weighted: points with weight 0 do not influence the
fit, so the same code path serves vmapped minimal samples (weights = one-hot
sample selection) and full least-squares refits on inlier sets.  Everything
is branchless and fixed-shape for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.precision import f32

from .linalg import smallest_eigvec, solve3x3, svd3x3


@f32
def apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 3, 3) projective transform to (..., N, 2) points.

    Matches ``eval_transformation``'s projective division
    (``ransac.cu:61-72``); a near-zero denominator is guarded to keep the
    result finite (the reference divides unguarded)."""
    x, y = pts[..., 0], pts[..., 1]
    xp = H[..., 0, 0, None] * x + H[..., 0, 1, None] * y + H[..., 0, 2, None]
    yp = H[..., 1, 0, None] * x + H[..., 1, 1, None] * y + H[..., 1, 2, None]
    w = H[..., 2, 0, None] * x + H[..., 2, 1, None] * y + H[..., 2, 2, None]
    w = jnp.where(jnp.abs(w) > 1e-12, w, jnp.where(w < 0, -1e-12, 1e-12))
    return jnp.stack([xp / w, yp / w], axis=-1)


@f32
def transfer_sq_error(
    H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """Squared forward-transfer error ||H(src) - dst||^2 per point — the
    inlier metric of ``eval_transformation`` (``ransac.cu:74-77``)."""
    proj = apply_homography(H, src)
    d = proj - dst
    return jnp.sum(d * d, axis=-1)


def _weighted_mean(pts: jnp.ndarray, w: jnp.ndarray):
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    mean = jnp.sum(pts * w[..., None], axis=-2) / wsum
    return mean, wsum[..., 0]


@f32
def hartley_normalization(pts: jnp.ndarray, w: jnp.ndarray):
    """Similarity T mapping weighted points to centroid 0, mean norm sqrt(2)
    (the conditioning transform of ``ransac.cu:105-131``).

    Returns (normalized_pts, T (..., 3, 3))."""
    mean, wsum = _weighted_mean(pts, w)
    centered = pts - mean[..., None, :]
    mean_dist = (
        jnp.sum(jnp.linalg.norm(centered, axis=-1) * w, axis=-1) / wsum
    )
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-12)
    normed = centered * scale[..., None, None]
    z = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    T = jnp.stack(
        [
            jnp.stack([scale, z, -scale * mean[..., 0]], axis=-1),
            jnp.stack([z, scale, -scale * mean[..., 1]], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )
    return normed, T


@f32
def fit_translation(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted-mean translation (``compute_translation``, ``ransac.cu:314-320``
    uses a single sample; the weighted mean reduces to it for one-hot w)."""
    ms, _ = _weighted_mean(src, weights)
    md, _ = _weighted_mean(dst, weights)
    t = md - ms
    z = jnp.zeros_like(t[..., 0])
    one = jnp.ones_like(t[..., 0])
    return jnp.stack(
        [
            jnp.stack([one, z, t[..., 0]], axis=-1),
            jnp.stack([z, one, t[..., 1]], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )


@f32
def fit_similarity(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted LS similarity [a -b tx; b a ty; 0 0 1].

    Same objective as the reference's normalised 4x5 SVD system
    (``ransac.cu:322-434``); after centring both clouds the normal equations
    decouple, giving a closed form (Umeyama without the rotation/scale
    split)."""
    ms, wsum = _weighted_mean(src, weights)
    md, _ = _weighted_mean(dst, weights)
    cs = src - ms[..., None, :]
    cd = dst - md[..., None, :]
    w = weights
    sxx = jnp.sum(w * (cs[..., 0] ** 2 + cs[..., 1] ** 2), axis=-1)
    a_num = jnp.sum(w * (cs[..., 0] * cd[..., 0] + cs[..., 1] * cd[..., 1]), axis=-1)
    b_num = jnp.sum(w * (cs[..., 0] * cd[..., 1] - cs[..., 1] * cd[..., 0]), axis=-1)
    denom = jnp.maximum(sxx, 1e-12)
    a = a_num / denom
    b = b_num / denom
    tx = md[..., 0] - (a * ms[..., 0] - b * ms[..., 1])
    ty = md[..., 1] - (b * ms[..., 0] + a * ms[..., 1])
    z = jnp.zeros_like(a)
    one = jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([a, -b, tx], axis=-1),
            jnp.stack([b, a, ty], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )


@f32
def fit_homography(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted DLT homography with Hartley normalisation
    (``compute_homography_2``, ``ransac.cu:84-215``).

    Builds the 9x9 normal matrix sum_i w_i (r_i r_i^T) over the two DLT rows
    per correspondence and extracts its smallest eigenvector — algebraically
    the same null space the reference's 9x9 Jacobi SVD finds.  Result is
    scaled so H[2,2] = 1 (as the reference's final division,
    ``ransac.cu:207-213``)."""
    ns, Ts = hartley_normalization(src, weights)
    nd, Td = hartley_normalization(dst, weights)
    x, y = ns[..., 0], ns[..., 1]
    u, v = nd[..., 0], nd[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Row pair of the DLT system A h = 0 per correspondence.
    r1 = jnp.stack(
        [zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1
    )
    r2 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    w = weights[..., None, None]
    M = jnp.sum(
        w * (r1[..., :, None] * r1[..., None, :])
        + w * (r2[..., :, None] * r2[..., None, :]),
        axis=-3,
    )
    h = smallest_eigvec(M)
    Hn = h.reshape(*h.shape[:-1], 3, 3)
    # Denormalise: H = Td^-1 Hn Ts  (expanded symbolically in the reference,
    # ransac.cu:190-206; we solve against Td instead).
    HT = Hn @ Ts
    H = jnp.stack([solve3x3(Td, HT[..., :, i]) for i in range(3)], axis=-1)
    scale = H[..., 2, 2]
    safe = jnp.where(jnp.abs(scale) > 1e-12, scale, 1.0)
    return H / safe[..., None, None]


@f32
def fit_fundamental(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted normalised 8-point fundamental matrix (new; SLAM front-end).

    Constraint dst_h^T F src_h = 0; rank-2 projection via batched 3x3 SVD."""
    ns, Ts = hartley_normalization(src, weights)
    nd, Td = hartley_normalization(dst, weights)
    x, y = ns[..., 0], ns[..., 1]
    u, v = nd[..., 0], nd[..., 1]
    one = jnp.ones_like(x)
    r = jnp.stack(
        [u * x, u * y, u, v * x, v * y, v, x, y, one], axis=-1
    )
    w = weights[..., None, None]
    M = jnp.sum(w * (r[..., :, None] * r[..., None, :]), axis=-3)
    f = smallest_eigvec(M)
    Fn = f.reshape(*f.shape[:-1], 3, 3)
    # Rank-2 projection.
    U, S, Vt = svd3x3(Fn)
    S2 = S.at[..., 2].set(0.0)
    Fn = (U * S2[..., None, :]) @ Vt
    F = jnp.swapaxes(Td, -1, -2) @ Fn @ Ts
    norm = jnp.linalg.norm(F.reshape(*F.shape[:-2], 9), axis=-1)
    return F / jnp.maximum(norm, 1e-20)[..., None, None]


@f32
def fit_essential(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted 8-point essential matrix on *normalised camera coordinates*
    (new; SLAM front-end).  Projects onto the essential manifold
    (singular values (1, 1, 0))."""
    E = fit_fundamental(src, dst, weights)
    U, S, Vt = svd3x3(E)
    s = 0.5 * (S[..., 0] + S[..., 1])
    S2 = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    E = (U * S2[..., None, :]) @ Vt
    norm = jnp.linalg.norm(E.reshape(*E.shape[:-2], 9), axis=-1)
    return E / jnp.maximum(norm, 1e-20)[..., None, None]


@f32
def sampson_sq_error(
    F: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """First-order (Sampson) squared epipolar error for F/E inlier tests."""
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    # l = F @ src_h ; l' = F^T @ dst_h
    l0 = F[..., 0, 0, None] * x + F[..., 0, 1, None] * y + F[..., 0, 2, None]
    l1 = F[..., 1, 0, None] * x + F[..., 1, 1, None] * y + F[..., 1, 2, None]
    l2 = F[..., 2, 0, None] * x + F[..., 2, 1, None] * y + F[..., 2, 2, None]
    lp0 = F[..., 0, 0, None] * u + F[..., 1, 0, None] * v + F[..., 2, 0, None]
    lp1 = F[..., 0, 1, None] * u + F[..., 1, 1, None] * v + F[..., 2, 1, None]
    num = (u * l0 + v * l1 + l2) ** 2
    den = l0 * l0 + l1 * l1 + lp0 * lp0 + lp1 * lp1
    return num / jnp.maximum(den, 1e-12)
