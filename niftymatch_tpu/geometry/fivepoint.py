"""Nister/Stewenius 5-point minimal essential-matrix solver, TPU-native.

The reference's RANSAC philosophy is "k = the smallest sufficient sample"
(``src/gpu/kernels/ransac.cu:637-694``: k=1/2/4 for translation/similarity/
homography); its batched-small-linalg style (one tiny fixed-size problem per
hypothesis, ``src/gpu/kernels/svd.cu:201-360``) is the shape class this
solver lives in.  The 8-point *minimal* sample used previously needs
inlier_fraction^8 per good hypothesis; 5-point needs inlier_fraction^5 —
several times fewer iterations at realistic contamination.

TPU-first formulation (no ``jnp.linalg.eig``, which has no TPU lowering):

1. Null space of the 5x9 epipolar system via batched 9x9 Jacobi eigh
   (``linalg.jacobi_eigh``) -> E = x*E1 + y*E2 + z*E3 + E4.
2. The ten cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
   are expanded into the 20-monomial Nister basis **numerically**: each
   constraint is evaluated at 20 fixed generic sample points (x, y, z) and
   the coefficient vector recovered with a precomputed (float64, import
   time) inverse of the constant monomial matrix — no symbolic algebra,
   no transliterated expansion tables.
3. Gauss-Jordan reduction = one batched 10x10 ``jnp.linalg.solve``;
   Nister's <k>,<l>,<m> row combinations give the 3x3 polynomial matrix
   B(z) with degree-(3,3,4) entries; det B(z) is a degree-10 polynomial
   assembled by fixed-size convolutions.
4. All ten roots via fixed-iteration Durand-Kerner (complex64, branchless)
   — the TPU replacement for the companion-matrix eigensolve.
5. For each (approximately) real root, (x, y) are recovered *linearly*
   from the null vector of B(z) (largest cross product of its rows).

Returns all 10 candidates with a validity mask; invalid slots are zero
matrices that score zero inliers downstream.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.precision import f32
from .linalg import sorted_eigh

# ---------------------------------------------------------------------------
# Constant monomial machinery (built once, float64, at import time).
# Nister's monomial order: leading 10 (eliminated) then trailing 10.
#   0:x3 1:y3 2:x2y 3:xy2 4:x2z 5:x2 6:y2z 7:y2 8:xyz 9:xy
#  10:xz2 11:xz 12:x 13:yz2 14:yz 15:y 16:z3 17:z2 18:z 19:1
# ---------------------------------------------------------------------------
_EXPONENTS = np.array(
    [
        (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
        (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
        (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
        (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
    ]
)

# Generic sample points: standard normal draws give cond(M) ~ 2.7e3 for this
# seed — comfortably invertible in float64; the inverse is then a constant.
_SAMPLES = np.random.default_rng(3).standard_normal((20, 3))
_MONO = np.prod(_SAMPLES[:, None, :] ** _EXPONENTS[None, :, :], axis=-1)
_MONO_INV_T = np.linalg.inv(_MONO).T.astype(np.float32)   # (20, 20)
_SAMPLES_F32 = _SAMPLES.astype(np.float32)


def _trace_constraints(E: jnp.ndarray) -> jnp.ndarray:
    """The 10 cubic constraint values for a (..., 3, 3) essential candidate:
    nine entries of 2 E E^T E - tr(E E^T) E, plus det E."""
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = EEt[..., 0, 0] + EEt[..., 1, 1] + EEt[..., 2, 2]
    C = 2.0 * (EEt @ E) - tr[..., None, None] * E
    detE = jnp.linalg.det(E)
    return jnp.concatenate(
        [C.reshape(*C.shape[:-2], 9), detE[..., None]], axis=-1
    )


def _conv(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full polynomial product (coefficients highest-first, static sizes)."""
    return jnp.convolve(a, b, mode="full")


def _poly_roots10(c: jnp.ndarray, iters: int = 60):
    """All roots of a degree-10 polynomial (coeffs (11,), highest first) by
    fixed-iteration Durand-Kerner.  Complex arithmetic is carried as
    explicit (re, im) float32 pairs — no complex dtype, so the kernel runs
    on any backend (the tunneled TPU plugin lacks complex lowerings).
    Returns (re (10,), im (10,), ok () bool); ok is False when the leading
    coefficient vanishes (degenerate hypothesis)."""
    scale = jnp.max(jnp.abs(c))
    # A *small* leading coefficient just means some roots are large (they
    # score zero inliers anyway); only a vanishing one (degree collapse) is
    # degenerate.  Monic normalisation must happen in either case or the
    # Durand-Kerner correction term is meaningless.
    ok = jnp.abs(c[0]) > 1e-9 * jnp.maximum(scale, 1e-30)
    cm = c / jnp.where(ok, c[0], jnp.float32(1e-9) * scale + 1e-30)
    n = 10
    radius = 1.0 + jnp.max(jnp.abs(cm[1:])) ** (1.0 / n)
    k = jnp.arange(n, dtype=jnp.float32)
    theta = 2.0 * jnp.pi * (k + 0.35) / n
    wr0 = radius * jnp.cos(theta)
    wi0 = radius * jnp.sin(theta)

    def body(carry, _):
        wr, wi = carry
        # Horner, real/imag split (coefficients are real).
        pr = jnp.full_like(wr, cm[0])
        pi = jnp.zeros_like(wi)
        for i in range(1, 11):       # static unroll
            pr, pi = pr * wr - pi * wi + cm[i], pr * wi + pi * wr
        # Correction p / prod_{j != k}(w_k - w_j) by SEQUENTIAL safe
        # division — forming the full product first overflows float32
        # (|q|^2 can exceed 3e38 when iterates roam; that was turning
        # whole root sets to NaN).
        dr = wr[:, None] - wr[None, :] + jnp.eye(n, dtype=wr.dtype)
        di = wi[:, None] - wi[None, :]
        cr, ci = pr, pi
        for j in range(n):
            a, b = dr[:, j], di[:, j]
            den = jnp.maximum(a * a + b * b, 1e-30)
            cr, ci = (cr * a + ci * b) / den, (ci * a - cr * b) / den
        wr_n, wi_n = wr - cr, wi - ci
        # Self-heal: a root that still went non-finite restarts on the
        # initial circle instead of poisoning every other root through the
        # pairwise difference matrix.
        fin = jnp.isfinite(wr_n) & jnp.isfinite(wi_n)
        return (
            jnp.where(fin, wr_n, wr0),
            jnp.where(fin, wi_n, wi0),
        ), None

    (wr, wi), _ = jax.lax.scan(body, (wr0, wi0), None, length=iters)
    return wr, wi, ok


@f32
def essential_from_five(src: jnp.ndarray, dst: jnp.ndarray):
    """Up to 10 essential matrices from exactly 5 correspondences.

    Args:
      src, dst: (5, 2) normalised camera coordinates, convention
        ``dst_h^T E src_h = 0`` (matches ``fit_fundamental``).

    Returns:
      (E (10, 3, 3), valid (10,) bool).  Invalid slots are zeros.
    """
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    one = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], axis=-1)

    # Null basis: 4 smallest eigenvectors of A^T A (9x9 Jacobi eigh).
    _, V = sorted_eigh(A.T @ A)
    basis = V[:, :4].T.reshape(4, 3, 3)          # (4, 3, 3)
    E1, E2, E3, E4 = basis[0], basis[1], basis[2], basis[3]

    # Constraint coefficients by evaluation at the fixed sample points.
    t = jnp.asarray(_SAMPLES_F32)                 # (20, 3)
    Es = (
        t[:, 0, None, None] * E1
        + t[:, 1, None, None] * E2
        + t[:, 2, None, None] * E3
        + E4
    )                                             # (20, 3, 3)
    vals = _trace_constraints(Es)                 # (20, 10)
    coeffs = vals.T @ jnp.asarray(_MONO_INV_T)    # (10, 20)

    # Gauss-Jordan: express leading monomials in the trailing basis.
    At = jnp.linalg.solve(coeffs[:, :10], coeffs[:, 10:])   # (10, 10)

    # Nister's <k>=<x2z>-z<x2>, <l>=<y2z>-z<y2>, <m>=<xyz>-z<xy> rows.
    def row_pair(a, b):
        px = jnp.stack([-b[0], a[0] - b[1], a[1] - b[2], a[2]])
        py = jnp.stack([-b[3], a[3] - b[4], a[4] - b[5], a[5]])
        p1 = jnp.stack([-b[6], a[6] - b[7], a[7] - b[8], a[8] - b[9], a[9]])
        return px, py, p1

    K = row_pair(At[4], At[5])
    L = row_pair(At[6], At[7])
    Mr = row_pair(At[8], At[9])
    (kx, ky, k1), (lx, ly, l1), (mx, my, m1) = K, L, Mr

    # det B(z): degree-10 polynomial via fixed-size convolutions.
    t1 = _conv(ly, m1) - _conv(my, l1)            # (8,)
    t2 = _conv(lx, m1) - _conv(mx, l1)            # (8,)
    t3 = _conv(lx, my) - _conv(mx, ly)            # (7,)
    n10 = _conv(kx, t1) - _conv(ky, t2) + _conv(k1, t3)   # (11,)

    re, _, poly_ok = _poly_roots10(n10)

    # Real-domain Newton polish of each root's real part, then accept a
    # root iff the polished value actually annihilates the polynomial
    # (relative to the |coefficient|-majorised magnitude) — this both
    # tightens real roots and rejects complex-pair projections, replacing
    # any imaginary-part thresholding.
    cmono = n10 / jnp.where(poly_ok, n10[0], 1.0)
    z = re
    for _ in range(6):                             # static Newton unroll
        p = jnp.full_like(z, cmono[0])
        dp = jnp.zeros_like(z)
        for i in range(1, 11):
            dp = dp * z + p
            p = p * z + cmono[i]
        z = z - p / jnp.where(jnp.abs(dp) > 1e-20, dp, 1.0)
    p = jnp.full_like(z, cmono[0])
    pa = jnp.full_like(z, jnp.abs(cmono[0]))
    az = jnp.abs(z)
    for i in range(1, 11):
        p = p * z + cmono[i]
        pa = pa * az + jnp.abs(cmono[i])
    is_real = jnp.abs(p) <= 1e-3 * jnp.maximum(pa, 1e-20)

    # (x, y) per root: null vector of B(z) from its best row cross product.
    pz3 = jnp.stack([z**3, z**2, z, jnp.ones_like(z)], axis=-1)   # (10, 4)
    pz4 = jnp.stack([z**4, z**3, z**2, z, jnp.ones_like(z)], axis=-1)
    Bz = jnp.stack(
        [
            jnp.stack([pz3 @ kx, pz3 @ ky, pz4 @ k1], axis=-1),
            jnp.stack([pz3 @ lx, pz3 @ ly, pz4 @ l1], axis=-1),
            jnp.stack([pz3 @ mx, pz3 @ my, pz4 @ m1], axis=-1),
        ],
        axis=-2,
    )                                              # (10, 3, 3)
    crosses = jnp.stack(
        [
            jnp.cross(Bz[:, 0], Bz[:, 1]),
            jnp.cross(Bz[:, 0], Bz[:, 2]),
            jnp.cross(Bz[:, 1], Bz[:, 2]),
        ],
        axis=-2,
    )                                              # (10, 3, 3)
    norms = jnp.linalg.norm(crosses, axis=-1)
    pick = jnp.argmax(norms, axis=-1)
    vvec = jnp.take_along_axis(crosses, pick[:, None, None], axis=-2)[:, 0]
    w_ok = jnp.abs(vvec[:, 2]) > 1e-12
    wsafe = jnp.where(w_ok, vvec[:, 2], 1.0)
    xs = vvec[:, 0] / wsafe
    ys = vvec[:, 1] / wsafe

    E = (
        xs[:, None, None] * E1
        + ys[:, None, None] * E2
        + z[:, None, None] * E3
        + E4
    )                                              # (10, 3, 3)
    norm = jnp.linalg.norm(E.reshape(10, 9), axis=-1)
    E = E / jnp.maximum(norm, 1e-20)[:, None, None]

    valid = is_real & w_ok & poly_ok & (norm > 1e-12)
    E = jnp.where(valid[:, None, None], E, jnp.zeros_like(E))
    return E, valid


@f32
def fit_essential5(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
):
    """RANSAC-fitter adapter: gather the 5 points selected by ``weights``
    (a 0/1 sample-selection vector, as produced by ``_sample_weights``) and
    run the minimal solver.  Returns ((10, 3, 3) candidates, (10,) valid)."""
    _, idx = jax.lax.top_k(weights, 5)
    return essential_from_five(src[idx], dst[idx])
