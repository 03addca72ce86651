"""Vmapped RANSAC for 2-D transforms and two-view geometry.

Reference parity (``src/gpu/kernels/ransac.cu``):

* ``align_points`` / ``establish_correspondences`` (:29-59)
    -> :func:`align_points` — gathers matched pairs into aligned arrays
      with a validity mask (instead of -1 coordinate sentinels).
* ``ransac_translation`` (:523-577), ``ransac_similarity`` (:579-635),
  ``ransac_homography`` (:637-694)
    -> :func:`ransac` with ``model=`` "translation" / "similarity" /
      "homography" (plus "essential" / "fundamental", new for SLAM).

TPU-first redesign (SURVEY.md §7.4): the reference copies match indices to
the host, filters valid ones on CPU, seeds a nondeterministic
``std::random_device`` ``mt19937``, and launches one CUDA thread per
hypothesis that serially counts inliers over all points.  Here:

* sampling is deterministic ``jax.random`` (keyed), entirely on device —
  no host round-trips;
* per-hypothesis minimal samples are drawn *distinct and valid* via
  Gumbel-top-k: uniform scores masked to valid points, ``top_k`` picks k
  distinct indices (the reference instead re-rolls duplicates into a
  degenerate hypothesis it discards, ``ransac.cu:501-506``);
* all hypotheses are solved by one ``vmap`` over the mask-weighted solvers;
* hypothesis scoring is one (hypotheses x points) masked reduction — a
  VPU-shaped broadcast, no serial loop.  Transfer-error models use the
  MSAC truncated quadratic ``sum(min(err, tau))`` rather than the
  reference's raw inlier count (``eval_transformation``,
  ``ransac.cu:61-82``), which mis-ranks biased models on few clustered
  correspondences; epipolar models keep count-argmax (see the scoring
  comment in :func:`ransac`);
* optional least-squares refit on the winner's inliers (new — the
  reference returns the raw minimal-sample model).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32

from ..config import RansacConfig
from .transforms import (
    fit_essential,
    fit_fundamental,
    fit_homography,
    fit_similarity,
    fit_translation,
    sampson_sq_error,
    transfer_sq_error,
)

MIN_SAMPLES = {
    "translation": 1,   # ransac.cu:529 (k=1)
    "similarity": 2,    # ransac.cu:585 (k=2)
    "homography": 4,    # ransac.cu:643 (k=4)
    "fundamental": 8,
    "essential": 8,
    "essential5": 5,    # Nister minimal solver (geometry/fivepoint.py)
}

_FITTERS = {
    "translation": fit_translation,
    "similarity": fit_similarity,
    "homography": fit_homography,
    "fundamental": fit_fundamental,
    "essential": fit_essential,
}


def _error_fn(model: str):
    if model in ("fundamental", "essential", "essential5"):
        return sampson_sq_error
    return transfer_sq_error


class RansacResult(NamedTuple):
    """Fixed-shape RANSAC output (all device values; no host sync)."""

    transform: jnp.ndarray    # (3, 3) best model (H / F / E / similarity...)
    inliers: jnp.ndarray      # (N,) bool inlier mask under the best model
    num_inliers: jnp.ndarray  # () int32
    success: jnp.ndarray      # () bool — enough valid points & nonzero inliers


@f32
def align_points(
    xa: jnp.ndarray,
    ya: jnp.ndarray,
    xb: jnp.ndarray,
    yb: jnp.ndarray,
    match_indices: jnp.ndarray,
    a_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather matched coordinate pairs into aligned (N, 2) arrays + mask.

    Equivalent of ``align_points``/``establish_correspondences``
    (``ransac.cu:29-59``): row i holds (A_i, B_{match[i]}); unmatched rows
    are masked out (the reference writes -1 sentinels instead)."""
    ok = match_indices >= 0
    if a_valid is not None:
        ok = ok & a_valid
    safe = jnp.maximum(match_indices, 0)
    src = jnp.stack([xa, ya], axis=-1)
    dst = jnp.stack([xb[safe], yb[safe]], axis=-1)
    zeros = jnp.zeros_like(src)
    return (
        jnp.where(ok[:, None], src, zeros),
        jnp.where(ok[:, None], dst, zeros),
        ok,
    )


def _sample_weights(key, mask: jnp.ndarray, iterations: int, k: int):
    """(iterations, N) one-hot-sum sample weights: each row selects k
    distinct valid points via Gumbel-top-k.

    Implemented as a k-step scan of masked argmax-and-knockout rather
    than ``lax.top_k`` + scatter: the sort and scatter each cost seconds
    of XLA compile time at verification batch shapes (VERDICT r3 #4),
    while k broadcast-compare passes compile in milliseconds and select
    the identical index set (ties broken to the lowest column, and rows
    with < k valid points end up with < k ones — dropped by the caller's
    ``live`` guard exactly as the -inf top_k columns were)."""
    n = mask.shape[0]
    g = jax.random.gumbel(key, (iterations, n), dtype=jnp.float32)
    scores = jnp.where(mask[None, :], g, -jnp.inf)
    cols = jax.lax.broadcasted_iota(jnp.int32, (iterations, n), 1)

    def step(carry, _):
        sc, w = carry
        m = jnp.max(sc, axis=-1, keepdims=True)
        hit = (sc == m) & (m > -jnp.inf)
        # Exact-tie dedup: keep only the lowest hit column.
        first = jnp.min(
            jnp.where(hit, cols, jnp.int32(2**30)), axis=-1, keepdims=True
        )
        hit = hit & (cols == first)
        return (jnp.where(hit, -jnp.inf, sc),
                w + hit.astype(jnp.float32)), None

    (_, w), _ = jax.lax.scan(
        step, (scores, jnp.zeros((iterations, n), jnp.float32)),
        None, length=k,
    )
    return w


@f32
def ransac(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    mask: jnp.ndarray,
    config: RansacConfig = RansacConfig(),
    model: str = "homography",
    key: jax.Array | None = None,
    refit: bool = True,
) -> RansacResult:
    """Robust model fit over aligned correspondences.

    Args:
      src, dst: (N, 2) matched points (fixed capacity).
      mask: (N,) bool validity.
      config: iterations / inlier threshold (squared distance, as
        ``ransac.h:12-34``) / seed.
      model: one of MIN_SAMPLES keys.
      key: optional PRNG key (defaults to ``config.seed``).
      refit: least-squares refit on the winning inlier set (new).
    """
    if key is None:
        key = jax.random.key(config.seed)
    k = MIN_SAMPLES[model]
    err_fn = _error_fn(model)

    weights = _sample_weights(key, mask, config.iterations, k)  # (I, N)
    # Degenerate hypotheses (all-zero weights -> garbage model) are dropped
    # by requiring the hypothesis actually used k samples.
    live = jnp.sum(weights, axis=-1) >= k
    if model == "essential5":
        # The minimal solver emits up to 10 candidates per sample; flatten
        # the candidate axis into the hypothesis axis and let inlier
        # counting arbitrate.  The refit below stays 8-point least-squares.
        from .fivepoint import fit_essential5

        fitter = _FITTERS["essential"]
        cand, cand_valid = jax.vmap(
            fit_essential5, in_axes=(None, None, 0)
        )(src, dst, weights)                      # (I, 10, 3, 3), (I, 10)
        models = cand.reshape(-1, 3, 3)
        live = jnp.repeat(live, 10) & cand_valid.reshape(-1)
    else:
        fitter = _FITTERS[model]
        # Direct batched call (the fitters are batch-polymorphic) rather
        # than vmap: the hypothesis batch then reaches the small-matrix
        # eigensolves as a REAL leading axis, which jacobi_eigh lays out
        # across vector lanes (see its layout note) — under vmap the batch
        # is virtual and the 9x9s land in the lane tile at <10%
        # utilisation.
        models = fitter(
            jnp.broadcast_to(src, (config.iterations, *src.shape)),
            jnp.broadcast_to(dst, (config.iterations, *dst.shape)),
            weights,
        )  # (I, 3, 3)

    errs = err_fn(models, src[None], dst[None])  # (I[*10], N)
    tau = config.inlier_threshold
    is_inlier = (errs < tau) & mask[None, :]
    # Hypothesis scoring.  For the 2-D transfer-error models the winner is
    # chosen by the MSAC truncated loss (Torr & Zisserman):
    # score = sum_j min(err_j, tau), minimised — instead of the reference's
    # raw inlier count (``eval_transformation``, ``ransac.cu:61-82``).
    # Pure counting lets a biased model that spreads residuals across the
    # whole threshold band out-count the true model when correspondences
    # are few and clustered (e.g. a scaled homography absorbing a pure
    # translation); the truncated quadratic prefers the model that fits its
    # inliers *tightly*.  The epipolar models (essential/fundamental) keep
    # count-argmax: the Sampson residual is a distance to a 1-D point-to-
    # line constraint, so "tight aggregate fit" is weak evidence and MSAC
    # there favours near-degenerate epipolar geometries that graze many
    # points; breadth of support is the meaningful signal.
    use_msac = model not in ("fundamental", "essential", "essential5")
    if use_msac:
        scores = jnp.sum(
            jnp.where(mask[None, :], jnp.minimum(errs, tau), 0.0), axis=-1
        )
        scores = jnp.where(live, scores, jnp.inf)
        best = jnp.argmin(scores)
    else:
        counts = jnp.sum(is_inlier, axis=-1) * live.astype(jnp.int32)
        best = jnp.argmax(counts)

    transform = models[best]
    inliers = is_inlier[best]
    if refit and model != "translation":
        refit_w = inliers.astype(jnp.float32)
        # Guard: refit only when the inlier set is at least the minimal size.
        can = jnp.sum(refit_w) >= k
        refitted = fitter(src, dst, refit_w)
        transform = jnp.where(can, refitted, transform)
        re_err = err_fn(transform, src, dst)
        re_inl = (re_err < tau) & mask
        if use_msac:
            re_score = jnp.sum(
                jnp.where(mask, jnp.minimum(re_err, tau), 0.0)
            )
            keep = re_score <= scores[best]
        else:
            keep = jnp.sum(re_inl) >= jnp.sum(inliers)
        transform = jnp.where(keep, transform, models[best])
        inliers = jnp.where(keep, re_inl, inliers)

    num = jnp.sum(inliers.astype(jnp.int32))
    # Reference returns false for < k valid correspondences
    # (ransac.cu:538-541,595-598,653-656); we also require a live winner.
    success = (jnp.sum(mask.astype(jnp.int32)) >= k) & (num >= k)
    return RansacResult(
        transform=transform,
        inliers=inliers,
        num_inliers=num,
        success=success,
    )
