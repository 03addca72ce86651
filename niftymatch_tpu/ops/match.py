"""Brute-force descriptor matching: distance GEMM + Lowe ratio test.

Reference parity (``src/gpu/kernels/match.cu`` + ``siftfunctions.cu:15-40``):

* ``brute_force_distance`` (:13-80) computes the all-pairs squared-L2 matrix
  ``D[a, b] = ||A_a - B_b||^2`` via explicit differencing with shared-memory
  B tiles (requiring two extra transposes in the caller,
  ``siftfunctions.cu:25,34``).  On TPU this is the textbook MXU formulation
  (SURVEY.md §7.3): ``||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b`` — one GEMM
  plus broadcast norms, no transposes, no materialised intermediate beyond
  the distance matrix itself (and the fused Pallas path avoids even that).
* ``set_matches`` (:82-117): per A-row 2-NN scan; match index ``argmin`` iff
  ``min1/min2 < ambiguity`` (default 0.8) **and** ``min2 > 0`` (:107-115 —
  a zero second-best distance leaves the -1 sentinel in place).  Sentinel -1
  matches ``SiftData::_match_indexes`` initialisation (``siftdata.cu:21``).

Masking: invalid descriptor slots (fixed-capacity layout) are excluded by
forcing their distances to +inf on both sides.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MatchResult(NamedTuple):
    indices: jnp.ndarray    # (A,) int32 index into B, -1 if unmatched
    distances: jnp.ndarray  # (A,) squared L2 distance of best match
    ratios: jnp.ndarray     # (A,) min1/min2 ratio (1.0 where undefined)


def pairwise_sq_distances(
    a: jnp.ndarray,
    b: jnp.ndarray,
    precision: str = "fp32",
) -> jnp.ndarray:
    """All-pairs squared L2 distances, (A, D) x (B, D) -> (A, B).

    MXU formulation of ``brute_force_distance`` (``match.cu:13-80``).
    ``precision='bf16'`` casts the GEMM inputs to bfloat16 (norms stay fp32);
    accumulation is always fp32.
    """
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    a_norm = jnp.sum(a32 * a32, axis=-1)
    b_norm = jnp.sum(b32 * b32, axis=-1)
    if precision == "bf16":
        ab = jnp.dot(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    else:
        ab = jnp.dot(a32, b32.T, preferred_element_type=jnp.float32)
    d = a_norm[:, None] + b_norm[None, :] - 2.0 * ab
    return jnp.maximum(d, 0.0)


def top2_min(d: jnp.ndarray):
    """Row-wise (min1, argmin1, min2) — the 2-NN scan of ``match.cu:88-105``.

    Ties resolve to the lowest index, matching the reference's strict-``<``
    scan.  ``min2`` is the smallest distance at any *other* column (equal
    values at different columns count, as in the reference).
    """
    min1 = jnp.min(d, axis=-1)
    idx1 = jnp.argmin(d, axis=-1)
    cols = jnp.arange(d.shape[-1])
    masked = jnp.where(cols[None, :] == idx1[:, None], jnp.inf, d)
    min2 = jnp.min(masked, axis=-1)
    return min1, idx1.astype(jnp.int32), min2


def ratio_test_matches(
    dist: jnp.ndarray,
    ambiguity: float = 0.8,
    a_valid: jnp.ndarray | None = None,
    b_valid: jnp.ndarray | None = None,
) -> MatchResult:
    """Lowe ratio test on a distance matrix (``set_matches``,
    ``match.cu:82-117``)."""
    if b_valid is not None:
        dist = jnp.where(b_valid[None, :], dist, jnp.inf)
    min1, idx1, min2 = top2_min(dist)
    ratio = min1 / jnp.where(min2 > 0.0, min2, 1.0)
    ok = (min2 > 0.0) & (ratio < ambiguity) & jnp.isfinite(min1)
    if a_valid is not None:
        ok = ok & a_valid
    return MatchResult(
        indices=jnp.where(ok, idx1, -1),
        distances=jnp.where(jnp.isfinite(min1), min1, 0.0),
        ratios=jnp.where(min2 > 0.0, ratio, 1.0),
    )


def match_descriptors(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    ambiguity: float = 0.8,
    a_valid: jnp.ndarray | None = None,
    b_valid: jnp.ndarray | None = None,
    precision: str = "fp32",
) -> MatchResult:
    """End-to-end equivalent of ``compute_sift_matches``
    (``siftfunctions.cu:15-40``): distance GEMM + ratio-test matching."""
    d = pairwise_sq_distances(desc_a, desc_b, precision=precision)
    return ratio_test_matches(d, ambiguity, a_valid, b_valid)


def mutual_matches(fwd: MatchResult, bwd: MatchResult) -> jnp.ndarray:
    """Cross-check filter (new; not in the reference): keep A->B matches whose
    B->A match points back.  Returns filtered indices with -1 sentinels."""
    a_idx = jnp.arange(fwd.indices.shape[0], dtype=jnp.int32)
    back = jnp.where(fwd.indices >= 0, bwd.indices[fwd.indices], -2)
    return jnp.where(back == a_idx, fwd.indices, -1)


def mutual_ratio_match(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ambiguity: float = 0.8,
) -> jnp.ndarray:
    """Mutual (cross-checked) Lowe-ratio match indices for one pair:
    distance GEMM -> forward/backward ratio tests -> cross-check.
    Shared by the loop-closure candidate matcher and the relocalization
    scorer (both vmap it over batches)."""
    dm = pairwise_sq_distances(desc_a, desc_b)
    fwd = ratio_test_matches(dm, ambiguity, valid_a, valid_b)
    bwd = ratio_test_matches(dm.T, ambiguity, valid_b, valid_a)
    return mutual_matches(fwd, bwd)
