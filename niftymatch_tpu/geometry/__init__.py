"""Robust two-view geometry: batched linalg, transform solvers, RANSAC.

TPU-native replacement for ``src/gpu/kernels/ransac.{h,cu}`` +
``svd.cu`` (see SURVEY.md §2 L2 rows "ransac"/"svd" and §3.3)."""

from .linalg import inv3x3, jacobi_eigh, smallest_eigvec, solve3x3, sorted_eigh, svd3x3
from .ransac import MIN_SAMPLES, RansacResult, align_points, ransac
from .transforms import (
    apply_homography,
    fit_essential,
    fit_fundamental,
    fit_homography,
    fit_similarity,
    fit_translation,
    hartley_normalization,
    sampson_sq_error,
    transfer_sq_error,
)

__all__ = [
    "MIN_SAMPLES",
    "RansacResult",
    "align_points",
    "apply_homography",
    "fit_essential",
    "fit_fundamental",
    "fit_homography",
    "fit_similarity",
    "fit_translation",
    "hartley_normalization",
    "inv3x3",
    "jacobi_eigh",
    "ransac",
    "sampson_sq_error",
    "smallest_eigvec",
    "solve3x3",
    "sorted_eigh",
    "svd3x3",
    "transfer_sq_error",
]
