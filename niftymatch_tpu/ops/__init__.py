"""Compute ops: TPU-native equivalents of the reference's kernel layer
(``src/gpu/kernels/``, SURVEY.md §2 L2)."""

from .filters import convolve_separable, downsample_by_2, gaussian_kernel_1d
from .gradients import dog_stack, gradient_polar, mod_2pi
from .image import (
    bgra_to_gray,
    cast_saturate,
    extract_channel,
    put_channel,
    set_alpha,
    subtract_images,
    transpose_2d,
)
from .keypoints import Keypoints, detect_keypoints, extrema_mask
from .match import (
    MatchResult,
    match_descriptors,
    mutual_matches,
    pairwise_sq_distances,
    ratio_test_matches,
)
from .orientation import compute_orientations, pick_peaks, smooth_histogram
from .descriptor import compute_descriptors, normalize_descriptors
from .patches import gather_patches
from .pyramid import OctaveData, build_pyramid, gaussian_kernels
from .warp import (
    bilinear_sample,
    blend_into_mosaic,
    perspective_coords,
    remap,
    undistort_map,
    warp_mask,
    warp_perspective,
)

__all__ = [
    "convolve_separable",
    "downsample_by_2",
    "gaussian_kernel_1d",
    "dog_stack",
    "gradient_polar",
    "mod_2pi",
    "bgra_to_gray",
    "cast_saturate",
    "extract_channel",
    "put_channel",
    "set_alpha",
    "subtract_images",
    "transpose_2d",
    "Keypoints",
    "detect_keypoints",
    "extrema_mask",
    "MatchResult",
    "match_descriptors",
    "mutual_matches",
    "pairwise_sq_distances",
    "ratio_test_matches",
    "compute_orientations",
    "pick_peaks",
    "smooth_histogram",
    "compute_descriptors",
    "normalize_descriptors",
    "gather_patches",
    "OctaveData",
    "build_pyramid",
    "gaussian_kernels",
    "bilinear_sample",
    "blend_into_mosaic",
    "perspective_coords",
    "remap",
    "undistort_map",
    "warp_mask",
    "warp_perspective",
]
