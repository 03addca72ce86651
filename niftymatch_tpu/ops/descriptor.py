"""128-D SIFT descriptor extraction as dense tent-weight GEMMs.

Reference parity (``src/gpu/kernels/descriptor.cu``, production kernel
``kernel_descriptor_optim`` :32-145):

* geometry: ``SBP = 3 * s + eps``; window radius
  ``W = floor(sqrt(2) * SBP * (NBP+1)/2 + 0.5)`` (:54-55); patch rotated by
  the keypoint's first orientation angle (:89-105 — only ``orients[pt].x``
  is ever used); normalised coords ``nx, ny`` in spatial-bin units, ``nt`` in
  orientation-bin units (:104-107).
* weighting: Gaussian window ``exp((nx^2+ny^2) / (2 wsigma^2))`` with
  ``wsigma = NBP/2`` — reference sign flipped (:108); correct ``exp(-...)``
  is the default, gated by ``compat.flipped_gaussian_sign``.
* trilinear soft-binning over (x, y, theta) into a 4x4x8 = 128 histogram
  with layout index ``= ybin*32 + xbin*8 + tbin`` (:67-69, :134), spatial
  bins clipped to [-2, 2) (:123-126), theta circular mod 8 (:134).
* the reference never normalises (``normalize_histogram`` :14-29 is dead
  code); default here is the standard SIFT normalise -> clamp 0.2 ->
  renormalise, gated by ``compat.unnormalized_descriptors``.

TPU design (SURVEY.md §7 hard part 2): the ``atomicAdd`` scatter (:135) is
reformulated *exactly* as separable tent weights — for each patch pixel the
trilinear weights factor into per-axis tents
``relu(1 - |nx - (bx - 1.5)|)`` etc. — so the whole histogram is one batched
``(16, P^2) @ (P^2, 8)`` contraction per keypoint that maps straight onto
the MXU.  Patch radii are static per level (scale within a level is bounded
by ``sigma_0 * 2^((l+1)/num_dog_levels)``), keypoint-specific radii become
masks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import (
    DESC_MAGNIF,
    MACHINE_EPS,
    NUM_DESC_ORI_BINS,
    NUM_DESC_SPATIAL_BINS,
    SIFT_VECTOR_SIZE,
    SiftConfig,
)
from .gradients import TWO_PI, mod_2pi
from .keypoints import Keypoints
from .patches import gather_patches, gather_patches_from_stack, patch_offsets

NBO = NUM_DESC_ORI_BINS
NBP = NUM_DESC_SPATIAL_BINS


def descriptor_radius_for_sigma(sigma: float) -> int:
    """Reference window radius for a given octave-coords scale
    (``descriptor.cu:54-55``)."""
    sbp = DESC_MAGNIF * sigma + MACHINE_EPS
    return int(math.floor(math.sqrt(2.0) * sbp * (NBP + 1) / 2.0 + 0.5))


def static_radius_for_level(level: int, config: SiftConfig) -> int:
    """Compile-time patch radius bound for one keypoint level.

    A level-``l`` keypoint has ``sigma <= sigma_0 * 2^((l+1)/num_dog_levels)``
    (refinement enforces ``ds < 1``, ``keypoint.cu:170,174``).
    """
    s_max = config.sigma_0 * 2.0 ** ((level + 1.0) / config.num_dog_levels)
    return descriptor_radius_for_sigma(s_max)


def _spatial_tents(n: jnp.ndarray) -> jnp.ndarray:
    """Per-axis tent weights for the NBP spatial bins.

    ``n``: (..., P2) normalised coordinate.  Returns (..., P2, NBP) where
    slot ``b`` holds ``relu(1 - |n - (b - NBP/2 + 0.5)|)`` — exactly the
    reference's ``|1 - dbin - rbin|`` pair split over the two adjacent bins
    (``descriptor.cu:110-132``), with out-of-range bins clipped for free.
    """
    centers = jnp.arange(NBP, dtype=jnp.float32) - (NBP / 2 - 0.5)
    return jnp.maximum(0.0, 1.0 - jnp.abs(n[..., None] - centers))


def _theta_tents(nt: jnp.ndarray) -> jnp.ndarray:
    """Circular tent weights for the NBO orientation bins
    (``descriptor.cu:112,122,134``: bins wrap mod NBO)."""
    centers = jnp.arange(NBO, dtype=jnp.float32)
    d = nt[..., None] - centers
    d = d - NBO * jnp.round(d / NBO)
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _descriptor_core(
    mag: jnp.ndarray,          # (K, P, P) gradient magnitudes
    ang: jnp.ndarray,          # (K, P, P) gradient angles
    x: jnp.ndarray,            # (K,) octave coords
    y: jnp.ndarray,
    xi: jnp.ndarray,           # (K,) int32 patch-centre integer coords
    yi: jnp.ndarray,
    s: jnp.ndarray,
    angle0: jnp.ndarray,       # (K,) first orientation angle
    valid: jnp.ndarray,        # (K,) keypoint-and-angle validity
    radius: int,
    config: SiftConfig,
) -> jnp.ndarray:
    k = x.shape[0]
    mag = mag.reshape(k, -1)                                   # (K, P2)
    ang = ang.reshape(k, -1)

    sbp = DESC_MAGNIF * s + MACHINE_EPS                        # :54
    w_r = jnp.floor(math.sqrt(2.0) * sbp * (NBP + 1) / 2.0 + 0.5)  # :55

    off_y, off_x = patch_offsets(radius)
    off_x = off_x.reshape(-1)                                  # (P2,)
    off_y = off_y.reshape(-1)

    # dx = xi + cx - x (:102-103)
    dx = off_x[None] + (xi.astype(jnp.float32) - x)[:, None]
    dy = off_y[None] + (yi.astype(jnp.float32) - y)[:, None]

    st = jnp.sin(angle0)[:, None]
    ct = jnp.cos(angle0)[:, None]
    nx = (ct * dx + st * dy) / sbp[:, None]                    # :104
    ny = (-st * dx + ct * dy) / sbp[:, None]                   # :105

    theta = mod_2pi(ang - angle0[:, None])                     # :100
    nt = NBO * theta / TWO_PI                                  # :107

    sign = 1.0 if config.compat.flipped_gaussian_sign else -1.0
    wsigma = NBP / 2.0                                         # :52
    win = jnp.exp(sign * (nx * nx + ny * ny) / (2.0 * wsigma * wsigma))  # :108

    inside = (
        (jnp.abs(off_x)[None] <= w_r[:, None])                 # :57-60 window
        & (jnp.abs(off_y)[None] <= w_r[:, None])
        & valid[:, None]
    )
    w = jnp.where(inside, win * mag, 0.0)                      # (K, P2)

    wx = _spatial_tents(nx)                                    # (K, P2, 4)
    wy = _spatial_tents(ny)                                    # (K, P2, 4)
    wt = _theta_tents(nt)                                      # (K, P2, 8)

    # hist[y, x, t] = sum_p w * wy * wx * wt   — batched GEMM onto the MXU:
    # (K, 16, P2) @ (K, P2, 8).  Layout matches the reference's
    # index = ybin*32 + xbin*8 + t (:67-69,134).
    wxy = (wy[:, :, :, None] * wx[:, :, None, :]).reshape(k, -1, NBP * NBP)
    lhs = (w[:, :, None] * wxy).transpose(0, 2, 1)             # (K, 16, P2)
    hist = jnp.einsum(
        "kyp,kpt->kyt", lhs, wt, preferred_element_type=jnp.float32
    )                                                          # (K, 16, 8)
    return hist.reshape(k, SIFT_VECTOR_SIZE)


def _descriptors_one_level(
    grad_level: jnp.ndarray,   # (H, W, 2)
    x: jnp.ndarray,            # (K,) octave coords
    y: jnp.ndarray,
    s: jnp.ndarray,
    angle0: jnp.ndarray,       # (K,) first orientation angle
    valid: jnp.ndarray,        # (K,) keypoint-and-angle validity
    radius: int,
    config: SiftConfig,
) -> jnp.ndarray:
    xi = jnp.floor(x + 0.5).astype(jnp.int32)
    yi = jnp.floor(y + 0.5).astype(jnp.int32)
    patches = gather_patches(grad_level, yi, xi, radius)       # (K, P, P, 2)
    return _descriptor_core(
        patches[..., 0], patches[..., 1], x, y, xi, yi, s, angle0, valid,
        radius, config,
    )


def normalize_descriptors(desc: jnp.ndarray) -> jnp.ndarray:
    """Standard SIFT normalisation: unit norm -> clamp 0.2 -> renormalise.

    (The reference's dead ``normalize_histogram`` :14-29 only does the first
    division; the full VLFeat sequence is the correct default.)
    """
    eps = MACHINE_EPS
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + eps)
    desc = jnp.minimum(desc, 0.2)
    return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + eps)


def compute_descriptors(
    keypoints: Keypoints,
    angles: jnp.ndarray,       # (L, K, 2) from compute_orientations
    angles_valid: jnp.ndarray,  # (L, K, 2)
    grad: jnp.ndarray,          # (L, H, W, 2)
    octave: int,
    config: SiftConfig,
    angle_index: int = 0,
):
    """Descriptors for one octave's keypoints: (L, K, 128) + validity (L, K).

    Mirrors ``compute_descriptors`` (``siftfunctions.cu:154-181``) except
    capacity clamping is deferred to the global top-k selection.
    ``angle_index`` selects which orientation peak to describe: the
    reference only ever uses peak 0 (``descriptor.cu:89``); VLFeat emits one
    feature per peak — enable ``SiftConfig.use_second_orientation`` to add
    peak-1 features (the driver calls this twice).
    """
    xper = float(2.0 ** octave)
    x = keypoints.x / xper
    y = keypoints.y / xper
    s = keypoints.sigma / xper

    num_levels = grad.shape[0]
    descs = []
    dvalids = []
    for lvl in range(num_levels):
        radius = static_radius_for_level(lvl, config)
        valid = keypoints.valid[lvl] & angles_valid[lvl, :, angle_index]
        d = _descriptors_one_level(
            grad[lvl],
            x[lvl],
            y[lvl],
            s[lvl],
            angles[lvl, :, angle_index],
            valid,
            radius,
            config,
        )
        descs.append(d)
        dvalids.append(valid)
    desc = jnp.stack(descs, axis=0)
    dvalid = jnp.stack(dvalids, axis=0)
    if not config.compat.unnormalized_descriptors:
        desc = jnp.where(
            dvalid[..., None], normalize_descriptors(desc), 0.0
        )
    return desc, dvalid


def compute_descriptors_merged(
    grad_stack: jnp.ndarray,  # (O, L, H, W, 2) zero-padded gradient stack
    x: jnp.ndarray,           # (M,) input-image coords
    y: jnp.ndarray,
    sigma: jnp.ndarray,       # (M,) input-image scale
    octave: jnp.ndarray,      # (M,) int32
    level: jnp.ndarray,       # (M,) int32
    angle0: jnp.ndarray,      # (M,) describing orientation angle
    valid: jnp.ndarray,       # (M,) keypoint-and-angle validity
    config: SiftConfig,
):
    """Descriptors for a merged cross-octave keypoint set: (M, 128) + (M,).

    Same math as ``compute_descriptors`` but batched over one flat set of
    M keypoints spanning all octaves/levels — a single stacked-gradient
    gather with the worst-case (deepest level) static patch radius; each
    keypoint's actual window is the usual ``w_r`` mask.  The merged
    pipeline runs this *after* global top-M selection, so the tent GEMMs
    cover M real keypoints instead of ``O * L * max_keypoints_per_level``
    capacity slots.
    """
    radius = static_radius_for_level(config.num_dog_levels - 1, config)
    xper = jnp.exp2(octave.astype(jnp.float32))
    xo = x / xper
    yo = y / xper
    so = sigma / xper
    xi = jnp.floor(xo + 0.5).astype(jnp.int32)
    yi = jnp.floor(yo + 0.5).astype(jnp.int32)
    patches = gather_patches_from_stack(grad_stack, octave, level, yi, xi, radius)
    desc = _descriptor_core(
        patches[..., 0], patches[..., 1], xo, yo, xi, yi, so, angle0, valid,
        radius, config,
    )
    if not config.compat.unnormalized_descriptors:
        desc = jnp.where(valid[..., None], normalize_descriptors(desc), 0.0)
    return desc, valid
