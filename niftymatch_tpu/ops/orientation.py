"""Keypoint orientation assignment via 36-bin gradient histograms.

Reference parity (``src/gpu/kernels/orientation.cu``, production kernel
``kernel_orientations_optim`` :11-129):

* window: ``sigma_w = 1.5 * s``; ``W = max(floor(3 sigma_w), 1)`` clamped to
  ``blockDim/2 - 1 = 10`` (:27-29 with the 22x22 launch at :224).
* accumulation: pixels with ``r^2 < W^2 + 0.6`` contribute
  ``mag * exp(r^2 / (2 sigma_w^2))`` to bin ``floor(36 * ang / 2pi) % 36``
  (:51-59).  NOTE the reference's flipped exponent sign (:56); the correct
  ``exp(-...)`` is the default here, gated by ``compat.flipped_gaussian_sign``.
* smoothing: 6 iterations of a *synchronous* circular [1,1,1]/3 box filter
  (:64-86 — all reads use the pre-iteration histogram).
* peak picking: strict local maxima above ``0.8 * max`` with parabolic
  interpolation ``di = -0.5 (hp - hm)/(hp + hm - 2 h0)``, angle
  ``2pi (i + di + 0.5)/36``; first two peaks in bin order (:91-128).

TPU design: one fixed 21x21 gradient patch per keypoint (radius = the
reference's hard clamp of 10), histogram built as a masked one-hot
contraction (scatter-free), smoothing via ``jnp.roll`` — everything batched
over (levels, keypoints) with no host syncs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import NUM_ORI_BINS, SiftConfig
from .gradients import TWO_PI
from .keypoints import Keypoints
from .patches import gather_patches, gather_patches_from_stack, patch_offsets


def smooth_histogram(hist: jnp.ndarray, iterations: int = 6) -> jnp.ndarray:
    """Synchronous circular box smoothing (``orientation.cu:64-86``)."""
    for _ in range(iterations):
        hist = (jnp.roll(hist, 1, axis=-1) + hist + jnp.roll(hist, -1, axis=-1)) / 3.0
    return hist


def _histograms_core(
    mag: jnp.ndarray,        # (K, P, P) gradient magnitudes around keypoints
    ang: jnp.ndarray,        # (K, P, P) gradient angles
    x: jnp.ndarray,          # (K,) octave-coords keypoint x
    y: jnp.ndarray,
    xi: jnp.ndarray,         # (K,) int32 patch-centre integer coords
    yi: jnp.ndarray,
    s: jnp.ndarray,          # (K,) octave-coords scale
    valid: jnp.ndarray,      # (K,) bool
    radius: int,
    config: SiftConfig,
) -> jnp.ndarray:
    """Raw 36-bin histograms from gathered gradient patches
    (``kernel_orientations_optim`` accumulation, ``orientation.cu:35-60``)."""
    sigma_w = 1.5 * s                                           # gauss_factor
    w_r = jnp.maximum(jnp.floor(3.0 * sigma_w), 1.0)            # :27-28
    w_r = jnp.minimum(w_r, float(radius))                       # :29 clamp
    w_r = w_r[:, None, None]

    off_y, off_x = patch_offsets(radius)                        # (P, P)
    # dx = (cx + xi) - x  (:52-53): integer sample position minus refined pos
    dx = off_x[None] + (xi[:, None, None].astype(jnp.float32) - x[:, None, None])
    dy = off_y[None] + (yi[:, None, None].astype(jnp.float32) - y[:, None, None])
    r2 = dx * dx + dy * dy

    inside = (
        (jnp.abs(off_x)[None] <= w_r)
        & (jnp.abs(off_y)[None] <= w_r)
        & (r2 < w_r * w_r + 0.6)                                # :55
        & valid[:, None, None]
    )
    sign = 1.0 if config.compat.flipped_gaussian_sign else -1.0
    wgt = jnp.exp(sign * r2 / (2.0 * sigma_w * sigma_w)[:, None, None])
    weight = jnp.where(inside, mag * wgt, 0.0)                  # (K, P, P)

    bins = jnp.mod(
        jnp.floor(NUM_ORI_BINS * ang / TWO_PI).astype(jnp.int32), NUM_ORI_BINS
    )
    # Scatter-free histogram: masked one-hot contraction over patch pixels.
    k = x.shape[0]
    weight_flat = weight.reshape(k, -1)
    bins_flat = bins.reshape(k, -1)
    one_hot = jax.nn.one_hot(bins_flat, NUM_ORI_BINS, dtype=jnp.float32)
    return jnp.einsum("kp,kpb->kb", weight_flat, one_hot)


def _histograms_one_level(
    grad_level: jnp.ndarray,  # (H, W, 2) polar gradients of this level
    x: jnp.ndarray,           # (K,) octave-coords keypoint x
    y: jnp.ndarray,
    s: jnp.ndarray,           # (K,) octave-coords scale
    valid: jnp.ndarray,       # (K,) bool
    config: SiftConfig,
) -> jnp.ndarray:
    radius = config.max_orientation_radius
    xi = jnp.floor(x + 0.5).astype(jnp.int32)   # (int)(x + 0.5), x >= 0
    yi = jnp.floor(y + 0.5).astype(jnp.int32)
    patches = gather_patches(grad_level, yi, xi, radius)       # (K, P, P, 2)
    return _histograms_core(
        patches[..., 0], patches[..., 1], x, y, xi, yi, s, valid, radius, config
    )


def pick_peaks(hist: jnp.ndarray):
    """First two interpolated peaks in bin order (``orientation.cu:91-128``).

    ``hist``: (..., NBINS) smoothed histograms.  Returns ``angles`` (..., 2)
    with -1 sentinels (matching the (-1,-1) initialisation at
    ``pyramidata.cu:90``) and ``valid`` (..., 2) bools.
    """
    maxh = jnp.max(hist, axis=-1, keepdims=True)
    threshold = 0.8 * maxh                                      # :96
    hm = jnp.roll(hist, 1, axis=-1)
    hp = jnp.roll(hist, -1, axis=-1)
    is_peak = (hist > threshold) & (hist > hm) & (hist > hp)    # :107

    denom = hp + hm - 2.0 * hist
    di = -0.5 * (hp - hm) / jnp.where(denom == 0.0, 1.0, denom)  # :108
    idx = jnp.arange(hist.shape[-1], dtype=jnp.float32)
    theta = TWO_PI * (idx + di + 0.5) / hist.shape[-1]           # :109

    rank = jnp.cumsum(is_peak.astype(jnp.int32), axis=-1)
    first = is_peak & (rank == 1)
    second = is_peak & (rank == 2)
    a1 = jnp.sum(jnp.where(first, theta, 0.0), axis=-1)
    a2 = jnp.sum(jnp.where(second, theta, 0.0), axis=-1)
    has1 = jnp.any(first, axis=-1)
    has2 = jnp.any(second, axis=-1)
    angles = jnp.stack(
        [jnp.where(has1, a1, -1.0), jnp.where(has2, a2, -1.0)], axis=-1
    )
    return angles, jnp.stack([has1, has2], axis=-1)


def compute_orientations(
    keypoints: Keypoints,
    grad: jnp.ndarray,   # (num_dog_levels, H, W, 2)
    octave: int,
    config: SiftConfig,
):
    """Orientation angles for one octave's keypoints.

    Mirrors ``compute_orientations`` (``siftfunctions.cu:136-152``): keypoint
    coords are divided by ``xper = 2**octave`` back into octave coordinates
    (:19-21 of the kernel), and each level's keypoints read that level's
    gradient slice.

    Returns ``angles`` (L, K, 2) and ``valid`` (L, K, 2).
    """
    xper = float(2.0 ** octave)
    x = keypoints.x / xper
    y = keypoints.y / xper
    s = keypoints.sigma / xper

    hists = jax.vmap(
        lambda g, xx, yy, ss, vv: _histograms_one_level(g, xx, yy, ss, vv, config)
    )(grad, x, y, s, keypoints.valid)
    hists = smooth_histogram(hists)
    angles, avalid = pick_peaks(hists)
    avalid = avalid & keypoints.valid[..., None]
    angles = jnp.where(avalid, angles, -1.0)
    return angles, avalid


def compute_orientations_merged(
    grad_stack: jnp.ndarray,  # (O, L, H, W, 2) zero-padded gradient stack
    x: jnp.ndarray,           # (M,) input-image coords
    y: jnp.ndarray,
    sigma: jnp.ndarray,       # (M,) input-image scale
    octave: jnp.ndarray,      # (M,) int32
    level: jnp.ndarray,       # (M,) int32
    valid: jnp.ndarray,       # (M,) bool
    config: SiftConfig,
):
    """Orientations for a merged cross-octave keypoint set.

    Same math as ``compute_orientations`` but batched over one flat set
    of M keypoints spanning all octaves/levels: a single stacked-gradient
    gather replaces O separate per-octave passes over capacity padding
    (the merged pipeline selects the global top-M keypoints *before* this
    stage, so M is ``max_features``, not ``O * L * max_keypoints_per_level``).

    Returns ``angles`` (M, 2) and ``valid`` (M, 2).
    """
    radius = config.max_orientation_radius
    xper = jnp.exp2(octave.astype(jnp.float32))
    xo = x / xper
    yo = y / xper
    so = sigma / xper
    xi = jnp.floor(xo + 0.5).astype(jnp.int32)
    yi = jnp.floor(yo + 0.5).astype(jnp.int32)
    patches = gather_patches_from_stack(grad_stack, octave, level, yi, xi, radius)
    hists = _histograms_core(
        patches[..., 0], patches[..., 1], xo, yo, xi, yi, so, valid, radius, config
    )
    hists = smooth_histogram(hists)
    angles, avalid = pick_peaks(hists)
    avalid = avalid & valid[..., None]
    angles = jnp.where(avalid, angles, -1.0)
    return angles, avalid
