"""Separable Gaussian filtering and decimation, TPU-first.

Reference parity:

* Gaussian 1-D kernel generation — ``pyramidata.cu:105-123``
  (``create_kernel_for_sigma``): radius ``ceil(4 * sigma)``, samples
  ``exp(-0.5 * ((j - r)/sigma)^2)`` normalised to unit sum.
* Separable row+column convolution with **zero padding** outside the image —
  ``convolution.cu:16-137`` (out-of-border loads are initialised to zero,
  :47-53, :108-114).  The reference applies ``kernel[radius - k]`` (true
  convolution); Gaussian kernels are symmetric so correlation == convolution.
* Decimation by 2 with no prefilter (every other pixel) —
  ``downsample.cu:14-16``.

Design notes (TPU): convolution is expressed with ``lax.conv_general_dilated``
over a batched level axis so XLA can tile the stencil onto the VPU and fuse
the row/column passes with neighbouring elementwise work.  There is no
host-side scratch ``_buffer`` (``pyramidata.h:109``): XLA owns temporaries.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float) -> np.ndarray:
    """Host-side 1-D Gaussian taps, matching ``pyramidata.cu:105-123``.

    Returns float32 array of length ``2 * ceil(4 sigma) + 1`` summing to 1.
    """
    radius = int(math.ceil(sigma * 4.0))
    xs = (np.arange(2 * radius + 1, dtype=np.float32) - radius) / np.float32(sigma)
    k = np.exp(-0.5 * xs * xs).astype(np.float32)
    return k / k.sum(dtype=np.float32)


def _conv_1d(x: jnp.ndarray, kernel, axis: int) -> jnp.ndarray:
    """Zero-padded 1-D correlation along ``axis`` of a (..., H, W) array.

    The kernel must be symmetric (Gaussian), so correlation equals the
    reference's convolution (``convolution.cu:69-70`` flips the kernel).

    Implemented as an unrolled shift-and-add over the padded array rather
    than ``lax.conv_general_dilated``: a Gaussian tap count is tiny (a few
    dozen), the taps are compile-time constants, and on TPU the shifted
    fused-multiply-adds ride the VPU at full fp32 precision — measured
    ~20x faster than the conv HLO on the same shapes (which lowers through
    a slow convolution path on the TPU runtime) and exactly fp32, so the
    pyramid never sees bf16 rounding noise (with ``peak_threshold = 0``
    the extrema test fires on such noise: 1968 "features" vs 189 on a
    clean fp32 pyramid).
    """
    taps = np.asarray(kernel, np.float32)
    radius = taps.shape[0] // 2
    axis = axis % x.ndim
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x.astype(jnp.float32), pad)
    # out[j] = sum_i taps[i] * x[j + i - radius] = sum_i taps[i] * xp[j + i]
    acc = float(taps[0]) * jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    for i in range(1, taps.shape[0]):
        acc = acc + float(taps[i]) * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
    return acc


def convolve_separable(image: jnp.ndarray, kernel) -> jnp.ndarray:
    """Separable 2-D Gaussian blur with zero-padded borders.

    Equivalent of the reference's ``convolve`` host launcher
    (``convolution.cu:140-159``): row pass then column pass.  Accepts
    ``(..., H, W)``; leading axes (e.g. a stacked level axis) are batched.
    """
    out = _conv_1d(image, kernel, axis=-1)   # rows pass (convolve_rows)
    out = _conv_1d(out, kernel, axis=-2)     # columns pass (convolve_cols)
    return out


def downsample_by_2(image: jnp.ndarray) -> jnp.ndarray:
    """Decimate by 2: keep every other pixel, no prefilter
    (``downsample.cu:14-16``: ``result[y, x] = source[2y, 2x]``).

    Works on ``(..., H, W)``; output spatial dims are ``floor(d / 2)``.
    """
    h, w = image.shape[-2], image.shape[-1]
    return image[..., 0 : (h // 2) * 2 : 2, 0 : (w // 2) * 2 : 2]
