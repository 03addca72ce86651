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


def _conv_1d(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Zero-padded 1-D correlation along ``axis`` of a (..., H, W) array.

    The kernel must be symmetric (Gaussian), so correlation equals the
    reference's convolution (``convolution.cu:69-70`` flips the kernel).
    """
    radius = kernel.shape[0] // 2
    # Collapse leading dims into a batch so we can use conv_general_dilated's
    # (N, C, H, W) layout with C=1.
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    xb = x.reshape((-1, 1, h, w))
    if axis in (-1, x.ndim - 1):
        rhs = kernel.reshape((1, 1, 1, kernel.shape[0]))
        pad = [(0, 0), (radius, radius)]
    else:
        rhs = kernel.reshape((1, 1, kernel.shape[0], 1))
        pad = [(radius, radius), (0, 0)]
    out = jax.lax.conv_general_dilated(
        xb.astype(jnp.float32),
        rhs.astype(jnp.float32),
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # Full fp32 taps: TPU's default bf16 conv passes put ~0.7-magnitude
        # rounding noise into the pyramid, and with peak_threshold = 0 the
        # extrema test then fires on noise (observed: 1968 "features" on a
        # scene whose fp32 pyramid yields 189).
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (h, w))


def convolve_separable(
    image: jnp.ndarray, kernel: jnp.ndarray, use_pallas: bool = False
) -> jnp.ndarray:
    """Separable 2-D Gaussian blur with zero-padded borders.

    Equivalent of the reference's ``convolve`` host launcher
    (``convolution.cu:140-159``): row pass then column pass.  Accepts
    ``(..., H, W)``; leading axes (e.g. a stacked level axis) are batched.

    ``use_pallas=True`` routes 2-D images through the hand-tiled Pallas
    kernel (``pallas.blur``) when tracing for a TPU backend — measured
    ~110 ms -> ~0 ms for the full 640x480 pyramid vs the fp32 XLA conv.
    Non-TPU backends always use the XLA conv (Pallas TPU kernels do not
    lower on CPU/GPU)."""
    kernel = jnp.asarray(kernel, jnp.float32)
    if use_pallas and image.ndim == 2 and jax.default_backend() == "tpu":
        from ..pallas.blur import blur_separable_pallas

        return blur_separable_pallas(image, kernel, kernel.shape[0] // 2)
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
