"""Difference-of-Gaussians and polar gradients.

Reference parity (``src/gpu/kernels/cudamath.cu``):

* ``subtract_images``  — elementwise ``A - B`` (``cudamath.cu:26-35``); used
  for DoG as ``dog[i] = octave[i+1] - octave[i]`` (``siftfunctions.cu:42-51``
  calls ``subtract(s, f, ...)`` with s = level i+1, f = level i).
* ``gradient_polar``   — central differences, output
  ``(0.5 * |grad|, atan2(dy, dx) mod 2pi)`` (``cudamath.cu:38-54``); interior
  pixels only, borders stay zero (``pyramidata.cu:46`` zero-initialises).

TPU note: both are pure elementwise/stencil ops that XLA fuses into the
surrounding pyramid computation; the level axis is batched instead of looped
(the reference launches one kernel per level, ``siftfunctions.cu:45,59``).
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586


def dog_stack(gauss_levels: jnp.ndarray) -> jnp.ndarray:
    """All DoGs of an octave at once: ``(L, H, W) -> (L-1, H, W)``.

    ``dog[i] = g[i+1] - g[i]`` per ``siftfunctions.cu:42-51``.
    """
    return gauss_levels[1:] - gauss_levels[:-1]


def mod_2pi(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap into [0, 2pi), matching ``mod_2pi_f`` (``cudamath.h:82-87``)."""
    return jnp.mod(jnp.mod(x, TWO_PI) + TWO_PI, TWO_PI)


def gradient_polar(image: jnp.ndarray) -> jnp.ndarray:
    """Central-difference gradient in polar form.

    Input ``(..., H, W)`` -> output ``(..., H, W, 2)`` with channels
    ``(magnitude, angle)``:

    * ``magnitude = 0.5 * sqrt(dx^2 + dy^2)``        (``cudamath.cu:51``)
    * ``angle = mod_2pi(atan2(dy, dx) + 2pi)``       (``cudamath.cu:52``)
    * zero magnitude => angle 0                       (``cudamath.cu:52``)
    * border pixels (outermost ring) are (0, 0)       (``cudamath.cu:44``)
    """
    dx = jnp.zeros_like(image)
    dy = jnp.zeros_like(image)
    # interior central differences: dx = I[y, x+1] - I[y, x-1], etc.
    dx = dx.at[..., 1:-1, 1:-1].set(image[..., 1:-1, 2:] - image[..., 1:-1, :-2])
    dy = dy.at[..., 1:-1, 1:-1].set(image[..., 2:, 1:-1] - image[..., :-2, 1:-1])
    mag = 0.5 * jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.where(mag == 0.0, 0.0, mod_2pi(jnp.arctan2(dy, dx) + TWO_PI))
    return jnp.stack([mag, ang], axis=-1)
