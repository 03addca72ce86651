"""Pixel-format ops: grayscale conversion, channel shuffles, saturating cast.

Reference parity (``src/gpu/kernels/bgra_2_gray.cu``, ``cast.cu``):

* ``bgra_to_gray``     — ``grayscale`` kernel, weights 0.07/0.72/0.21 on
  B/G/R (``bgra_2_gray.cu:16``).
* ``extract_channel`` / ``put_channel`` / ``set_alpha`` —
  ``bgra_2_gray.cu:35-112`` (note ``put_channel`` forces alpha to 255 when
  asked to write channel 3, :81).
* ``cast_saturate``    — ``cast.cu:7-21``: optional saturation at ``max_val``
  (0 disables saturation).

All are trivially fused elementwise ops on TPU; they exist as named functions
for API parity and testability.
"""

from __future__ import annotations

import jax.numpy as jnp

# B, G, R weights from bgra_2_gray.cu:16
_GRAY_WEIGHTS = (0.07, 0.72, 0.21)


def bgra_to_gray(bgra: jnp.ndarray) -> jnp.ndarray:
    """BGRA uint8 (H, W, 4) -> float32 (H, W) grayscale.

    ``out = 0.07 * B + 0.72 * G + 0.21 * R`` (``bgra_2_gray.cu:16``).
    Values stay in the input's numeric range (no /255), as in the reference.
    """
    b = bgra[..., 0].astype(jnp.float32)
    g = bgra[..., 1].astype(jnp.float32)
    r = bgra[..., 2].astype(jnp.float32)
    return _GRAY_WEIGHTS[0] * b + _GRAY_WEIGHTS[1] * g + _GRAY_WEIGHTS[2] * r


def extract_channel(bgra: jnp.ndarray, channel: int) -> jnp.ndarray:
    """(H, W, 4) -> float32 (H, W) single channel (``bgra_2_gray.cu:35-48``)."""
    return bgra[..., channel].astype(jnp.float32)


def put_channel(bgra: jnp.ndarray, values: jnp.ndarray, channel: int) -> jnp.ndarray:
    """Write ``values`` into ``channel`` of a BGRA image, returning a new image.

    Mirrors ``put_channel`` (``bgra_2_gray.cu:66-82``): writing channel 3
    (alpha) sets it to the constant 255 regardless of ``values``.
    """
    if channel == 3:
        new = jnp.full(bgra.shape[:-1], 255, dtype=bgra.dtype)
    else:
        new = values.astype(bgra.dtype)
    return bgra.at[..., channel].set(new)


def set_alpha(bgra: jnp.ndarray, value: int) -> jnp.ndarray:
    """Set the alpha channel to a constant (``bgra_2_gray.cu:95-112``)."""
    return bgra.at[..., 3].set(jnp.asarray(value, bgra.dtype))


def cast_saturate(src: jnp.ndarray, dtype, max_val=0) -> jnp.ndarray:
    """Elementwise cast with optional saturation (``cast.cu:7-21``).

    ``max_val == 0`` disables saturation; otherwise values ``>= max_val`` are
    clamped to ``max_val`` before the cast.
    """
    if max_val != 0:
        src = jnp.where(src >= max_val, jnp.asarray(max_val, src.dtype), src)
    return src.astype(dtype)


def transpose_2d(image):
    """Tiled 2-D transpose — ``kernels/transpose.cu:8-30``.

    The reference needs an explicit shared-memory kernel (and uses it to put
    descriptors column-major for the matcher, ``siftfunctions.cu:25,34``);
    on TPU a transpose is a layout change XLA fuses for free, and the MXU
    matcher formulation removed the need entirely (SURVEY.md §7.3).  Kept as
    an explicit op for API parity."""
    import jax.numpy as jnp

    return jnp.swapaxes(image, -1, -2)


def subtract_images(a, b):
    """Elementwise ``a - b`` — ``cuda_subtract_images`` (cudamath.cu:26-35),
    the DoG primitive.  ``ops.gradients.dog_stack`` is the batched form."""
    return a - b
