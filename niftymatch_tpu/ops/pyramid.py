"""Gaussian scale-space pyramid builder.

The reference ships only the *ingredients* of pyramid construction — the
client must itself loop octaves calling ``convolve`` + ``downsample_by_2``
with the kernels that ``PyramidData::generate_kernels`` precomputes
(``pyramidata.cu:94-123``; see SURVEY.md §1 "the library ships ingredients,
not the pipeline").  This module *is* that missing driver, built TPU-first:

* Per octave, the ``num_gauss_levels`` (6) Gaussian levels are materialised
  as one stacked ``(L, H_o, W_o)`` array so downstream DoG / gradient /
  extrema work batches over the level axis instead of looping kernels.
* Octaves have static, compile-time shapes (``H >> o, W >> o``); the octave
  loop is a small unrolled Python loop inside a single ``jit``.
* Level semantics match the reference client protocol exactly
  (SURVEY.md §3.1): ``octave[0] = blur(input, base_kernel)`` and
  ``octave[l+1] = blur(octave[l], kernels[l])``; the next octave's input is
  ``downsample_by_2(octave[num_dog_levels])`` — the level whose scale is
  exactly 2x the octave base (scale index ``num_dog_levels + level_min``).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from ..config import SiftConfig
from .filters import convolve_separable, downsample_by_2, gaussian_kernel_1d
from .gradients import dog_stack, gradient_polar


class OctaveData(NamedTuple):
    """All per-octave state (the TPU analogue of ``PyramidData``,
    ``pyramidata.h:60-125``, minus scratch buffers XLA owns)."""

    gauss: jnp.ndarray   # (num_gauss_levels, H, W) Gaussian levels
    dog: jnp.ndarray     # (num_dogs, H, W) difference-of-Gaussians
    grad: jnp.ndarray    # (num_dog_levels, H, W, 2) polar gradients


def gaussian_kernels(config: SiftConfig):
    """Precompute all 1-D blur kernels on host (``pyramidata.cu:94-103``).

    Returns ``(base_kernel, [level_kernels...])`` as numpy arrays.
    """
    base = gaussian_kernel_1d(config.base_smooth)
    levels = [gaussian_kernel_1d(s) for s in config.sigmas]
    return base, levels


def build_octave_gaussians(
    base_image: jnp.ndarray,
    level_kernels,
    num_levels: int,
    first_kernel=None,
) -> jnp.ndarray:
    """Stack of Gaussian levels for one octave.

    ``first_kernel`` (the base-smoothing kernel) is applied to produce level 0
    for octave 0 only; subsequent octaves seed level 0 directly from the
    decimated previous octave (matching the reference client protocol where
    ``downsample_by_2`` output *is* the next octave's level 0).
    """
    levels = []
    current = base_image
    if first_kernel is not None:
        current = convolve_separable(current, first_kernel)
    levels.append(current)
    for l in range(num_levels - 1):
        current = convolve_separable(current, level_kernels[l])
        levels.append(current)
    return jnp.stack(levels, axis=0)


def gradients_for_octave(gauss: jnp.ndarray, config: SiftConfig) -> jnp.ndarray:
    """Polar gradients for the keypoint levels of one octave.

    ``compute_gradients`` (``siftfunctions.cu:53-63``) computes, for level
    ``i`` in ``[level_min+1, level_max-2]`` (i.e. 0..num_dog_levels-1), the
    gradient of Gaussian level ``octave[i+1]`` stored at slot ``i``.
    """
    lvls = gauss[1 : 1 + config.num_dog_levels]
    return gradient_polar(lvls)


def build_pyramid(image: jnp.ndarray, config: SiftConfig) -> List[OctaveData]:
    """Full scale-space pyramid: list of per-octave OctaveData.

    ``image`` is a float32 grayscale ``(H, W)`` array.  Shapes are static per
    octave; callers jit the enclosing function once per image size.
    """
    if image.shape != (config.height, config.width):
        raise ValueError(
            f"image shape {image.shape} != config ({config.height}, {config.width})"
        )
    # Kernels stay host-side numpy: _conv_1d folds the taps into the
    # compiled program as scalar constants.
    base_kernel, level_kernels = gaussian_kernels(config)

    octaves: List[OctaveData] = []
    current = image.astype(jnp.float32)
    for o in range(config.num_octaves):
        gauss = build_octave_gaussians(
            current,
            level_kernels,
            config.num_gauss_levels,
            first_kernel=base_kernel if o == 0 else None,
        )
        octaves.append(
            OctaveData(
                gauss=gauss,
                dog=dog_stack(gauss),
                grad=gradients_for_octave(gauss, config),
            )
        )
        # Next octave seeds from the level at exactly twice the base scale:
        # index num_dog_levels (scale index num_dog_levels + level_min).
        current = downsample_by_2(gauss[config.num_dog_levels])
    return octaves


def stack_gradients(octaves: List[OctaveData]) -> jnp.ndarray:
    """Zero-padded (O, L, H0, W0, 2) gradient stack over all octaves.

    Octave ``o``'s (L, H0>>o, W0>>o, 2) gradients occupy the top-left
    corner of slice ``o``; the padding is zero, so gathers that spill into
    it read zero-magnitude gradients, which contribute nothing to any
    histogram (the same argument that makes ``gather_patches``' border
    padding free).  Feeds the merged-pipeline patch gathers.
    """
    n_oct = len(octaves)
    l, h, w, c = octaves[0].grad.shape
    out = jnp.zeros((n_oct, l, h, w, c), jnp.float32)
    for o, data in enumerate(octaves):
        lo, ho, wo, _ = data.grad.shape
        out = jax.lax.dynamic_update_slice(
            out, data.grad[None].astype(jnp.float32), (o, 0, 0, 0, 0)
        )
    return out
