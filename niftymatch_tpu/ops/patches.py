"""Fixed-size patch gathering around keypoints.

The reference's per-keypoint kernels walk variable-radius windows with one
CUDA block per keypoint (``orientation.cu:27-29``, ``descriptor.cu:55``).
The TPU-native equivalent (SURVEY.md §7 hard part 3) gathers *fixed-size*
patches via batched ``dynamic_slice`` from a zero-padded array; per-keypoint
radii become masks inside the patch.  Zero padding is semantically free:
out-of-image gradient entries have zero magnitude and thus contribute zero
weight to every histogram (gradients are zero-initialised and only interior
pixels are written, ``pyramidata.cu:46``, ``cudamath.cu:44``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_patches(img: jnp.ndarray, yc: jnp.ndarray, xc: jnp.ndarray, radius: int):
    """Gather (2*radius+1)^2 patches centred at integer coords (yc, xc).

    ``img``: (H, W) or (H, W, C).  ``yc``/``xc``: (K,) int32, clamped into
    the image.  Returns (K, P, P[, C]) with P = 2*radius + 1; out-of-image
    samples are zero.
    """
    h, w = img.shape[0], img.shape[1]
    yc = jnp.clip(yc, 0, h - 1)
    xc = jnp.clip(xc, 0, w - 1)
    pad = ((radius, radius), (radius, radius)) + ((0, 0),) * (img.ndim - 2)
    padded = jnp.pad(img, pad)
    p = 2 * radius + 1
    sizes = (p, p) + img.shape[2:]
    zeros = (0,) * (img.ndim - 2)

    def one(y, x):
        return jax.lax.dynamic_slice(padded, (y, x) + zeros, sizes)

    return jax.vmap(one)(yc, xc)


def gather_patches_from_stack(
    stack: jnp.ndarray,
    octave: jnp.ndarray,
    level: jnp.ndarray,
    yc: jnp.ndarray,
    xc: jnp.ndarray,
    radius: int,
):
    """Gather patches from a zero-padded per-octave gradient stack.

    ``stack``: (O, L, H, W[, C]) — octave ``o``'s data occupies the
    top-left ``(H >> o, W >> o)`` corner of its slice (see
    ``pyramid.stack_gradients``); the rest is zero, so out-of-octave
    samples contribute nothing downstream (same argument as
    ``gather_patches``).  ``octave``/``level``/``yc``/``xc``: (K,) int32
    per-keypoint indices, coords in *octave* pixels.  Returns
    (K, P, P[, C]) with P = 2*radius + 1.

    This is the merged-pipeline gather: one call for every keypoint of
    every octave/level, replacing O*L per-level gathers over
    mostly-padding capacity slots.
    """
    h, w = stack.shape[2], stack.shape[3]
    yc = jnp.clip(yc, 0, h - 1)
    xc = jnp.clip(xc, 0, w - 1)
    pad = ((0, 0), (0, 0), (radius, radius), (radius, radius)) + ((0, 0),) * (
        stack.ndim - 4
    )
    padded = jnp.pad(stack, pad)
    p = 2 * radius + 1
    sizes = (1, 1, p, p) + stack.shape[4:]
    zeros = (0,) * (stack.ndim - 4)

    def one(o, l, y, x):
        return jax.lax.dynamic_slice(padded, (o, l, y, x) + zeros, sizes)[0, 0]

    return jax.vmap(one)(octave, level, yc, xc)


def patch_offsets(radius: int):
    """(P, P) integer offset grids (dy, dx) in [-radius, radius]."""
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy = jnp.broadcast_to(r[:, None], (2 * radius + 1, 2 * radius + 1))
    dx = jnp.broadcast_to(r[None, :], (2 * radius + 1, 2 * radius + 1))
    return dy, dx
