"""Pallas separable Gaussian blur (row + column passes).

The reference's most-executed kernel pair: tiled shared-memory row/column
convolutions (``convolution.cu:16-137``).  The TPU formulation keeps whole
rows (row pass) / whole columns (column pass) resident in VMEM so no halo
exchange is needed between grid steps — each pass is a static unrolled sum
of shifted VPU fmas over a zero-padded block, mirroring the reference's
zero-border loads (``convolution.cu:47-53``).

The jnp oracle is ``ops.filters.convolve_separable`` (XLA
``conv_general_dilated``); this kernel exists as the hand-tiled fast path
and compiles for any static kernel radius.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_blur_kernel(x_ref, k_ref, o_ref, *, radius: int):
    x = x_ref[:]                                   # (TM, W)
    w = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (radius, radius)))
    acc = jnp.zeros_like(x)
    for t in range(2 * radius + 1):
        acc = acc + k_ref[0, t] * xp[:, t : t + w]
    o_ref[:] = acc


def _col_blur_kernel(x_ref, k_ref, o_ref, *, radius: int):
    x = x_ref[:]                                   # (H, TN)
    h = x.shape[0]
    xp = jnp.pad(x, ((radius, radius), (0, 0)))
    acc = jnp.zeros_like(x)
    for t in range(2 * radius + 1):
        acc = acc + k_ref[0, t] * xp[t : t + h, :]
    o_ref[:] = acc


def _round_up(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("radius", "tm", "tn", "interpret"))
def blur_separable_pallas(
    image: jnp.ndarray,
    taps: jnp.ndarray,
    radius: int,
    tm: int = 256,
    tn: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Zero-padded separable blur of (H, W) with static ``radius``.

    ``taps`` must have shape (2*radius+1,).  Matches
    ``ops.filters.convolve_separable`` exactly (symmetric kernels)."""
    h, w = image.shape
    k2d = taps.astype(jnp.float32).reshape(1, -1)
    # Tile sizes must divide the padded dims exactly (a short grid would
    # leave unwritten garbage that the second pass folds back in), and must
    # respect VMEM: Mosaic keeps each of the 2R+1 shifted slices live, so a
    # block costs ~(span + 2R) * 4 * (2R + 2) bytes per row/column.
    budget = 8 * 1024 * 1024
    taps_n = 2 * radius + 2
    w8 = _round_up(w, 128)
    tm_cap = max(8, (budget // (4 * (w8 + 2 * radius) * taps_n)) // 8 * 8)
    tm_ = min(tm, _round_up(h, 8), tm_cap)
    hp = _round_up(h, tm_)
    h_cost = 4 * (hp + 2 * radius) * taps_n
    tn_cap = max(128, (budget // h_cost) // 128 * 128)
    tn_ = min(tn, _round_up(w, 128), tn_cap)
    wp = _round_up(w, tn_)
    x = jnp.pad(image.astype(jnp.float32), ((0, hp - h), (0, wp - w)))
    rows = pl.pallas_call(
        partial(_row_blur_kernel, radius=radius),
        grid=(hp // tm_,),
        in_specs=[
            pl.BlockSpec((tm_, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2d.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm_, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(x, k2d)
    # Zero-pad semantics: rows beyond h are zero in x, so the row pass
    # keeps them zero — exactly the zero border the column pass needs.
    cols = pl.pallas_call(
        partial(_col_blur_kernel, radius=radius),
        grid=(wp // tn_,),
        in_specs=[
            pl.BlockSpec((hp, tn_), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2d.shape[1]), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp, tn_), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(rows, k2d)
    return cols[:h, :w]
