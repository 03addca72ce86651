"""Matmul-precision control.

On TPU, JAX's default matmul precision computes f32 matmuls with bf16
inputs (1 MXU pass) — the right trade for the descriptor-match GEMM, but
catastrophic for small-matrix geometry: Jacobi eigensolvers, essential
decomposition and SE(3) chains need full fp32 products (bf16's 8-bit
mantissa turns near-degenerate 3x3/9x9 spectra into noise; observed as
non-orthonormal rotations out of ``decompose_essential`` on TPU only).

``f32`` wraps a function so every matmul/einsum it traces uses
``Precision.HIGHEST`` (full fp32 on TPU).  Apply it to geometry entry
points; leave the big GEMMs (match, convolution) on the default path.
"""

from __future__ import annotations

import functools

import jax


def f32(fn):
    """Decorator: run ``fn`` under full-fp32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
