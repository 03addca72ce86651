"""Warping / undistortion / mosaic-blend ops.

TPU-native equivalents of the reference's resampling toolkit:

* ``kernels/undistort.cu:6-47``  -> :func:`undistort_map` — OpenCV-convention
  radial (k1,k2,k3) correction-map generation from fx,fy,cx,cy.
* ``kernels/resample.cu:83-112`` -> :func:`bilinear_sample` /
  :func:`remap` — bilinear texture gather.  The reference binds a CUDA
  texture with *border* addressing (zero outside) and samples at
  ``(x + 0.5, y + 0.5)`` (``cudatex2D.cu:15-19``); here that is an explicit
  gather with zero padding and the same pixel-center convention, so results
  match the CUDA texture unit bit-for-bit away from the 1-ulp filter
  quantisation (CUDA textures use 9-bit filter fractions).
* ``kernels/resample.cu:115-208`` -> :func:`warp_perspective` — per-pixel
  homography application (optionally of the inverse, computed on device as
  in the reference's thread-0 adjugate inverse :119-143).
* ``kernels/resample.cu:68-81``  -> :func:`warp_mask`.
* ``kernels/resample.cu:7-66``   -> :func:`blend_into_mosaic` — weighted
  running-average mosaic accumulation (float canvas instead of the
  reference's uchar4; quantisation is the caller's concern on TPU).

Everything is pure jnp (gathers are XLA-native and memory-bound; no MXU win
from Pallas here), static-shape, and jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.linalg import inv3x3


def undistort_map(
    camera_matrix: jnp.ndarray,
    distortion: jnp.ndarray,
    height: int,
    width: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Radial distortion-correction maps (u, v), each (H, W) float32.

    Mirrors ``undistort.cu:6-47``: normalise pixel coords by (fx, fy, cx,
    cy), scale by the radial polynomial ``1 + k1 r^2 + k2 r^4 + k3 r^6``,
    re-project.  ``camera_matrix`` is packed (fx, fy, cx, cy) as the
    reference's 4-float layout; ``distortion`` is (k1, k2, k3).  No bounds
    clamping, as warned in ``undistort.h:15-20``."""
    fx, fy, cx, cy = (camera_matrix[i] for i in range(4))
    k1, k2, k3 = (distortion[i] for i in range(3))
    y = jnp.arange(height, dtype=jnp.float32)[:, None]
    x = jnp.arange(width, dtype=jnp.float32)[None, :]
    u = (x - cx) / fx
    v = (y - cy) / fy
    v = jnp.broadcast_to(v, (height, width))
    u = jnp.broadcast_to(u, (height, width))
    r2 = u * u + v * v
    kr = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    return u * kr * fx + cx, v * kr * fy + cy


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear gather at continuous pixel coords with border-zero semantics.

    Matches the reference's texture reads: unnormalised coords, bilinear
    filter, zero border (``cudatex2D.cu:15-19``).  The reference passes
    ``x + 0.5`` because CUDA texel centers sit at half-integers; this
    function takes *pixel-center* coords directly (x=0 is the center of
    pixel 0), i.e. ``bilinear_sample(img, x, y) == tex2D(img, x+0.5, y+0.5)``.

    ``img`` may be (H, W) or (H, W, C); x/y broadcast to the output shape.
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        val = img[yc, xc]
        if img.ndim == 3:
            inside = inside[..., None]
        return jnp.where(inside, val, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def remap(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray) -> jnp.ndarray:
    """Resample ``img`` at per-pixel coords — ``resample_2D``
    (``resample.cu:83-112``) / ``resample_undistort`` (:235-248)."""
    return bilinear_sample(img, map_x, map_y)


def perspective_coords(
    H: jnp.ndarray, height: int, width: int, inverse: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-pixel source coords under a 3x3 transform
    (``apply_perspective[_inverse]``, ``resample.cu:115-191``).

    ``inverse=True`` inverts H on device first (adjugate inverse, like the
    reference's thread-0 inversion) — use when H maps source -> output."""
    Hm = inv3x3(H) if inverse else H
    y = jnp.arange(height, dtype=jnp.float32)[:, None]
    x = jnp.arange(width, dtype=jnp.float32)[None, :]
    xp = Hm[0, 0] * x + Hm[0, 1] * y + Hm[0, 2]
    yp = Hm[1, 0] * x + Hm[1, 1] * y + Hm[1, 2]
    wp = Hm[2, 0] * x + Hm[2, 1] * y + Hm[2, 2]
    wp = jnp.where(jnp.abs(wp) > 1e-12, wp, 1e-12)
    return xp / wp, yp / wp


def warp_perspective(
    img: jnp.ndarray,
    H: jnp.ndarray,
    out_shape: tuple[int, int] | None = None,
    inverse: bool = False,
) -> jnp.ndarray:
    """Warp an image by a homography — ``resample_perspective_transform``
    (``resample.cu:193-208``).  ``out_shape`` = (height, width) of the
    result (defaults to the input's)."""
    oh, ow = out_shape if out_shape is not None else img.shape[:2]
    mx, my = perspective_coords(H, oh, ow, inverse=inverse)
    return bilinear_sample(img, mx, my)


def warp_mask(
    mask: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
    lower_limit: float = 0.5,
) -> jnp.ndarray:
    """Warp a {0,1} float mask and re-binarise — ``resample_mask_2D``
    (``resample.cu:68-81``): values <= lower_limit go to 0."""
    res = bilinear_sample(mask, map_x, map_y)
    return jnp.where(res > lower_limit, 1.0, 0.0)


def blend_into_mosaic(
    canvas: jnp.ndarray,
    canvas_weights: jnp.ndarray,
    frame: jnp.ndarray,
    frame_weights: jnp.ndarray,
    H: jnp.ndarray,
    frame_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp ``frame`` into ``canvas`` with per-pixel weighted running
    average — ``transform_and_blend`` (``resample.cu:7-66``).

    * canvas: (Hc, Wc[, C]) float; canvas_weights: (Hc, Wc) accumulated w.
    * frame: (Hf, Wf[, C]); frame_weights: (Hf, Wf) per-pixel blend weight.
    * H maps canvas pixel -> frame coords (the reference passes the
      already-inverted matrix; pass ``H`` pre-inverted likewise).
    * frame_mask: optional (Hf, Wf) {0,1}; pixels sampling mask <= 0.5 are
      skipped (``resample.cu:41-42``).

    Returns (new_canvas, new_weights).  Functional (no in-place update);
    under jit with donated buffers XLA updates in place."""
    hc, wc = canvas.shape[0], canvas.shape[1]
    mx, my = perspective_coords(H, hc, wc, inverse=False)
    hf, wf = frame.shape[0], frame.shape[1]
    in_bounds = (mx > -1.0) & (mx < wf) & (my > -1.0) & (my < hf)

    sampled = bilinear_sample(frame, mx, my)
    new_w = bilinear_sample(frame_weights, mx, my)
    if frame_mask is not None:
        m = bilinear_sample(frame_mask, mx, my)
        in_bounds = in_bounds & (m > 0.5)
    valid = in_bounds & (new_w > 0.0)

    w_old = canvas_weights
    w_new = jnp.where(valid, new_w, 0.0)
    total = w_old + w_new
    safe_total = jnp.maximum(total, 1e-12)
    if canvas.ndim == 3:
        blend = (
            canvas * w_old[..., None] + sampled * w_new[..., None]
        ) / safe_total[..., None]
        keep = (total > 0.0)[..., None]
    else:
        blend = (canvas * w_old + sampled * w_new) / safe_total
        keep = total > 0.0
    return jnp.where(keep, blend, canvas), total
