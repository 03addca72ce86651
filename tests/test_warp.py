"""Warp / undistort / mosaic-blend op tests.

Oracle: scipy.ndimage bilinear interpolation and closed-form checks against
the reference's conventions (``resample.cu``, ``undistort.cu``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from niftymatch_tpu.ops import (
    bilinear_sample,
    blend_into_mosaic,
    perspective_coords,
    remap,
    undistort_map,
    warp_mask,
    warp_perspective,
)


def test_bilinear_sample_exact_at_pixel_centers(rng):
    img = rng.uniform(0, 1, size=(16, 20)).astype(np.float32)
    ys, xs = np.mgrid[0:16, 0:20].astype(np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_bilinear_sample_midpoint_and_border(rng):
    img = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    # Midpoint of the four pixels
    v = float(bilinear_sample(jnp.asarray(img), jnp.asarray(0.5), jnp.asarray(0.5)))
    assert abs(v - 1.5) < 1e-6
    # Outside -> blends toward zero (border addressing, cudatex2D.cu:15-19)
    v = float(bilinear_sample(jnp.asarray(img), jnp.asarray(-0.5), jnp.asarray(0.0)))
    assert abs(v - 0.0 * 0.5 - 0.0 * 0.5) < 1e-6 or v == pytest.approx(0.0, abs=1e-6)
    v = float(bilinear_sample(jnp.asarray(img), jnp.asarray(-2.0), jnp.asarray(0.0)))
    assert v == 0.0


def test_bilinear_sample_matches_scipy(rng):
    from scipy.ndimage import map_coordinates

    img = rng.uniform(0, 255, size=(32, 40)).astype(np.float32)
    xs = rng.uniform(1, 38, size=(100,)).astype(np.float32)
    ys = rng.uniform(1, 30, size=(100,)).astype(np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
    ref = map_coordinates(img, [ys, xs], order=1, mode="constant")
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_bilinear_sample_multichannel(rng):
    img = rng.uniform(0, 1, size=(8, 8, 4)).astype(np.float32)
    out = np.asarray(
        bilinear_sample(jnp.asarray(img), jnp.asarray([1.5]), jnp.asarray([2.5]))
    )
    assert out.shape == (1, 4)
    ref = 0.25 * (img[2, 1] + img[2, 2] + img[3, 1] + img[3, 2])
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_undistort_map_zero_distortion_is_identity():
    cam = jnp.asarray([100.0, 110.0, 32.0, 24.0])  # fx, fy, cx, cy
    dist = jnp.asarray([0.0, 0.0, 0.0])
    u, v = undistort_map(cam, dist, 48, 64)
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    np.testing.assert_allclose(np.asarray(u), xx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), yy, atol=1e-4)


def test_undistort_map_radial_polynomial():
    # Check a single off-center pixel against hand-computed polynomial
    # (undistort.cu:36-46 math).
    fx, fy, cx, cy = 100.0, 100.0, 32.0, 24.0
    k1, k2, k3 = 0.1, 0.01, 0.001
    u, v = undistort_map(
        jnp.asarray([fx, fy, cx, cy]), jnp.asarray([k1, k2, k3]), 48, 64
    )
    x_pix, y_pix = 50, 10
    un = (x_pix - cx) / fx
    vn = (y_pix - cy) / fy
    r2 = un * un + vn * vn
    kr = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    assert float(u[y_pix, x_pix]) == pytest.approx(un * kr * fx + cx, abs=1e-3)
    assert float(v[y_pix, x_pix]) == pytest.approx(vn * kr * fy + cy, abs=1e-3)


def test_warp_perspective_identity_and_translation(rng):
    img = rng.uniform(0, 1, size=(24, 32)).astype(np.float32)
    Hi = jnp.eye(3)
    out = np.asarray(warp_perspective(jnp.asarray(img), Hi))
    np.testing.assert_allclose(out, img, atol=1e-5)
    # Pure translation by (3, 2): out(x, y) = img(x+3, y+2) when H maps
    # output coords -> source coords directly (inverse=False).
    Ht = jnp.asarray([[1.0, 0, 3.0], [0, 1.0, 2.0], [0, 0, 1.0]])
    out = np.asarray(warp_perspective(jnp.asarray(img), Ht))
    np.testing.assert_allclose(out[:-2, :-3], img[2:, 3:], atol=1e-5)


def test_warp_perspective_inverse_roundtrip(rng):
    img = rng.uniform(0, 1, size=(32, 32)).astype(np.float32)
    H = jnp.asarray([[1.0, 0.0, 5.0], [0.0, 1.0, -3.0], [0.0, 0.0, 1.0]])
    # inverse=True interprets H as source->output and inverts it on device.
    out_inv = np.asarray(warp_perspective(jnp.asarray(img), H, inverse=True))
    Hinv = jnp.asarray(np.linalg.inv(np.asarray(H)).astype(np.float32))
    out_ref = np.asarray(warp_perspective(jnp.asarray(img), Hinv))
    np.testing.assert_allclose(out_inv, out_ref, atol=1e-4)


def test_warp_mask_binarises(rng):
    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0
    ys, xs = np.mgrid[0:16, 0:16].astype(np.float32)
    out = np.asarray(
        warp_mask(jnp.asarray(mask), jnp.asarray(xs - 0.25), jnp.asarray(ys))
    )
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_blend_into_mosaic_first_write_then_average():
    canvas = jnp.zeros((8, 8), jnp.float32)
    weights = jnp.zeros((8, 8), jnp.float32)
    frame = jnp.full((8, 8), 2.0, jnp.float32)
    fw = jnp.ones((8, 8), jnp.float32)
    H = jnp.eye(3)
    c1, w1 = blend_into_mosaic(canvas, weights, frame, fw, H)
    # First write: canvas takes frame values where weights were 0
    # (resample.cu:46-53).
    np.testing.assert_allclose(np.asarray(c1), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), 1.0, atol=1e-6)
    # Second frame with value 4 and weight 1 -> running average 3
    # (resample.cu:55-66).
    frame2 = jnp.full((8, 8), 4.0, jnp.float32)
    c2, w2 = blend_into_mosaic(c1, w1, frame2, fw, H)
    np.testing.assert_allclose(np.asarray(c2), 3.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w2), 2.0, atol=1e-6)


def test_blend_into_mosaic_respects_mask():
    canvas = jnp.zeros((8, 8), jnp.float32)
    weights = jnp.zeros((8, 8), jnp.float32)
    frame = jnp.full((8, 8), 5.0, jnp.float32)
    fw = jnp.ones((8, 8), jnp.float32)
    mask = np.zeros((8, 8), np.float32)
    mask[:, :4] = 1.0
    c, w = blend_into_mosaic(
        canvas, weights, frame, fw, jnp.eye(3), frame_mask=jnp.asarray(mask)
    )
    c = np.asarray(c)
    assert np.all(c[:, :3] == 5.0)
    assert np.all(c[:, 5:] == 0.0)


def test_perspective_coords_division():
    H = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0.001, 0, 1.0]])
    mx, my = perspective_coords(H, 4, 4)
    # x' = x / (0.001 x + 1)
    assert float(mx[0, 2]) == pytest.approx(2.0 / 1.002, abs=1e-5)
    assert float(my[3, 0]) == pytest.approx(3.0, abs=1e-5)


def test_remap_is_bilinear_sample(rng):
    img = rng.uniform(0, 1, size=(10, 12)).astype(np.float32)
    mx = rng.uniform(0, 11, size=(5, 6)).astype(np.float32)
    my = rng.uniform(0, 9, size=(5, 6)).astype(np.float32)
    a = np.asarray(remap(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    b = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    np.testing.assert_array_equal(a, b)
