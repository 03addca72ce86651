"""Tests for the pyramid builder, DoG and polar gradients."""

import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.config import SiftConfig
from niftymatch_tpu.ops.gradients import gradient_polar, mod_2pi
from niftymatch_tpu.ops.pyramid import build_pyramid


def test_mod_2pi():
    xs = jnp.asarray([-0.1, 0.0, 3.14, 6.4, 12.7, -7.0])
    out = np.asarray(mod_2pi(xs))
    assert np.all(out >= 0.0) and np.all(out < 2 * np.pi + 1e-6)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[0], 2 * np.pi - 0.1, rtol=1e-5)


def test_gradient_polar_matches_reference_formula():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(16, 20)).astype(np.float32)
    g = np.asarray(gradient_polar(jnp.asarray(img)))
    # interior pixel check (cudamath.cu:46-53)
    for (y, x) in [(1, 1), (7, 11), (14, 18)]:
        dx = img[y, x + 1] - img[y, x - 1]
        dy = img[y + 1, x] - img[y - 1, x]
        mag = 0.5 * np.sqrt(dx * dx + dy * dy)
        ang = np.mod(np.arctan2(dy, dx) + 2 * np.pi, 2 * np.pi)
        np.testing.assert_allclose(g[y, x, 0], mag, rtol=1e-5)
        if mag > 0:
            np.testing.assert_allclose(g[y, x, 1], ang, rtol=1e-4)
    # borders zero (cudamath.cu:44)
    assert np.all(g[0, :, :] == 0) and np.all(g[:, 0, :] == 0)
    assert np.all(g[-1, :, :] == 0) and np.all(g[:, -1, :] == 0)


def test_build_pyramid_shapes(test_image):
    c = SiftConfig(width=128, height=96)
    octs = build_pyramid(jnp.asarray(test_image), c)
    assert len(octs) == c.num_octaves
    for o, od in enumerate(octs):
        h, w = c.octave_shape(o)
        assert od.gauss.shape == (c.num_gauss_levels, h, w)
        assert od.dog.shape == (c.num_dogs, h, w)
        assert od.grad.shape == (c.num_dog_levels, h, w, 2)


def test_dog_is_level_difference(test_image):
    c = SiftConfig(width=128, height=96)
    octs = build_pyramid(jnp.asarray(test_image), c)
    g = np.asarray(octs[0].gauss)
    d = np.asarray(octs[0].dog)
    for i in range(c.num_dogs):
        np.testing.assert_allclose(d[i], g[i + 1] - g[i], atol=1e-6)


def test_gradients_use_level_plus_one(test_image):
    # compute_gradients: slot i holds gradient of gaussian level i+1
    # (siftfunctions.cu:53-63)
    c = SiftConfig(width=128, height=96)
    octs = build_pyramid(jnp.asarray(test_image), c)
    g0 = np.asarray(gradient_polar(octs[0].gauss[1]))
    np.testing.assert_allclose(np.asarray(octs[0].grad[0]), g0, atol=1e-6)


def test_octave_seeding_is_downsample_of_level_3(test_image):
    # next octave level 0 = decimated gauss[num_dog_levels] (scale-doubling
    # level), per the reference client protocol (SURVEY.md §3.1)
    c = SiftConfig(width=128, height=96)
    octs = build_pyramid(jnp.asarray(test_image), c)
    src = np.asarray(octs[0].gauss[c.num_dog_levels])
    nxt = np.asarray(octs[1].gauss[0])
    np.testing.assert_allclose(nxt, src[::2, ::2], atol=1e-6)


def test_blur_monotone_smoothing(test_image):
    # higher levels are smoother: total variation decreases
    c = SiftConfig(width=128, height=96)
    octs = build_pyramid(jnp.asarray(test_image), c)
    g = np.asarray(octs[0].gauss)
    tv = [np.abs(np.diff(g[i], axis=1)).mean() for i in range(g.shape[0])]
    assert all(tv[i] > tv[i + 1] for i in range(len(tv) - 1))
