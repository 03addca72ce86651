"""Tests for the config derivation rules (vs. ``siftparams.h:30-51``) and
pixel-format ops (vs. ``bgra_2_gray.cu``, ``cast.cu``)."""

import math

import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.config import SiftConfig
from niftymatch_tpu.ops.image import (
    bgra_to_gray,
    cast_saturate,
    extract_channel,
    put_channel,
    set_alpha,
)


def test_sift_params_derivation_640x480():
    c = SiftConfig(width=640, height=480)
    # num_octaves = floor(log2(min(w,h) * 2 / 32)) = floor(log2(30)) = 4
    assert c.num_octaves == int(math.floor(math.log2(480 * 2 / 32)))
    assert c.num_octaves == 4
    assert c.level_max == 4 and c.level_min == -1
    assert c.num_gauss_levels == 6 and c.num_dogs == 5
    assert abs(c.sigma_k - 2 ** (1 / 3)) < 1e-12
    assert abs(c.sigma_0 - 1.6 * c.sigma_k) < 1e-12
    sa = c.sigma_0 / c.sigma_k  # = 1.6
    assert abs(c.base_smooth - math.sqrt(sa * sa - 0.25)) < 1e-9
    # sigmas: sigma_d0 * k^i for i in 0..level_max
    assert len(c.sigmas) == 5
    for i, s in enumerate(c.sigmas):
        assert abs(s - c.sigma_d0 * c.sigma_k**i) < 1e-9


def test_sift_params_tiny_image_floor():
    c = SiftConfig(width=20, height=20)
    assert c.num_octaves == 1  # clamped (siftparams.h:37)


def test_octave_shapes():
    c = SiftConfig(width=640, height=480)
    assert c.octave_shape(0) == (480, 640)
    assert c.octave_shape(2) == (120, 160)


def test_bgra_to_gray_weights():
    bgra = np.zeros((2, 2, 4), np.uint8)
    bgra[0, 0] = [100, 0, 0, 255]   # B
    bgra[0, 1] = [0, 100, 0, 255]   # G
    bgra[1, 0] = [0, 0, 100, 255]   # R
    g = np.asarray(bgra_to_gray(jnp.asarray(bgra)))
    np.testing.assert_allclose(g[0, 0], 7.0, rtol=1e-5)
    np.testing.assert_allclose(g[0, 1], 72.0, rtol=1e-5)
    np.testing.assert_allclose(g[1, 0], 21.0, rtol=1e-5)
    np.testing.assert_allclose(g[1, 1], 0.0, atol=1e-6)


def test_channel_ops():
    bgra = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    j = jnp.asarray(bgra)
    np.testing.assert_array_equal(np.asarray(extract_channel(j, 1)), bgra[..., 1])
    out = put_channel(j, jnp.full((2, 2), 9.0), 0)
    assert np.asarray(out)[0, 0, 0] == 9
    # channel 3 write forces alpha 255 (bgra_2_gray.cu:81)
    out = put_channel(j, jnp.full((2, 2), 9.0), 3)
    assert np.all(np.asarray(out)[..., 3] == 255)
    out = set_alpha(j, 7)
    assert np.all(np.asarray(out)[..., 3] == 7)


def test_cast_saturate():
    x = jnp.asarray([10.0, 200.0, 300.0])
    out = np.asarray(cast_saturate(x, jnp.uint8, max_val=255))
    np.testing.assert_array_equal(out, [10, 200, 255])
    # max_val=0 disables saturation (cast.cu:19)
    out = np.asarray(cast_saturate(jnp.asarray([10.0, 42.0]), jnp.int32, max_val=0))
    np.testing.assert_array_equal(out, [10, 42])
