"""Tests for Gaussian kernels, separable convolution, and decimation.

Oracles: scipy-free numpy implementations of the reference semantics
(zero-padded convolution, ``convolution.cu:47-53``; kernel generation,
``pyramidata.cu:105-123``; decimation, ``downsample.cu:14-16``).
"""

import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.ops.filters import (
    convolve_separable,
    downsample_by_2,
    gaussian_kernel_1d,
)


def np_gaussian_kernel(sigma):
    radius = int(np.ceil(sigma * 4.0))
    xs = (np.arange(2 * radius + 1) - radius) / sigma
    k = np.exp(-0.5 * xs * xs)
    return (k / k.sum()).astype(np.float32)


def np_convolve_zero_pad(img, kernel):
    r = len(kernel) // 2
    h, w = img.shape
    padded = np.zeros((h + 2 * r, w + 2 * r), np.float64)
    padded[r : r + h, r : r + w] = img
    # rows then cols, correlation with symmetric kernel
    tmp = np.zeros_like(padded)
    for i, kv in enumerate(kernel):
        tmp[:, r : r + w] += kv * padded[:, i : i + w]
    out = np.zeros((h, w), np.float64)
    for i, kv in enumerate(kernel):
        out += kv * tmp[i : i + h, r : r + w]
    return out.astype(np.float32)


def test_gaussian_kernel_matches_reference_rule():
    for sigma in [0.5, 1.0, 1.6, 2.539, 4.03]:
        k = gaussian_kernel_1d(sigma)
        expected = np_gaussian_kernel(sigma)
        assert k.shape == expected.shape
        # radius = ceil(4 sigma)  (pyramidata.cu:108)
        assert len(k) == 2 * int(np.ceil(4 * sigma)) + 1
        np.testing.assert_allclose(k, expected, rtol=1e-5)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)


def test_convolve_separable_matches_numpy_oracle(test_image):
    for sigma in [0.8, 1.6, 3.0]:
        k = gaussian_kernel_1d(sigma)
        got = np.asarray(convolve_separable(jnp.asarray(test_image), jnp.asarray(k)))
        want = np_convolve_zero_pad(test_image, k)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_convolve_zero_border_behavior():
    # A constant image blurred with zero padding must decay at the borders.
    img = jnp.ones((32, 32), jnp.float32) * 10.0
    k = gaussian_kernel_1d(2.0)
    out = np.asarray(convolve_separable(img, jnp.asarray(k)))
    assert out[16, 16] > out[0, 0]
    np.testing.assert_allclose(out[16, 16], 10.0, rtol=1e-4)


def test_convolve_batched_levels(test_image):
    k = gaussian_kernel_1d(1.2)
    stack = jnp.stack([jnp.asarray(test_image)] * 3)
    out = np.asarray(convolve_separable(stack, jnp.asarray(k)))
    single = np.asarray(convolve_separable(jnp.asarray(test_image), jnp.asarray(k)))
    for i in range(3):
        np.testing.assert_allclose(out[i], single, rtol=1e-6)


def test_downsample_by_2_takes_every_other_pixel(test_image):
    out = np.asarray(downsample_by_2(jnp.asarray(test_image)))
    assert out.shape == (48, 64)
    np.testing.assert_array_equal(out, test_image[::2, ::2])
    # odd sizes floor
    odd = jnp.asarray(test_image[:95, :127])
    out2 = np.asarray(downsample_by_2(odd))
    assert out2.shape == (47, 63)
    np.testing.assert_array_equal(out2, test_image[:94:2, :126:2])
