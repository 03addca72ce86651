"""Pallas separable blur vs the jnp/XLA oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from niftymatch_tpu.ops.filters import convolve_separable, gaussian_kernel_1d
from niftymatch_tpu.pallas.blur import blur_separable_pallas


@pytest.mark.parametrize("shape,sigma", [((64, 128), 1.6), ((100, 200), 2.5), ((48, 64), 0.8)])
def test_blur_matches_oracle(rng, shape, sigma):
    img = rng.uniform(0, 255, size=shape).astype(np.float32)
    taps = gaussian_kernel_1d(sigma)
    radius = taps.shape[0] // 2
    ref = np.asarray(convolve_separable(jnp.asarray(img), jnp.asarray(taps)))
    out = np.asarray(
        blur_separable_pallas(
            jnp.asarray(img), jnp.asarray(taps), radius, tm=32, tn=128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-5)


def test_blur_zero_border_semantics(rng):
    # An impulse at the corner must blur with zero (not reflected) borders.
    img = np.zeros((32, 128), np.float32)
    img[0, 0] = 1.0
    taps = gaussian_kernel_1d(2.0)
    radius = taps.shape[0] // 2
    ref = np.asarray(convolve_separable(jnp.asarray(img), jnp.asarray(taps)))
    out = np.asarray(
        blur_separable_pallas(jnp.asarray(img), jnp.asarray(taps), radius,
                              tm=16, tn=128, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # Mass is lost at the border (zero padding), as in convolution.cu.
    assert out.sum() < 1.0
