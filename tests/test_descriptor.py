"""Descriptor extraction vs. the naive oracle, plus matcher tests."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from niftymatch_tpu.config import CompatFlags, SiftConfig
from niftymatch_tpu.ops.descriptor import (
    compute_descriptors,
    descriptor_radius_for_sigma,
    normalize_descriptors,
    static_radius_for_level,
)
from niftymatch_tpu.ops.keypoints import detect_keypoints
from niftymatch_tpu.ops.match import match_descriptors, pairwise_sq_distances
from niftymatch_tpu.ops.orientation import compute_orientations
from niftymatch_tpu.ops.pyramid import build_pyramid

from oracles import descriptor_naive, match_naive


def test_static_radius_bounds_runtime_radius():
    c = SiftConfig(width=640, height=480)
    for lvl in range(c.num_dog_levels):
        r_static = static_radius_for_level(lvl, c)
        s_max = c.sigma_0 * 2.0 ** ((lvl + 1.0) / c.num_dog_levels)
        for frac in np.linspace(-0.99, 0.999, 7):
            s = c.sigma_0 * 2.0 ** ((lvl + frac) / c.num_dog_levels)
            assert descriptor_radius_for_sigma(s) <= r_static
        assert descriptor_radius_for_sigma(s_max) == r_static


@pytest.mark.slow
def test_descriptors_match_oracle(test_image):
    for flipped in (False, True):
        compat = CompatFlags(
            flipped_gaussian_sign=flipped, unnormalized_descriptors=True
        )
        c = SiftConfig(
            width=128, height=96, max_keypoints_per_level=32, compat=compat
        )

        @jax.jit
        def run(img):
            octs = build_pyramid(img, c)
            kpts = detect_keypoints(octs[0].dog, 0, c)
            angles, avalid = compute_orientations(kpts, octs[0].grad, 0, c)
            desc, dvalid = compute_descriptors(
                kpts, angles, avalid, octs[0].grad, 0, c
            )
            return octs[0].grad, kpts, angles, desc, dvalid

        grad0, kpts, angles, desc, dvalid = run(jnp.asarray(test_image))

        grad = np.asarray(grad0).astype(np.float64)
        xs, ys, ss = np.asarray(kpts.x), np.asarray(kpts.y), np.asarray(kpts.sigma)
        a = np.asarray(angles)
        dv = np.asarray(dvalid)
        d = np.asarray(desc)
        checked = 0
        for l in range(dv.shape[0]):
            for k in range(dv.shape[1]):
                if not dv[l, k]:
                    continue
                want = descriptor_naive(
                    grad[l], xs[l, k], ys[l, k], ss[l, k], a[l, k, 0],
                    flipped_sign=flipped,
                )
                np.testing.assert_allclose(
                    d[l, k], want, rtol=5e-3, atol=5e-3 * max(1.0, want.max())
                )
                checked += 1
                if checked >= 8:
                    break
            if checked >= 8:
                break
        assert checked >= 4


def test_normalization_sequence():
    rng = np.random.default_rng(5)
    d = rng.random((4, 128)).astype(np.float32) * 10
    out = np.asarray(normalize_descriptors(jnp.asarray(d)))
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert out.max() <= 0.2 / (1 - 1e-3) + 1e-3


def test_invalid_keypoints_get_zero_descriptors(test_image):
    c = SiftConfig(width=128, height=96, max_keypoints_per_level=32)

    @jax.jit
    def run(img):
        octs = build_pyramid(img, c)
        kpts = detect_keypoints(octs[0].dog, 0, c)
        angles, avalid = compute_orientations(kpts, octs[0].grad, 0, c)
        return compute_descriptors(kpts, angles, avalid, octs[0].grad, 0, c)

    desc, dvalid = run(jnp.asarray(test_image))
    d = np.asarray(desc)
    dv = np.asarray(dvalid)
    assert np.all(d[~dv] == 0.0)


def test_pairwise_distances_and_matching():
    rng = np.random.default_rng(7)
    a = rng.random((40, 128)).astype(np.float32)
    b = rng.random((30, 128)).astype(np.float32)
    d = np.asarray(pairwise_sq_distances(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-4)

    m = match_descriptors(jnp.asarray(a), jnp.asarray(b), ambiguity=0.8)
    naive = match_naive(a, b, 0.8)
    np.testing.assert_array_equal(np.asarray(m.indices), naive)


def test_matching_with_planted_correspondences():
    rng = np.random.default_rng(11)
    b = rng.random((50, 128)).astype(np.float32)
    perm = rng.permutation(50)
    a = b[perm] + rng.normal(0, 1e-3, (50, 128)).astype(np.float32)
    m = match_descriptors(jnp.asarray(a), jnp.asarray(b), ambiguity=0.8)
    np.testing.assert_array_equal(np.asarray(m.indices), perm)


def test_matching_validity_masks():
    rng = np.random.default_rng(13)
    a = rng.random((8, 128)).astype(np.float32)
    b = rng.random((8, 128)).astype(np.float32)
    a_valid = jnp.asarray([True] * 4 + [False] * 4)
    b_valid = jnp.asarray([True, False] * 4)
    m = match_descriptors(
        jnp.asarray(a), jnp.asarray(b), ambiguity=0.99,
        a_valid=a_valid, b_valid=b_valid,
    )
    idx = np.asarray(m.indices)
    assert np.all(idx[4:] == -1)                 # invalid A rows unmatched
    assert np.all(idx[idx >= 0] % 2 == 0)        # only valid B columns
