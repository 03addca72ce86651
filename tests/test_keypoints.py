"""Extrema detection + sub-pixel refinement vs. the naive oracle."""

import jax
import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.config import SiftConfig
from niftymatch_tpu.ops.keypoints import detect_keypoints, extrema_mask
from niftymatch_tpu.ops.pyramid import build_pyramid

from oracles import detect_keypoints_naive, is_extremum

_DOG_CACHE = {}
_JIT_CACHE = {}


def _detect_jit(c, octave, masked=False):
    key = (c, octave, masked)
    if key not in _JIT_CACHE:
        if masked:
            _JIT_CACHE[key] = jax.jit(
                lambda dog, m: detect_keypoints(dog, octave, c, mask_image=m)
            )
        else:
            _JIT_CACHE[key] = jax.jit(
                lambda dog: detect_keypoints(dog, octave, c)
            )
    return _JIT_CACHE[key]


_extrema_mask = jax.jit(extrema_mask)


def _dog_for(test_image, w=128, h=96):
    # Jitted + memoized: the pyramid build is identical across the tests in
    # this file, and eager per-op dispatch on CPU is compile-bound.
    key = (test_image.tobytes(), w, h)
    if key not in _DOG_CACHE:
        c = SiftConfig(width=w, height=h, max_keypoints_per_level=128)
        octs = jax.jit(lambda im: build_pyramid(im, c))(jnp.asarray(test_image))
        _DOG_CACHE[key] = (c, jax.block_until_ready(octs))
    return _DOG_CACHE[key]


def test_extrema_mask_matches_oracle(test_image):
    c, octs = _dog_for(test_image)
    dog = np.asarray(octs[0].dog)
    mask = np.asarray(_extrema_mask(octs[0].dog, c.peak_threshold))
    L, H, W = dog.shape
    # sample a grid of interior pixels plus every flagged pixel
    flagged = np.argwhere(mask)
    assert flagged.shape[0] > 0, "no extrema detected on test image"
    for (l, y, x) in flagged[:200]:
        assert is_extremum(dog, l + 1, y, x, c.peak_threshold)
    rng = np.random.default_rng(1)
    for _ in range(300):
        l = rng.integers(0, L - 2)
        y = rng.integers(1, H - 1)
        x = rng.integers(1, W - 1)
        assert bool(mask[l, y, x]) == is_extremum(dog, l + 1, y, x, c.peak_threshold)


def test_border_pixels_never_flagged(test_image):
    c, octs = _dog_for(test_image)
    mask = np.asarray(_extrema_mask(octs[0].dog, c.peak_threshold))
    assert not mask[:, 0, :].any() and not mask[:, -1, :].any()
    assert not mask[:, :, 0].any() and not mask[:, :, -1].any()


def test_refined_keypoints_match_oracle(test_image):
    c, octs = _dog_for(test_image)
    for octave in range(2):
        dog = np.asarray(octs[octave].dog).astype(np.float64)
        xper = 2.0 ** octave
        want = detect_keypoints_naive(
            dog, c.peak_threshold, c.edge_threshold, xper, c.sigma_0, c.num_dog_levels
        )
        got = _detect_jit(c, octave)(octs[octave].dog)
        gx = np.asarray(got.x)[np.asarray(got.valid)]
        gy = np.asarray(got.y)[np.asarray(got.valid)]
        gs = np.asarray(got.sigma)[np.asarray(got.valid)]
        assert len(gx) == len(want), f"octave {octave}: {len(gx)} vs {len(want)}"
        wx = np.array(sorted((w[0], w[1], w[2]) for w in want))
        gg = np.array(sorted(zip(gx, gy, gs)))
        np.testing.assert_allclose(gg, wx, rtol=2e-3, atol=2e-3)


def test_keypoint_levels_and_validity(test_image):
    c, octs = _dog_for(test_image)
    got = _detect_jit(c, 0)(octs[0].dog)
    assert got.x.shape == (c.num_dog_levels, c.max_keypoints_per_level)
    v = np.asarray(got.valid)
    resp = np.asarray(got.response)
    # responses sorted descending within each level (top_k order)
    for l in range(c.num_dog_levels):
        r = resp[l][v[l]]
        assert np.all(np.diff(r) <= 1e-6)
    # invalid slots have zero response
    assert np.all(resp[~v] == 0.0)


def test_mask_image_restricts_detection(test_image):
    c, octs = _dog_for(test_image)
    h, w = test_image.shape
    mask_img = np.zeros((h, w), np.float32)
    mask_img[:, : w // 2] = 1.0
    got = _detect_jit(c, 0, masked=True)(octs[0].dog, jnp.asarray(mask_img))
    v = np.asarray(got.valid)
    xs = np.asarray(got.x)[v]
    # all detections in the unmasked (left) half; the mask is sampled at the
    # integer pixel, so allow the +-1 sub-pixel shift
    assert np.all(xs < w // 2 + 1)
