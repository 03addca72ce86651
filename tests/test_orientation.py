"""Orientation assignment vs. the naive oracle (production-kernel semantics)."""

import jax
import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.config import CompatFlags, SiftConfig
from niftymatch_tpu.ops.keypoints import detect_keypoints
from niftymatch_tpu.ops.orientation import compute_orientations, pick_peaks, smooth_histogram
from niftymatch_tpu.ops.pyramid import build_pyramid

from oracles import orientation_naive


def test_smooth_histogram_is_synchronous_circular_box():
    rng = np.random.default_rng(3)
    h = rng.random((5, 36)).astype(np.float32)
    got = np.asarray(smooth_histogram(jnp.asarray(h), iterations=6))
    want = h.astype(np.float64)
    for _ in range(6):
        want = (np.roll(want, 1, axis=-1) + want + np.roll(want, -1, axis=-1)) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pick_peaks_parabolic_interpolation():
    h = np.zeros((1, 36), np.float32)
    h[0, 10] = 1.0
    h[0, 9] = 0.5
    h[0, 11] = 0.7
    angles, valid = pick_peaks(jnp.asarray(h))
    a = np.asarray(angles)[0]
    v = np.asarray(valid)[0]
    assert v[0] and not v[1]
    di = -0.5 * (0.7 - 0.5) / (0.7 + 0.5 - 2.0)
    want = 2 * np.pi * (10 + di + 0.5) / 36
    np.testing.assert_allclose(a[0], want, rtol=1e-5)
    assert a[1] == -1.0


def test_pick_peaks_two_angles_in_bin_order():
    h = np.zeros((1, 36), np.float32)
    h[0, 5] = 1.0
    h[0, 20] = 0.9  # above 0.8 * max
    angles, valid = pick_peaks(jnp.asarray(h))
    a, v = np.asarray(angles)[0], np.asarray(valid)[0]
    assert v[0] and v[1]
    assert a[0] < a[1]  # bin order


def test_orientations_match_oracle(test_image):
    for flipped in (False, True):
        c = SiftConfig(
            width=128, height=96, max_keypoints_per_level=64,
            compat=CompatFlags(flipped_gaussian_sign=flipped),
        )

        @jax.jit
        def run(img):
            octs = build_pyramid(img, c)
            kpts = detect_keypoints(octs[0].dog, 0, c)
            angles, avalid = compute_orientations(kpts, octs[0].grad, 0, c)
            return octs[0].grad, kpts, angles, avalid

        grad0, kpts, angles, avalid = run(jnp.asarray(test_image))
        grad = np.asarray(grad0)
        v = np.asarray(kpts.valid)
        xs, ys, ss = np.asarray(kpts.x), np.asarray(kpts.y), np.asarray(kpts.sigma)
        a = np.asarray(angles)
        av = np.asarray(avalid)
        checked = 0
        for l in range(v.shape[0]):
            for k in range(v.shape[1]):
                if not v[l, k]:
                    assert not av[l, k].any()
                    continue
                _, want = orientation_naive(
                    grad[l].astype(np.float64), xs[l, k], ys[l, k], ss[l, k],
                    flipped_sign=flipped, max_radius=c.max_orientation_radius,
                )
                got = [x for x, ok in zip(a[l, k], av[l, k]) if ok]
                assert len(got) == len(want), (l, k, got, want)
                np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
                checked += 1
        assert checked > 5


def test_rotated_gradient_gives_rotated_orientation(test_image):
    """Synthetic check: a pure-gradient patch yields the gradient's angle."""
    c = SiftConfig(width=64, height=64, max_keypoints_per_level=4)
    run = jax.jit(lambda kpts, grad: compute_orientations(kpts, grad, 0, c))
    # gradient field pointing at a known angle everywhere
    for target in [0.3, 1.7, 4.0]:
        grad = np.zeros((c.num_dog_levels, 64, 64, 2), np.float32)
        grad[..., 0] = 1.0
        grad[..., 1] = target
        from niftymatch_tpu.ops.keypoints import Keypoints

        kpts = Keypoints(
            x=jnp.full((3, 4), 32.0),
            y=jnp.full((3, 4), 32.0),
            sigma=jnp.full((3, 4), 2.0),
            level=jnp.zeros((3, 4), jnp.int32),
            response=jnp.ones((3, 4)),
            valid=jnp.ones((3, 4), bool),
        )
        angles, avalid = run(kpts, jnp.asarray(grad))
        got = float(np.asarray(angles)[0, 0, 0])
        assert bool(np.asarray(avalid)[0, 0, 0])
        # histogram bin resolution is 10 degrees; interpolated peak lands
        # within half a bin of the true angle
        d = abs(got - target)
        d = min(d, 2 * np.pi - d)
        assert d < np.pi / 36 + 1e-3, (target, got)
