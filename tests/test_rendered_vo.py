"""Detector-driven visual odometry smoke test on rendered frames.

Unlike test_slam_e2e (synthetic descriptors), this runs the REAL detector
on rendered images: render -> detect -> match -> E/H-RANSAC -> pose.
Rendered blob scenes carry systematic pseudo-features, so thresholds are
integration-grade (rotation within ~10 deg), not precision-grade."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run via ci/test-full.sh

from niftymatch_tpu import SiftConfig, make_detector
from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.data import make_scene, render_frames
from niftymatch_tpu.sfm.se3 import se3_compose, se3_inverse
from niftymatch_tpu.slam.frontend import estimate_two_view


@pytest.mark.slow
def test_rendered_two_view_rotation_recovery():
    w, h = 640, 480
    scene = make_scene(
        num_cams=8, num_landmarks=1200, seed=0, radius=6.0, width=w, height=h
    )
    frames = render_frames(scene, seed=0)
    det = make_detector(SiftConfig(width=w, height=h, max_features=2048))
    feats = [det(jnp.asarray(f)) for f in frames]

    import functools

    intr = tuple(float(v) for v in scene.intrinsics)
    tv_fn = jax.jit(
        functools.partial(
            estimate_two_view,
            intrinsics=intr,
            ransac_config=RansacConfig(iterations=1024, inlier_threshold=4.0),
        )
    )
    r_errs = []
    successes = 0
    for i in range(3):
        tv = tv_fn(feats[i], feats[i + 1])
        Z = np.asarray(
            se3_compose(
                jnp.asarray(scene.poses[i + 1]),
                se3_inverse(jnp.asarray(scene.poses[i])),
            )
        )
        if bool(tv.success) and int(tv.num_inliers) >= 20:
            successes += 1
            r_errs.append(np.abs(np.asarray(tv.R) - Z[:, :3]).max())
    assert successes >= 2, f"only {successes} pairs succeeded"
    # Median rotation error within ~10 degrees elementwise.
    assert np.median(r_errs) < 0.2, r_errs
