"""Loop closure at scale: a 100-frame RENDERED closed-loop sequence.

Round-2 verdict: loop closure had only ever been demonstrated at 12
synthetic keyframes; this drives the full pipeline (render -> detect ->
chunked SLAM -> all-pairs sweep -> Sim(3) pose graph) at 100 rendered
keyframes, the scale where the old per-K recompiles, per-candidate
round-trips, and the O(K^2 N^2) sweep memory blowup actually bit."""

import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy e2e: run via ci/test-full.sh

from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.data import make_scene, render_frames
from niftymatch_tpu.sfm.se3 import camera_center
from niftymatch_tpu.slam import SlamConfig, SlamSystem
from niftymatch_tpu.utils.metrics import ate_rmse


def test_loop_closure_100_rendered_keyframes():
    K = 100
    scene = make_scene(
        num_cams=K,
        num_landmarks=600,
        seed=3,
        radius=6.0,
        width=640,
        height=480,
        arc=(0.0, 2 * np.pi * (K - 1) / K),
        helix=0.0,
    )
    frames = render_frames(scene, seed=3)
    slam = SlamSystem(
        SlamConfig(
            width=640,
            height=480,
            intrinsics=tuple(float(v) for v in scene.intrinsics),
            ransac=RansacConfig(iterations=256, inlier_threshold=4.0),
            detector_features=512,
            min_inliers=12,
            chunk_size=16,
            ba_every=4,
            ba_window=4,
            loop_min_gap=K // 4,
            loop_min_matches=30,
        )
    )
    infos = slam.process_frames(
        np.clip(frames, 0, 255).astype(np.uint8)
    )
    kept = [i for i, info in enumerate(infos) if info["keyframe"]]
    assert len(kept) >= int(0.9 * K), f"only {len(kept)} keyframes"
    # The feature store held every keyframe without per-K recompiles:
    # capacity is a power-of-two bucket >= count.
    slam._store.flush()
    assert slam._store.count == len(kept)
    assert slam._store.capacity >= len(kept)

    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))[kept]
    ate_before = ate_rmse(slam.trajectory(), gt, align=True, with_scale=True)
    n_edges = slam.close_loops()
    ate_after = ate_rmse(slam.trajectory(), gt, align=True, with_scale=True)
    assert n_edges > 0
    # Sim(3) closure must remove a substantial share of the loop drift.
    assert ate_after < 0.7 * ate_before, (ate_before, ate_after)
