"""End-to-end SLAM system tests on synthetic feature sequences.

Uses landmark-consistent synthetic descriptors (data.synthetic.
make_feature_sequence) so the full pipeline — matching, E/H-RANSAC,
cheirality pose recovery, monocular scale propagation, track management,
windowed BA — runs exactly as with detected features while remaining
renderer-independent (the detector has its own oracle tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run via ci/test-full.sh

from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.data import make_scene
from niftymatch_tpu.data.synthetic import make_feature_sequence
from niftymatch_tpu.sfm.se3 import camera_center
from niftymatch_tpu.slam import SlamConfig, SlamSystem
from niftymatch_tpu.utils import ate_rmse


def _run_slam(num_cams=8, landmarks=400, seed=0, **cfg_kwargs):
    scene = make_scene(
        num_cams=num_cams,
        num_landmarks=landmarks,
        seed=seed,
        radius=6.0,
        width=640,
        height=480,
    )
    feats = make_feature_sequence(scene, capacity=384, noise_px=0.5, seed=seed)
    cfg = SlamConfig(
        width=640,
        height=480,
        intrinsics=tuple(float(v) for v in scene.intrinsics),
        ransac=RansacConfig(iterations=512, inlier_threshold=4.0),
        detector_features=384,
        **cfg_kwargs,
    )
    slam = SlamSystem(cfg)
    infos = [slam.process_features(f) for f in feats]
    return scene, slam, infos


def test_slam_tracks_full_trajectory():
    scene, slam, infos = _run_slam(ba_every=3, ba_window=4)
    assert len(slam.keyframes) == scene.poses.shape[0]
    assert all(info["keyframe"] for info in infos)
    # Every pair matched strongly.
    assert min(i["num_inliers"] for i in infos[1:]) > 100

    traj = slam.trajectory()
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    ate = ate_rmse(traj, gt)
    # Monocular: similarity-aligned ATE under 2% of trajectory extent.
    assert ate < 0.02 * scale, f"ATE {ate} vs scale {scale}"


def test_slam_scale_propagation_consistent():
    # Without BA, dead-reckoned monocular scale should stay consistent:
    # the ratio |est step| / |gt step| should not drift over the sequence.
    scene, slam, _ = _run_slam(ba_every=10_000)
    traj = slam.trajectory()
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    est_steps = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    gt_steps = np.linalg.norm(np.diff(gt, axis=0), axis=1)
    ratios = est_steps / np.maximum(gt_steps, 1e-12)
    ratios = ratios / ratios[0]
    assert np.abs(ratios - 1.0).max() < 0.1, ratios


def test_slam_windowed_ba_improves_or_holds():
    scene, slam_ba, _ = _run_slam(seed=3, ba_every=2, ba_window=4)
    scene2, slam_vo, _ = _run_slam(seed=3, ba_every=10_000)
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    ate_ba = ate_rmse(slam_ba.trajectory(), gt)
    ate_vo = ate_rmse(slam_vo.trajectory(), gt)
    assert ate_ba <= ate_vo * 1.5  # BA never catastrophically hurts
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    assert ate_ba < 0.02 * scale


def test_slam_checkpoint_roundtrip(tmp_path):
    from niftymatch_tpu.utils.checkpoint import load_slam_state, save_slam_state

    scene, slam, _ = _run_slam(num_cams=5, ba_every=10_000)
    path = str(tmp_path / "slam_ckpt")
    save_slam_state(path, slam)

    cfg = SlamConfig(
        width=640,
        height=480,
        intrinsics=tuple(float(v) for v in scene.intrinsics),
        detector_features=384,
    )
    slam2 = SlamSystem(cfg)
    load_slam_state(path, slam2)
    assert len(slam2.keyframes) == len(slam.keyframes)
    np.testing.assert_allclose(slam2.trajectory(), slam.trajectory(), atol=1e-6)
    np.testing.assert_array_equal(
        slam2.keyframes[-1].track_ids, slam.keyframes[-1].track_ids
    )
    # Resuming: the restored system keeps processing frames.
    feats = make_feature_sequence(
        make_scene(num_cams=6, num_landmarks=400, seed=0, radius=6.0,
                   width=640, height=480),
        capacity=384,
        seed=0,
    )
    info = slam2.process_features(feats[5])
    assert "keyframe" in info


def test_slam_loop_closure_reduces_drift():
    K = 12
    scene = make_scene(
        num_cams=K,
        num_landmarks=800,
        seed=1,
        radius=6.0,
        width=640,
        height=480,
        arc=(0.0, 2 * np.pi * (K - 1) / K),
    )
    feats = make_feature_sequence(scene, capacity=384, noise_px=1.0, seed=1)
    cfg = SlamConfig(
        width=640,
        height=480,
        intrinsics=tuple(float(v) for v in scene.intrinsics),
        ransac=RansacConfig(iterations=512, inlier_threshold=4.0),
        detector_features=384,
        ba_every=10_000,
        loop_min_gap=4,
        loop_min_matches=40,
    )
    slam = SlamSystem(cfg)
    for f in feats:
        slam.process_features(f)
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    ate_before = ate_rmse(slam.trajectory(), gt)
    n = slam.close_loops()
    ate_after = ate_rmse(slam.trajectory(), gt)
    assert n > 0
    assert ate_after < ate_before
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    assert ate_after < 0.01 * scale
    # finalize (closure <-> GBA alternation) must run and not regress.
    fin = slam.finalize(rounds=2)
    assert fin["rounds"] and "loop_edges" in fin["rounds"][0]
    assert ate_rmse(slam.trajectory(), gt) <= ate_after * 1.5


def test_slam_chunked_matches_per_frame():
    """process_features_batch (one dispatch + one fetch for the whole
    chunk) must reproduce the per-frame process_features trajectory."""
    import jax

    scene = make_scene(
        num_cams=8, num_landmarks=400, seed=0, radius=6.0,
        width=640, height=480,
    )
    feats = make_feature_sequence(scene, capacity=384, noise_px=0.5, seed=0)
    cfg = SlamConfig(
        width=640,
        height=480,
        intrinsics=tuple(float(v) for v in scene.intrinsics),
        ransac=RansacConfig(iterations=512, inlier_threshold=4.0),
        detector_features=384,
        ba_every=10_000,
    )
    slam_seq = SlamSystem(cfg)
    infos_seq = [slam_seq.process_features(f) for f in feats]

    slam_chk = SlamSystem(cfg)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *feats)
    infos_chk = slam_chk.process_features_batch(batch)

    assert len(infos_chk) == len(infos_seq)
    assert [i["keyframe"] for i in infos_chk] == [
        i["keyframe"] for i in infos_seq
    ]
    assert len(slam_chk.keyframes) == len(slam_seq.keyframes)
    np.testing.assert_allclose(
        slam_chk.trajectory(), slam_seq.trajectory(), atol=1e-3
    )
    for a, b in zip(slam_chk.keyframes, slam_seq.keyframes):
        np.testing.assert_array_equal(a.track_ids, b.track_ids)


def test_slam_global_ba_improves_or_holds():
    """Final full-trajectory BA (SlamSystem.global_ba) must lower the
    robust cost and not degrade a VO-only trajectory; the matrix-free
    Schur-PCG path must agree with the dense solver's interface."""
    scene, slam, _ = _run_slam(seed=1, ba_every=10_000)  # VO only, no BA
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    ate_vo = ate_rmse(slam.trajectory(), gt)
    assert slam.global_ba()
    ate_gba = ate_rmse(slam.trajectory(), gt)
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    assert ate_gba <= max(ate_vo * 1.05, 0.02 * scale), (ate_gba, ate_vo)

    # The PCG path is a drop-in (returns False when already at a local
    # minimum — it must never *raise* or corrupt state).
    slam.global_ba(use_cg=True)
    ate_cg = ate_rmse(slam.trajectory(), gt)
    assert np.isfinite(ate_cg) and ate_cg <= max(ate_gba * 1.5, 0.02 * scale)
