"""Relocalization: recovery after tracking failure.

Round-1 behavior dropped lost frames forever (a blurry stretch ended the
run); now ``reloc_after`` consecutive rejections trigger a one-dispatch
batched query against the last ``reloc_window`` keyframes
(``SlamSystem._maybe_relocalize``)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run via ci/test-full.sh
import jax.numpy as jnp

from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.data import make_scene
from niftymatch_tpu.data.synthetic import make_feature_sequence
from niftymatch_tpu.features import Features
from niftymatch_tpu.sfm.se3 import camera_center
from niftymatch_tpu.slam import SlamConfig, SlamSystem
from niftymatch_tpu.utils import ate_rmse


def _garbage_features(capacity=384, seed=0, width=640, height=480):
    """A frame of pure noise: random unit descriptors, random positions —
    models a fully blurred / dropped frame that matches nothing."""
    rng = np.random.default_rng(seed + 91)
    d = rng.normal(size=(capacity, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Features(
        x=jnp.asarray(rng.uniform(0, width, capacity).astype(np.float32)),
        y=jnp.asarray(rng.uniform(0, height, capacity).astype(np.float32)),
        sigma=jnp.ones(capacity, jnp.float32),
        angle=jnp.zeros(capacity, jnp.float32),
        response=jnp.ones(capacity, jnp.float32),
        octave=jnp.zeros(capacity, jnp.int32),
        level=jnp.zeros(capacity, jnp.int32),
        desc=jnp.asarray(d),
        valid=jnp.ones(capacity, bool),
    )


def _cfg(scene, **kw):
    return SlamConfig(
        width=640,
        height=480,
        intrinsics=tuple(float(v) for v in scene.intrinsics),
        ransac=RansacConfig(iterations=512, inlier_threshold=4.0),
        detector_features=384,
        ba_every=10_000,
        **kw,
    )


def test_blur_gap_recovers_trajectory():
    """Three garbage frames mid-sequence: the system must reject them and
    keep tracking afterwards, with ATE within 2x of the clean run."""
    scene = make_scene(
        num_cams=10, num_landmarks=400, seed=0, radius=6.0,
        width=640, height=480,
    )
    feats = make_feature_sequence(scene, capacity=384, noise_px=0.5, seed=0)
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))

    clean = SlamSystem(_cfg(scene))
    for f in feats:
        clean.process_features(f)
    ate_clean = ate_rmse(clean.trajectory(), gt)

    slam = SlamSystem(_cfg(scene))
    seq = feats[:5] + [_garbage_features(seed=s) for s in range(3)] + feats[8:]
    infos = [slam.process_features(f) for f in seq]
    rejected = [i for i, inf in enumerate(infos) if not inf["keyframe"]]
    assert rejected == [5, 6, 7], infos
    # Tracking resumed after the gap: keyframes for frames 0-4, 8, 9.
    assert len(slam.keyframes) == 7
    kept = [0, 1, 2, 3, 4, 8, 9]
    ate_gap = ate_rmse(slam.trajectory(), gt[kept])
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    assert ate_gap < max(2.0 * ate_clean, 0.005 * scale), (ate_gap, ate_clean)


def _outward_ring_scene(num_cams=24, num_landmarks=1600, seed=1):
    """Cameras on a circle looking radially OUTWARD at a landmark ring:
    each camera sees only its ~63 deg sector, so distant frames share no
    landmarks (unlike the center-looking orbit, where every camera sees the
    whole cloud and any pair matches)."""
    from niftymatch_tpu.data.synthetic import SyntheticScene, _look_at

    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, num_landmarks)
    r = rng.uniform(10.0, 14.0, num_landmarks)
    landmarks = np.stack(
        [r * np.sin(th), rng.uniform(-2.5, 2.5, num_landmarks), -r * np.cos(th)],
        axis=1,
    ).astype(np.float32)
    angles = np.linspace(0.0, 2 * np.pi * (num_cams - 1) / num_cams, num_cams)
    poses = []
    for i, a in enumerate(angles):
        eye = np.array([6.0 * np.sin(a), 0.05 * np.sin(3 * a), -6.0 * np.cos(a)])
        eye += rng.normal(0, 0.02, 3)
        poses.append(_look_at(eye, 2.0 * eye))
    return SyntheticScene(
        poses=np.stack(poses),
        landmarks=landmarks,
        intrinsics=np.array([525.0, 525.0, 320.0, 240.0], np.float32),
        width=640,
        height=480,
    )


def test_batched_relocalization_reanchors():
    """After a gap, the camera resumes FAR from the last keyframe but near
    an older one: the normal step fails, the batched reloc query must
    re-anchor at the right keyframe."""
    scene = _outward_ring_scene(num_cams=48)
    feats = make_feature_sequence(scene, capacity=384, noise_px=0.5, seed=1)
    slam = SlamSystem(_cfg(scene, reloc_after=2, reloc_window=6))
    # Main run: even frames 0..32 -> 17 keyframes 15 deg apart (adjacent
    # sectors overlap ~80 matches; >= 45 deg apart share nothing).
    main = list(range(0, 33, 2))
    for i in main:
        info = slam.process_features(feats[i])
        assert info["keyframe"], (i, info)
    # Two garbage frames exhaust the miss budget (reloc attempts on them
    # must fail gracefully).
    for s in range(2):
        info = slam.process_features(_garbage_features(seed=10 + s))
        assert not info["keyframe"]
    # Camera re-appears at frame 25 (187.5 deg) — 7.5 deg from old
    # keyframes 12/13 (frames 24/26) but 52.5 deg from the last keyframe
    # (frame 32): the normal step must fail, the reloc query must hit.
    info = slam.process_features(feats[25])
    assert info["keyframe"], info
    assert info.get("reloc"), info
    assert info["anchor"] in (12, 13), info
    # The re-anchored trajectory stays consistent: similarity-aligned ATE
    # over all keyframes (monocular estimates are defined up to a global
    # similarity; raw coordinates are not comparable).
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    est = slam.trajectory()
    kept = main + [25]
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    assert ate_rmse(est, gt[kept]) < 0.1 * scale
