"""Full TUM-format pipeline integration: rendered frames written as a TUM
sequence directory (PNGs + rgb.txt + groundtruth.txt), then ingested the
way ``benchmarks/tum_eval.py`` does: native C++ decode -> detect -> match
-> E/H-RANSAC -> scale propagation -> windowed BA -> ATE association.

This validates the *mechanics* of the dataset path end-to-end; precision
assertions are loose (rendered blob scenes give ~25 inliers/pair, so the
monocular translation direction is data-limited — see test_rendered_vo)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.data import make_scene, native_loader, render_frames
from niftymatch_tpu.data.tum import (
    Trajectory,
    associate,
    load_sequence,
    write_trajectory,
)
from niftymatch_tpu.sfm.se3 import camera_center
from niftymatch_tpu.slam import SlamConfig, SlamSystem

from test_native_loader import write_png


@pytest.mark.slow
def test_tum_sequence_roundtrip_through_slam(tmp_path):
    if not native_loader.available():
        pytest.skip("native loader not built")
    w, h = 640, 480
    K = 5
    scene = make_scene(num_cams=K, num_landmarks=1200, seed=0, radius=6.0,
                       width=w, height=h, arc=(-0.25, 0.25))
    frames = render_frames(scene, seed=0)

    # Write a TUM-layout sequence directory.
    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    times = 1000.0 + np.arange(K) * 0.1
    with open(root / "rgb.txt", "w") as f:
        f.write("# timestamp filename\n")
        for i, t in enumerate(times):
            rel = f"rgb/{i:04d}.png"
            write_png(str(root / rel), np.clip(frames[i], 0, 255).astype(np.uint8))
            f.write(f"{t:.6f} {rel}\n")
    centers = np.asarray(camera_center(jnp.asarray(scene.poses)))
    write_trajectory(
        str(root / "groundtruth.txt"),
        Trajectory(
            timestamps=times,
            positions=centers,
            quaternions=np.tile([0.0, 0.0, 0.0, 1.0], (K, 1)),
        ),
    )

    # Ingest exactly as tum_eval does.
    seq = load_sequence(str(root))
    assert len(seq.rgb_paths) == K
    loader = native_loader.PrefetchLoader(seq.rgb_paths, threads=2)

    slam = SlamSystem(
        SlamConfig(
            width=w,
            height=h,
            intrinsics=(525.0, 525.0, w / 2.0, h / 2.0),
            ransac=RansacConfig(iterations=1024, inlier_threshold=4.0),
            detector_features=1024,
            ba_every=3,
            ba_window=4,
            min_inliers=12,
        )
    )
    kept_times = []
    for i, frame in enumerate(loader):
        info = slam.process_frame(frame)
        if info["keyframe"]:
            kept_times.append(seq.rgb_times[i])
    loader.close()

    # Mechanics assertions: most frames registered, trajectory finite,
    # ground-truth association works.
    assert len(slam.keyframes) >= K - 1, len(slam.keyframes)
    traj = slam.trajectory()
    assert np.isfinite(traj).all()
    ia, ib = associate(np.asarray(kept_times), seq.groundtruth.timestamps)
    assert len(ia) == len(slam.keyframes)
    # Trajectory is non-degenerate (camera actually moved).
    assert np.linalg.norm(traj[-1] - traj[0]) > 1e-3


@pytest.mark.slow
def test_tum_eval_script_on_rendered_directory(tmp_path):
    """benchmarks/tum_eval.py itself runs in CI against a rendered
    TUM-layout directory (VERDICT r4 #8): the exact code path a real TUM
    download would take — load_sequence, native decode, per-frame SLAM,
    ATE association — exercised end-to-end without egress."""
    import sys as _sys

    bench_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    _sys.path.insert(0, os.path.abspath(bench_dir))
    try:
        from ate_artifact import write_golden_clip
        from tum_eval import evaluate
    finally:
        _sys.path.pop(0)

    root = str(tmp_path / "seq")
    write_golden_clip(root, 20, seed=0, closed=False)
    res = evaluate(
        root,
        max_frames=20,
        stride=1,
        intrinsics=(525.0, 525.0, 320.0, 240.0),
        close_loops=False,
        ransac_iterations=512,
        min_inliers=12,
        verbose=False,
    )
    assert res["frames"] == 20
    assert res["keyframes"] >= 16, res
    assert res.get("associated_poses", 0) == res["keyframes"]
    assert np.isfinite(res["ate_rmse_sim3"]), res
    assert res["fps"] > 0


@pytest.mark.slow
def test_photometric_hard_rendering_still_tracks(tmp_path):
    """The sensor-realism pass (fixed-pattern texture, rolling shutter,
    vignette, shot/read noise) must not break tracking: the photometric
    variant of the rendered clip registers nearly all frames."""
    import sys as _sys

    bench_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    _sys.path.insert(0, os.path.abspath(bench_dir))
    try:
        from ate_artifact import write_golden_clip
        from tum_eval import evaluate
    finally:
        _sys.path.pop(0)

    root = str(tmp_path / "seq_photo")
    write_golden_clip(root, 20, seed=0, closed=False, photometric={})
    res = evaluate(
        root,
        max_frames=20,
        stride=1,
        intrinsics=(525.0, 525.0, 320.0, 240.0),
        close_loops=False,
        ransac_iterations=512,
        min_inliers=12,
        verbose=False,
    )
    assert res["keyframes"] >= 16, res
    assert np.isfinite(res["ate_rmse_sim3"]), res
