"""TUM RGB-D evaluation: full SLAM over a sequence directory + ATE RMSE.

BASELINE configs 2-3 (sequential SIFT matching + E-RANSAC + windowed BA on
TUM fr1/xyz).  The dataset is not bundled (zero-egress environment); point
``--root`` at a standard TUM sequence directory (rgb.txt + rgb/*.png +
groundtruth.txt) and this script runs the complete pipeline:

    native C++ prefetch decode -> detect -> match -> E/H-RANSAC
    -> scale propagation -> windowed BA -> loop closure -> ATE RMSE

The same path runs continuously in CI against a RENDERED TUM-layout
directory (tests/test_tum_pipeline_e2e.py calls :func:`evaluate` on the
golden clip — VERDICT r4 #8), so a real dataset drops in with zero code
changes.

Usage:
    python benchmarks/tum_eval.py --root /data/rgbd_dataset_freiburg1_xyz \\
        [--max-frames 200] [--stride 2] [--out traj.txt]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TUM freiburg1 default intrinsics (fr1 sequences).
FR1_INTRINSICS = (517.3, 516.5, 318.6, 255.3)


def evaluate(
    root: str,
    max_frames: int = 200,
    stride: int = 2,
    intrinsics: tuple = FR1_INTRINSICS,
    out_trajectory: str | None = None,
    close_loops: bool = True,
    ransac_iterations: int = 1024,
    detector_features: int = 1024,
    min_inliers: int = 15,
    verbose: bool = True,
) -> dict:
    """Run the full SLAM pipeline over a TUM sequence directory.

    Returns a dict with keyframe counts, wall time / fps and (when
    ground truth associates) the Sim(3)-aligned ATE RMSE."""
    from niftymatch_tpu.config import RansacConfig
    from niftymatch_tpu.data import native_loader
    from niftymatch_tpu.data.tum import (
        associate,
        load_grayscale_png,
        load_sequence,
        poses_to_trajectory,
        write_trajectory,
    )
    from niftymatch_tpu.slam import SlamConfig, SlamSystem
    from niftymatch_tpu.utils import ate_rmse

    seq = load_sequence(root)
    idx = np.arange(0, len(seq.rgb_paths), stride)[:max_frames]
    paths = [seq.rgb_paths[i] for i in idx]
    times = seq.rgb_times[idx]

    # Probe frame size.
    if native_loader.available():
        info = native_loader.png_info(paths[0])
        w, h = info[0], info[1]
        frames = native_loader.PrefetchLoader(paths, threads=4)
        decode = "native"
    else:
        first = load_grayscale_png(paths[0])
        h, w = first.shape
        frames = (load_grayscale_png(p) for p in paths)
        decode = "python"

    slam = SlamSystem(
        SlamConfig(
            width=w,
            height=h,
            intrinsics=tuple(intrinsics),
            ransac=RansacConfig(
                iterations=ransac_iterations, inlier_threshold=4.0
            ),
            ba_every=3,
            ba_window=5,
            detector_features=detector_features,
            min_inliers=min_inliers,
        )
    )

    t0 = time.perf_counter()
    kept_times = []
    for i, frame in enumerate(frames):
        info = slam.process_frame(frame)
        if info["keyframe"]:
            kept_times.append(times[i])
        if verbose and i % 20 == 0:
            print(f"frame {i}: {info}")
    loops = slam.close_loops() if close_loops else 0
    wall = time.perf_counter() - t0
    if verbose:
        print(f"processed {len(paths)} frames in {wall:.1f}s "
              f"({len(paths) / wall:.1f} fps incl. host loop)")

    result = {
        "root": root,
        "decode": decode,
        "frames": len(paths),
        "keyframes": len(slam.keyframes),
        "loop_edges": int(loops),
        "wall_s": round(wall, 2),
        "fps": round(len(paths) / max(wall, 1e-9), 2),
    }

    # ATE against ground truth (associate by timestamp).
    est = slam.trajectory()
    ia, ib = associate(np.asarray(kept_times), seq.groundtruth.timestamps)
    if len(ia) >= 3:
        ate = ate_rmse(est[ia], seq.groundtruth.positions[ib])
        result["ate_rmse_sim3"] = round(float(ate), 6)
        result["associated_poses"] = int(len(ia))
        if verbose:
            print(f"ATE RMSE (sim-aligned, {len(ia)} poses): {ate:.4f} m")
    elif verbose:
        print("not enough associated ground-truth poses for ATE")

    if out_trajectory:
        traj = poses_to_trajectory(slam.poses(), np.asarray(kept_times))
        write_trajectory(out_trajectory, traj)
        if verbose:
            print(f"trajectory written to {out_trajectory}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="TUM sequence directory")
    ap.add_argument("--max-frames", type=int, default=200)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--out", default=None, help="write estimated TUM trajectory")
    ap.add_argument("--fx", type=float, default=FR1_INTRINSICS[0])
    ap.add_argument("--fy", type=float, default=FR1_INTRINSICS[1])
    ap.add_argument("--cx", type=float, default=FR1_INTRINSICS[2])
    ap.add_argument("--cy", type=float, default=FR1_INTRINSICS[3])
    args = ap.parse_args()

    evaluate(
        args.root,
        max_frames=args.max_frames,
        stride=args.stride,
        intrinsics=(args.fx, args.fy, args.cx, args.cy),
        out_trajectory=args.out,
    )


if __name__ == "__main__":
    main()
