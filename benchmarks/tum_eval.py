"""TUM RGB-D evaluation: full SLAM over a sequence directory + ATE RMSE.

BASELINE configs 2-3 (sequential SIFT matching + E-RANSAC + windowed BA on
TUM fr1/xyz).  The dataset is not bundled (zero-egress environment); point
``--root`` at a standard TUM sequence directory (rgb.txt + rgb/*.png +
groundtruth.txt) and this script runs the complete pipeline:

    native C++ prefetch decode -> detect -> match -> E/H-RANSAC
    -> scale propagation -> windowed BA -> loop closure -> ATE RMSE

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

    seq = load_sequence(args.root)
    idx = np.arange(0, len(seq.rgb_paths), args.stride)[: args.max_frames]
    paths = [seq.rgb_paths[i] for i in idx]
    times = seq.rgb_times[idx]

    # Probe frame size.
    if native_loader.available():
        info = native_loader.png_info(paths[0])
        w, h = info[0], info[1]
        frames = native_loader.PrefetchLoader(paths, threads=4)
    else:
        first = load_grayscale_png(paths[0])
        h, w = first.shape
        frames = (load_grayscale_png(p) for p in paths)

    slam = SlamSystem(
        SlamConfig(
            width=w,
            height=h,
            intrinsics=(args.fx, args.fy, args.cx, args.cy),
            ransac=RansacConfig(iterations=1024, inlier_threshold=4.0),
            ba_every=3,
            ba_window=5,
            detector_features=1024,
        )
    )

    t0 = time.perf_counter()
    kept_times = []
    for i, frame in enumerate(frames):
        info = slam.process_frame(frame)
        if info["keyframe"]:
            kept_times.append(times[i])
        if i % 20 == 0:
            print(f"frame {i}: {info}")
    slam.close_loops()
    wall = time.perf_counter() - t0
    print(f"processed {len(paths)} frames in {wall:.1f}s "
          f"({len(paths) / wall:.1f} fps incl. host loop)")

    # ATE against ground truth (associate by timestamp).
    est = slam.trajectory()
    ia, ib = associate(np.asarray(kept_times), seq.groundtruth.timestamps)
    if len(ia) >= 3:
        ate = ate_rmse(est[ia], seq.groundtruth.positions[ib])
        print(f"ATE RMSE (sim-aligned, {len(ia)} poses): {ate:.4f} m")
    else:
        print("not enough associated ground-truth poses for ATE")

    if args.out:
        traj = poses_to_trajectory(slam.poses(), np.asarray(kept_times))
        write_trajectory(args.out, traj)
        print(f"trajectory written to {args.out}")


if __name__ == "__main__":
    main()
