"""EuRoC MAV evaluation: keyframe SLAM over an ASL-layout sequence + ATE.

BASELINE config 4 (full keyframe SLAM with pose-graph optimization on
EuRoC MH_01).  The dataset is not bundled; point ``--root`` at a sequence
directory (containing ``mav0/``) and this runs:

    native decode -> radial undistort -> detect -> match -> E/H-RANSAC
    -> scale propagation -> windowed BA -> loop closure -> ATE RMSE

Usage:
    python benchmarks/euroc_eval.py --root /data/MH_01_easy \\
        [--max-frames 300] [--stride 4] [--out traj.txt]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="EuRoC sequence directory")
    ap.add_argument("--max-frames", type=int, default=300)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from niftymatch_tpu.config import RansacConfig
    from niftymatch_tpu.data import euroc, native_loader
    from niftymatch_tpu.data.tum import (
        associate,
        load_grayscale_png,
        poses_to_trajectory,
        write_trajectory,
    )
    from niftymatch_tpu.slam import SlamConfig, SlamSystem
    from niftymatch_tpu.utils import ate_rmse

    seq = euroc.load_sequence(args.root)
    idx = np.arange(0, len(seq.cam_paths), args.stride)[: args.max_frames]
    paths = [seq.cam_paths[i] for i in idx]
    times = seq.cam_times[idx]

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
            intrinsics=tuple(seq.intrinsics),
            distortion=tuple(seq.distortion),
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
    loops = slam.close_loops()
    wall = time.perf_counter() - t0
    print(f"processed {len(paths)} frames in {wall:.1f}s; loop edges: {loops}")

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
