"""EuRoC MAV evaluation: keyframe SLAM over an ASL-layout sequence + ATE.

BASELINE config 4 (full keyframe SLAM with pose-graph optimization on
EuRoC MH_01).  Two modes:

- ``--root <dir>``: a real EuRoC sequence directory (containing ``mav0/``).
- ``--golden``: no dataset needed (zero-egress environment) — renders a
  deterministic closed-loop clip WITH the EuRoC cam0 radial distortion
  applied at projection time, writes it in the exact ASL layout
  (``mav0/cam0/data.csv`` + PNGs + ``sensor.yaml`` + ground-truth csv),
  and ingests it through the same loader.  This exercises the full EuRoC
  path including ``sensor.yaml`` parsing and the undistort + remap
  front-end that rectified TUM clips never touch.

Pipeline (either mode):

    native decode -> radial undistort -> detect -> match -> E/H-RANSAC
    -> scale propagation -> windowed BA -> loop closure -> global BA
    -> Sim(3) ATE RMSE

Writes EUROC_r{N}.json at the repo root in --golden mode.

Usage:
    python benchmarks/euroc_eval.py --golden
    python benchmarks/euroc_eval.py --root /data/MH_01_easy [--stride 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_golden_euroc(root: str, n_frames: int, seed: int = 0):
    """Render a closed-loop orbit with EuRoC cam0 optics into ASL layout."""
    import jax.numpy as jnp

    from niftymatch_tpu.data import make_scene, render_frames
    from niftymatch_tpu.data.euroc import DEFAULT_DISTORTION, DEFAULT_INTRINSICS
    from niftymatch_tpu.data.png import write_png
    from niftymatch_tpu.sfm.se3 import camera_center

    w, h = 752, 480  # EuRoC cam0 resolution
    fx, fy, cx, cy = DEFAULT_INTRINSICS
    scene = make_scene(
        num_cams=n_frames,
        num_landmarks=1200,
        seed=seed,
        radius=6.0,
        width=w,
        height=h,
        arc=(0.0, 2.0 * np.pi * (n_frames - 1) / n_frames),
        helix=0.0,
    )
    # make_scene centres the principal point; override with EuRoC optics.
    scene = scene._replace(
        intrinsics=np.array([fx, fy, cx, cy], np.float32)
    )
    frames = render_frames(scene, seed=seed, distortion=DEFAULT_DISTORTION)

    cam = os.path.join(root, "mav0", "cam0")
    gt_dir = os.path.join(root, "mav0", "state_groundtruth_estimate0")
    os.makedirs(os.path.join(cam, "data"), exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    t0_ns = 1403636579763555584  # EuRoC-style ns timestamps
    dt_ns = int(1e9 / 20)        # 20 Hz cam
    with open(os.path.join(cam, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(n_frames):
            ts = t0_ns + i * dt_ns
            name = f"{ts}.png"
            write_png(
                os.path.join(cam, "data", name),
                np.clip(frames[i], 0, 255).astype(np.uint8),
            )
            f.write(f"{ts},{name}\n")
    with open(os.path.join(cam, "sensor.yaml"), "w") as f:
        f.write("sensor_type: camera\n")
        f.write(f"intrinsics: [{fx}, {fy}, {cx}, {cy}]\n")
        f.write("distortion_model: radial-tangential\n")
        k1, k2, k3 = DEFAULT_DISTORTION
        f.write(f"distortion_coefficients: [{k1}, {k2}, {k3}, 0.0]\n")
    centers = np.asarray(camera_center(jnp.asarray(scene.poses)))
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        for i in range(n_frames):
            ts = t0_ns + i * dt_ns
            p = centers[i]
            f.write(f"{ts},{p[0]},{p[1]},{p[2]},1.0,0.0,0.0,0.0\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None, help="EuRoC sequence directory")
    ap.add_argument("--golden", action="store_true",
                    help="render + evaluate the golden ASL-layout clip")
    ap.add_argument("--round", type=int,
                    default=int(os.environ.get("GRAFT_ROUND", 3)))
    ap.add_argument("--frames", type=int, default=96,
                    help="golden clip length")
    ap.add_argument("--max-frames", type=int, default=300)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not args.golden and args.root is None:
        ap.error("pass --root <dir> or --golden")

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from niftymatch_tpu.config import RansacConfig
    from niftymatch_tpu.data import euroc, native_loader
    from niftymatch_tpu.data.tum import (
        associate,
        load_grayscale_png,
        poses_to_trajectory,
        write_trajectory,
    )
    from niftymatch_tpu.slam import SlamConfig, SlamSystem
    from niftymatch_tpu.utils import ate_rmse, rpe_rmse, sim3_align

    if args.golden:
        root = os.path.join(
            os.environ.get("TMPDIR", "/tmp"),
            f"golden_euroc_s{args.seed}_{args.frames}",
        )
        write_golden_euroc(root, args.frames, args.seed)
        stride = 1
    else:
        root = args.root
        stride = args.stride

    seq = euroc.load_sequence(root)
    idx = np.arange(0, len(seq.cam_paths), stride)[: args.max_frames]
    paths = [seq.cam_paths[i] for i in idx]
    times = seq.cam_times[idx]

    if native_loader.available():
        frames = np.stack(
            [f for f in native_loader.PrefetchLoader(paths, threads=4)]
        )
        decode = "native"
    else:
        frames = np.stack([load_grayscale_png(p) for p in paths])
        decode = "python"
    h, w = frames.shape[1], frames.shape[2]

    slam = SlamSystem(
        SlamConfig(
            width=w,
            height=h,
            intrinsics=tuple(seq.intrinsics),
            distortion=tuple(seq.distortion),
            ransac=RansacConfig(iterations=1024, inlier_threshold=4.0),
            ba_every=4,
            ba_window=4,
            min_inliers=12,
            chunk_size=args.chunk,
            detector_features=1024,
            loop_min_matches=40,
        )
    )

    warm = min(2 * args.chunk + 1, max(len(frames) - args.chunk, 1))
    infos = slam.process_frames(frames[:warm].astype(np.uint8))
    t0 = time.perf_counter()
    infos += slam.process_frames(frames[warm:].astype(np.uint8))
    traj_vo = slam.trajectory()
    wall = time.perf_counter() - t0
    loops = slam.close_loops()
    traj_lc = slam.trajectory()
    gba = slam.global_ba()
    slam.finalize(rounds=2)
    est_all = slam.trajectory()

    kept = [i for i, info in enumerate(infos) if info["keyframe"]]
    kept_times = np.asarray([times[i] for i in kept])
    ia, ib = associate(kept_times, seq.groundtruth.timestamps)
    if len(ia) < 3:
        print("not enough associated ground-truth poses for ATE")
        return
    gt = seq.groundtruth.positions[ib]
    est = est_all[ia]
    _, scale = sim3_align(est, gt)
    result = {
        "clip": "golden-euroc-closed-loop" if args.golden else os.path.basename(
            root.rstrip("/")),
        "decode": decode,
        "undistort": True,
        "frames": int(len(frames)),
        "keyframes": int(est_all.shape[0]),
        "loop_edges": int(loops),
        "global_ba": bool(gba),
        "ate_rmse_sim3_pre_closure": round(
            ate_rmse(traj_vo[ia], gt, align=True, with_scale=True), 6),
        "ate_rmse_sim3_post_closure": round(
            ate_rmse(traj_lc[ia], gt, align=True, with_scale=True), 6),
        "ate_rmse_sim3": round(
            ate_rmse(est, gt, align=True, with_scale=True), 6),
        "rpe_rmse_sim3": round(rpe_rmse(est, gt, align=True), 6),
        "sim3_scale": round(scale, 6),
        "gt_extent": round(float(np.linalg.norm(gt.max(0) - gt.min(0))), 4),
        "wall_s": round(wall, 2),
        "frames_per_s": round((len(frames) - warm) / max(wall, 1e-9), 2),
    }
    result["ate_pct_of_extent"] = round(
        100.0 * result["ate_rmse_sim3"] / max(result["gt_extent"], 1e-9), 3
    )
    # Provenance: hash of the package sources the run executed; checked
    # against the tree by verify_bars.py (VERDICT r4 weak #1).
    from niftymatch_tpu.utils.aot import _package_hash

    result["package_hash"] = _package_hash()
    print(json.dumps(result))
    if args.golden:
        out = args.out or os.path.join(REPO, f"EUROC_r{args.round:02d}.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    if args.out and not args.golden:
        traj = poses_to_trajectory(slam.poses(), np.asarray(kept_times))
        write_trajectory(args.out, traj)
        print(f"trajectory written to {args.out}")


if __name__ == "__main__":
    main()
