"""Golden-clip ATE artifact: a deterministic rendered sequence driven through
the COMPLETE dataset pipeline, producing a tracked accuracy number.

This is the round-level accuracy evidence for the BASELINE north star (ATE
RMSE, configs 2-4): since the real TUM/EuRoC datasets cannot be downloaded in
this environment (zero egress), we commit a deterministic generator instead —
the same rendered-constellation scene used across the test suite, written to
disk as a real TUM-layout directory (PNGs + rgb.txt + groundtruth.txt) and
then ingested exactly the way ``benchmarks/tum_eval.py`` ingests a real
sequence:

    pure-Python PNG encode -> native C++ prefetch decode -> SIFT detect
    -> match -> E/H-RANSAC -> scale propagation -> windowed BA
    -> Sim(3)-aligned ATE against ground truth

Writes ``ATE_r{N}.json`` at the repo root (one JSON object, see bottom).
If a real TUM sequence is available, pass ``--root`` and the clip generator
is skipped (intrinsics then come from --fx/--fy/--cx/--cy as in tum_eval).

Usage:
    python benchmarks/ate_artifact.py [--round 2] [--frames 48] [--chunk 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_golden_clip(root: str, n_frames: int, seed: int = 0):
    """Render the deterministic golden clip into a TUM-layout directory.

    Returns (scene, timestamps)."""
    import jax.numpy as jnp

    from niftymatch_tpu.data import make_scene, render_frames
    from niftymatch_tpu.data.png import write_png
    from niftymatch_tpu.data.tum import Trajectory, write_trajectory
    from niftymatch_tpu.sfm.se3 import camera_center

    w, h = 640, 480
    scene = make_scene(
        num_cams=n_frames,
        num_landmarks=1200,
        seed=seed,
        radius=6.0,
        width=w,
        height=h,
        arc=(-0.7, 0.7),
    )
    frames = render_frames(scene, seed=seed)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    times = 1000.0 + np.arange(n_frames) * (1.0 / 30.0)
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# timestamp filename\n")
        for i, t in enumerate(times):
            rel = f"rgb/{i:04d}.png"
            write_png(
                os.path.join(root, rel),
                np.clip(frames[i], 0, 255).astype(np.uint8),
            )
            f.write(f"{t:.6f} {rel}\n")
    centers = np.asarray(camera_center(jnp.asarray(scene.poses)))
    write_trajectory(
        os.path.join(root, "groundtruth.txt"),
        Trajectory(
            timestamps=times,
            positions=centers,
            quaternions=np.tile([0.0, 0.0, 0.0, 1.0], (n_frames, 1)),
        ),
    )
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=int(os.environ.get("GRAFT_ROUND", 2)))
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--root", default=None, help="real TUM sequence dir (skips generator)")
    ap.add_argument("--workdir", default=None, help="where to write the golden clip")
    ap.add_argument("--fx", type=float, default=525.0)
    ap.add_argument("--fy", type=float, default=525.0)
    ap.add_argument("--cx", type=float, default=320.0)
    ap.add_argument("--cy", type=float, default=240.0)
    ap.add_argument("--out", default=None, help="output JSON path")
    args = ap.parse_args()

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
    from niftymatch_tpu.data import native_loader
    from niftymatch_tpu.data.tum import associate, load_sequence
    from niftymatch_tpu.slam import SlamConfig, SlamSystem
    from niftymatch_tpu.utils.metrics import ate_rmse, rpe_rmse

    golden = args.root is None
    if golden:
        root = args.workdir or os.path.join(
            os.environ.get("TMPDIR", "/tmp"), f"golden_clip_s{args.seed}_{args.frames}"
        )
        write_golden_clip(root, args.frames, args.seed)
    else:
        root = args.root

    seq = load_sequence(root)
    n = len(seq.rgb_paths)

    # Decode through the native C++ loader (the real dataset path); fall
    # back to the pure-Python decoder only if the .so cannot be built.
    if native_loader.available():
        loader = native_loader.PrefetchLoader(seq.rgb_paths, threads=4)
        frames = np.stack([f for f in loader])
        loader.close()
        decode = "native"
    else:
        from niftymatch_tpu.data.tum import load_grayscale_png

        frames = np.stack([load_grayscale_png(p) for p in seq.rgb_paths])
        decode = "python"

    w, h = frames.shape[2], frames.shape[1]
    slam = SlamSystem(
        SlamConfig(
            width=w,
            height=h,
            intrinsics=(args.fx, args.fy, args.cx, args.cy),
            ransac=RansacConfig(iterations=1024, inlier_threshold=4.0),
            detector_features=1024,
            min_inliers=12,
            chunk_size=args.chunk,
            ba_every=4,
            ba_window=4,
        )
    )
    # First two chunks compile the fused chunk program (minutes on a cold
    # compile cache); time steady-state throughput on the remainder.
    warm = min(2 * args.chunk + 1, max(n - args.chunk, 1))
    infos = slam.process_frames(frames[:warm].astype(np.uint8))
    start = time.perf_counter()
    infos += slam.process_frames(frames[warm:].astype(np.uint8))
    traj_vo = slam.trajectory()  # flushes BA; (K, 3) camera centers
    elapsed = time.perf_counter() - start
    timed_frames = n - warm
    # Final full-trajectory refinement (global BA over every keyframe +
    # track); timed separately — it is a one-off finalisation pass, not
    # per-frame work.
    t_gba = time.perf_counter()
    gba_applied = slam.global_ba()
    traj = slam.trajectory()
    gba_s = time.perf_counter() - t_gba

    kept = [i for i, info in enumerate(infos) if info["keyframe"]]
    assert len(kept) == traj.shape[0], (len(kept), traj.shape)
    kept_times = np.asarray([seq.rgb_times[i] for i in kept])
    ia, ib = associate(kept_times, seq.groundtruth.timestamps)
    est = traj[ia]
    est_vo = traj_vo[ia]
    gt = seq.groundtruth.positions[ib]

    # Monocular: Sim(3) (scale-aligned) ATE is the headline number; the
    # SE(3)-only alignment is reported alongside for reference.
    result = {
        "round": args.round,
        "clip": "golden-rendered" if golden else os.path.basename(root.rstrip("/")),
        "decode": decode,
        "frames": int(n),
        "keyframes": int(traj.shape[0]),
        "ate_rmse_sim3": round(ate_rmse(est, gt, align=True, with_scale=True), 6),
        "ate_rmse_se3": round(ate_rmse(est, gt, align=True, with_scale=False), 6),
        "ate_rmse_sim3_pre_gba": round(
            ate_rmse(est_vo, gt, align=True, with_scale=True), 6
        ),
        "global_ba": bool(gba_applied),
        "global_ba_s": round(gba_s, 2),
        "rpe_rmse": round(rpe_rmse(est, gt), 6),
        "gt_extent": round(float(np.linalg.norm(gt.max(0) - gt.min(0))), 4),
        "wall_s": round(elapsed, 2),
        "frames_per_s": round(timed_frames / max(elapsed, 1e-9), 2),
    }
    result["ate_pct_of_extent"] = round(
        100.0 * result["ate_rmse_sim3"] / max(result["gt_extent"], 1e-9), 3
    )
    out = args.out or os.path.join(REPO, f"ATE_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
