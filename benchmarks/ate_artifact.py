"""Golden-clip ATE artifact: a deterministic rendered sequence driven through
the COMPLETE dataset pipeline, producing a tracked accuracy number.

This is the round-level accuracy evidence for the BASELINE north star (ATE
RMSE, configs 2-4): since the real TUM/EuRoC datasets cannot be downloaded in
this environment (zero egress), we commit a deterministic generator instead —
a rendered-constellation CLOSED-LOOP orbit, written to disk as a real
TUM-layout directory (PNGs + rgb.txt + groundtruth.txt) and then ingested
exactly the way ``benchmarks/tum_eval.py`` ingests a real sequence:

    pure-Python PNG encode -> native C++ prefetch decode -> SIFT detect
    -> match -> E/H-RANSAC -> scale propagation -> windowed BA
    -> LOOP CLOSURE (all-pairs sweep -> pose graph)  [BASELINE config 4]
    -> global bundle adjustment
    -> Sim(3)-aligned ATE / RPE against ground truth

Two variants are recorded (ATE_r{N}.json):

- ``standard``: 96-frame closed loop, the same chunked configuration the
  throughput bench uses — ONE workload provides both the accuracy and the
  >= 30 kf/s throughput number.
- ``hard``: 200-frame closed loop with exposure drift (gain/bias ramp,
  +/-25%) and two 3-frame defocus-blur gaps (relocalization must bridge
  them), plus a per-frame ground-truth-consistency metric for detector/
  descriptor repeatability.

ATE is reported at three stages: pre-closure (VO + windowed BA), post
pose-graph closure, and post global BA — loop closure must measurably
reduce the drift of the closed loop.

Usage:
    python benchmarks/ate_artifact.py [--round 3] [--skip-hard]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_golden_clip(root: str, n_frames: int, seed: int = 0,
                      closed: bool = True, exposure_drift: float = 0.0,
                      blur_gaps=(), noise_gaps=(), turns: int = 1,
                      photometric: dict | None = None,
                      background: str = "flat"):
    """Render the deterministic golden clip into a TUM-layout directory."""
    import jax.numpy as jnp

    from niftymatch_tpu.data import make_scene, render_frames
    from niftymatch_tpu.data.png import write_png
    from niftymatch_tpu.data.tum import Trajectory, write_trajectory
    from niftymatch_tpu.sfm.se3 import camera_center

    w, h = 640, 480
    if closed:
        arc = (0.0, turns * 2.0 * np.pi * (n_frames - 1) / n_frames)
    else:
        arc = (-0.7, 0.7)
    scene = make_scene(
        num_cams=n_frames,
        num_landmarks=1200,
        seed=seed,
        radius=6.0,
        width=w,
        height=h,
        arc=arc,
        helix=0.0 if closed else 0.05,
    )
    frames = render_frames(scene, seed=seed, background=background)
    if photometric is not None:
        # Sensor-realism pass (VERDICT r4 #8): fixed-pattern 1/f texture,
        # rolling-shutter shear, vignette, shot+read noise.
        from niftymatch_tpu.data import apply_photometric

        frames = apply_photometric(frames, seed=seed, **photometric)
    if exposure_drift:
        # Sinusoidal gain/bias ramp over the clip (camera auto-exposure
        # drift): gain in [1-d, 1+d], bias up to +/- 12 gray levels.
        ph = np.linspace(0, 2 * np.pi, n_frames)
        gain = 1.0 + exposure_drift * np.sin(ph)
        bias = 12.0 * exposure_drift * np.sin(2.3 * ph + 0.7)
        frames = frames * gain[:, None, None] + bias[:, None, None]
    for lo, hi in blur_gaps:
        # Separable box-of-gaussian defocus over a frame gap.
        k = np.exp(-0.5 * (np.arange(-6, 7) / 2.5) ** 2)
        k /= k.sum()
        for i in range(lo, min(hi, n_frames)):
            f = frames[i]
            f = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), 1, f)
            f = np.apply_along_axis(
                lambda c: np.convolve(c, k, mode="same"), 0, f)
            frames[i] = f
    for lo, hi in noise_gaps:
        # Total signal dropout (sensor fault / occlusion): pure noise
        # frames that CANNOT track, forcing the relocalization path
        # (VERDICT r3 #8: the hard clip's defocus gaps still tracked,
        # so reloc-load throughput was never measured).
        rng_n = np.random.default_rng(1234 + lo)
        for i in range(lo, min(hi, n_frames)):
            frames[i] = rng_n.uniform(0, 255, frames[i].shape)
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


def gt_consistency(slam, scene, kept: list) -> dict:
    """Per-keyframe detector/descriptor repeatability proxy: for each
    consecutive keyframe pair, the fraction of mutual ratio-test matches
    whose Sampson epipolar distance under the GROUND-TRUTH relative pose
    is < 2 px.  One batched match dispatch for all pairs."""
    K = len(slam.keyframes)
    if K < 2:
        return {}
    pairs = [(k, k + 1) for k in range(K - 1)]
    midx = slam.match_keyframes(pairs)  # (K-1, N)
    fx, fy, cx, cy = scene.intrinsics
    fracs = []
    for k, (a, b) in enumerate(pairs):
        kfa, kfb = slam.keyframes[a], slam.keyframes[b]
        kfa.ensure_host_coords()
        kfb.ensure_host_coords()
        sel = np.nonzero(midx[k] >= 0)[0]
        if sel.size < 8:
            fracs.append(0.0)
            continue
        ua = np.stack([(kfa.host_x[sel] - cx) / fx,
                       (kfa.host_y[sel] - cy) / fy], -1)
        j = midx[k][sel]
        ub = np.stack([(kfb.host_x[j] - cx) / fx,
                       (kfb.host_y[j] - cy) / fy], -1)
        Ta = scene.poses[kept[a]]
        Tb = scene.poses[kept[b]]
        # Relative pose b<-a: x_b = R x_a + t.
        R = Tb[:, :3] @ Ta[:, :3].T
        t = Tb[:, 3] - R @ Ta[:, 3]
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        E = tx @ R
        pa = np.concatenate([ua, np.ones((sel.size, 1))], -1)
        pb = np.concatenate([ub, np.ones((sel.size, 1))], -1)
        Ex = pa @ E.T            # (n, 3)
        Etx = pb @ E             # (n, 3)
        num = np.sum(pb * Ex, -1) ** 2
        den = Ex[:, 0] ** 2 + Ex[:, 1] ** 2 + Etx[:, 0] ** 2 + Etx[:, 1] ** 2
        sampson = num / np.maximum(den, 1e-18)
        thr = (2.0 / (0.5 * (fx + fy))) ** 2
        fracs.append(float(np.mean(sampson < thr)))
    fr = np.asarray(fracs)
    return {
        "gt_consistent_match_frac_mean": round(float(fr.mean()), 4),
        "gt_consistent_match_frac_min": round(float(fr.min()), 4),
    }


def run_variant(name: str, n_frames: int, chunk: int, seed: int,
                workdir: str | None, exposure_drift: float = 0.0,
                blur_gaps=(), noise_gaps=(), turns: int = 1,
                reloc_window: int = 6,
                photometric: dict | None = None,
                background: str = "flat") -> dict:
    import jax

    from niftymatch_tpu.config import RansacConfig
    from niftymatch_tpu.data import native_loader
    from niftymatch_tpu.data.tum import associate, load_sequence
    from niftymatch_tpu.slam import SlamConfig, SlamSystem
    from niftymatch_tpu.utils.metrics import ate_rmse, rpe_rmse, sim3_align

    root = workdir or os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"golden_clip_{name}_s{seed}_{n_frames}",
    )
    scene = write_golden_clip(
        root, n_frames, seed,
        closed=True, exposure_drift=exposure_drift, blur_gaps=blur_gaps,
        noise_gaps=noise_gaps, turns=turns, photometric=photometric,
        background=background,
    )
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
            intrinsics=(525.0, 525.0, w / 2.0, h / 2.0),
            ransac=RansacConfig(iterations=1024, inlier_threshold=4.0),
            detector_features=1024,
            min_inliers=12,
            chunk_size=chunk,
            ba_every=4,
            ba_window=4,
            loop_min_matches=40,
            loop_min_gap=max(3, n_frames // 4),
            reloc_window=reloc_window,
            # Pre-size the feature store to the clip: mid-run capacity
            # doubling re-traces the grow/scatter/gather programs INSIDE
            # the timed segment (store.py docstring; measured on the
            # reloc variant, whose 174 keyframes otherwise grow 64->256).
            store_capacity=1 << int(np.ceil(np.log2(max(64, n)))),
        )
    )
    # First two chunks compile the fused chunk program (minutes on a cold
    # compile cache); time steady-state throughput on the remainder — the
    # SAME workload that produces the accuracy number below.
    warm = min(2 * chunk + 1, max(n - chunk, 1))
    infos = slam.process_frames(frames[:warm].astype(np.uint8))
    slam.prewarm_reloc()  # reloc fires mid-segment on dropout clips
    start = time.perf_counter()
    infos += slam.process_frames(frames[warm:].astype(np.uint8))
    traj_vo = slam.trajectory()  # flushes BA; (K, 3) camera centers
    elapsed = time.perf_counter() - start
    timed_frames = n - warm

    kept = [i for i, info in enumerate(infos) if info["keyframe"]]
    kept_times = np.asarray([seq.rgb_times[i] for i in kept])
    ia, ib = associate(kept_times, seq.groundtruth.timestamps)
    gt = seq.groundtruth.positions[ib]

    def ate(traj):
        return ate_rmse(traj[ia], gt, align=True, with_scale=True)

    # Loop closure (BASELINE config 4): sweep -> verify -> pose graph.
    t_lc = time.perf_counter()
    loops = slam.close_loops()
    lc_stages = dict(getattr(slam, "last_closure_stages", {}))  # first call
    traj_lc = slam.trajectory()
    lc_s = time.perf_counter() - t_lc

    # Global BA.  First call includes trace+compile; a second dispatch of
    # the (shape-bucketed, cached) solver measures solve-only time.
    t_gba = time.perf_counter()
    gba_applied = slam.global_ba()
    gba_guard = getattr(slam, "last_gba_guard", None)
    traj_gba1 = slam.trajectory()
    gba_total_s = time.perf_counter() - t_gba
    t_gba2 = time.perf_counter()
    slam.global_ba()
    gba_solve_s = time.perf_counter() - t_gba2

    # Closure <-> GBA alternation: each closure re-estimates loop-edge
    # scales from the corrected map, so repeating converges further.
    t_fin = time.perf_counter()
    fin = slam.finalize(rounds=2)
    fin_s = time.perf_counter() - t_fin
    traj = slam.trajectory()

    est = traj[ia]
    _, scale = sim3_align(est, gt)
    # Monocular scale diagnostics.  ``sim3_scale`` is dominated by the
    # arbitrary GAUGE (the first pair's unit-baseline convention makes it
    # ~ 2*pi*R/N for this orbit clip by construction — 0.393 at 96
    # frames); actual scale DRIFT is the evolution of the per-step
    # baseline ratio est/gt along the run, summarised as the ratio of
    # its last-decile median to its first-decile median (1.0 = no
    # drift).  VERDICT r3 #5's "scale drift" target is about this
    # quantity, pre-closure.
    def _step_ratio_drift(e):
        be = np.linalg.norm(np.diff(e, axis=0), axis=1)
        bg = np.linalg.norm(np.diff(gt, axis=0), axis=1)
        ok = bg > 1e-9
        r = be[ok] / bg[ok]
        k = max(3, len(r) // 10)
        a = np.median(r[:k])
        b = np.median(r[-k:])
        return float(b / max(a, 1e-12))

    drift_pre = _step_ratio_drift(traj_vo[ia])
    drift_final = _step_ratio_drift(est)
    result = {
        "variant": name,
        "clip": "golden-rendered-closed-loop",
        "decode": decode,
        "frames": int(n),
        "keyframes": int(traj.shape[0]),
        "relocs": sum(1 for i in infos if i.get("reloc")),
        "loop_edges": int(loops),
        "ate_rmse_sim3_pre_closure": round(ate(traj_vo), 6),
        "ate_rmse_sim3_post_closure": round(ate(traj_lc), 6),
        "ate_rmse_sim3_post_gba": round(ate(traj_gba1), 6),
        "ate_rmse_sim3": round(ate(traj), 6),
        "finalize_rounds": fin["rounds"],
        "finalize_s": round(fin_s, 2),
        "ate_rmse_se3": round(
            ate_rmse(est, gt, align=True, with_scale=False), 6),
        "sim3_scale": round(scale, 6),
        "gauge_scale_expected": round(
            float(np.median(np.linalg.norm(np.diff(gt, axis=0), axis=1))), 4),
        "scale_drift_pre_closure": round(drift_pre, 4),
        "scale_drift_final": round(drift_final, 4),
        "rpe_rmse_sim3": round(rpe_rmse(est, gt, align=True), 6),
        "loop_closure_s": round(lc_s, 2),
        "loop_closure_stages": lc_stages,
        "global_ba": bool(gba_applied),
        # Loop-edge consistency guard decision of the FIRST global-BA
        # dispatch (map-scale-normalised before/after; slam/globalba.py).
        "gba_guard": gba_guard,
        "global_ba_total_s": round(gba_total_s, 2),
        "global_ba_solve_s": round(gba_solve_s, 2),
        "gt_extent": round(float(np.linalg.norm(gt.max(0) - gt.min(0))), 4),
        "wall_s": round(elapsed, 2),
        "frames_per_s": round(timed_frames / max(elapsed, 1e-9), 2),
    }
    result["ate_pct_of_extent"] = round(
        100.0 * result["ate_rmse_sim3"] / max(result["gt_extent"], 1e-9), 3
    )
    result.update(gt_consistency(slam, scene, kept))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int,
                    default=int(os.environ.get("GRAFT_ROUND", 3)))
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--hard-frames", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--skip-hard", action="store_true")
    ap.add_argument("--out", default=None)
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

    # Self-describe cache state: loop_closure_s in a process with warm
    # DISK caches (AOT-exported traces, utils/aot.py + XLA persistent
    # compile cache) is the recurring per-process cost; an empty-cache
    # run additionally pays one-time trace+compile (~25 s at 96 kf).
    from niftymatch_tpu.utils import aot as _aot

    aot_dir = _aot.cache_dir()
    aot_entries = (
        len([p for p in os.listdir(aot_dir) if p.endswith(".jaxexp")])
        if aot_dir and os.path.isdir(aot_dir) else 0
    )
    result = {
        "caches": {
            "aot_dir": aot_dir or "",
            "aot_entries_at_start": aot_entries,
            "xla_cache_dir": cache_dir,
            # Cold runs self-identify (VERDICT r4 #1): the documented
            # 3-run protocol sets run_index; a steady-state run has
            # run_index >= 2 AND gains no new AOT entries (see
            # aot_entries_at_end, added before writing).
            "run_index": int(os.environ.get("GRAFT_ATE_RUN_INDEX", 0)),
            # Provenance: hash of the package sources the run executed
            # (utils/aot._package_hash).  verify_bars.py recomputes it
            # from the tree, so "artifact reflects the final source" is
            # machine-checkable rather than asserted (VERDICT r4 weak #1).
            "package_hash": _aot._package_hash(),
        },
        "standard": run_variant(
            "standard", args.frames, args.chunk, args.seed, args.workdir
        )
    }
    print(json.dumps(result["standard"]))
    if not args.skip_hard:
        # Photometric-hard: the standard clip + view-consistent distant
        # scene texture (environment-map backdrop) + sensor-realism pass
        # (FPN, rolling shutter, vignette, shot/read noise) — done bar:
        # ATE%% within 1.5x of the clean variant.
        result["photo"] = run_variant(
            "photo", args.frames, args.chunk, args.seed, None,
            photometric={}, background="sky",
        )
        print(json.dumps(result["photo"]))
    if not args.skip_hard:
        hf = args.hard_frames
        result["hard"] = run_variant(
            "hard", hf, args.chunk, args.seed + 1, None,
            exposure_drift=0.25,
            blur_gaps=((hf // 3, hf // 3 + 3), (2 * hf // 3, 2 * hf // 3 + 3)),
            noise_gaps=((2 * hf // 5, 2 * hf // 5 + 3),
                        (4 * hf // 5, 4 * hf // 5 + 3)),
        )
        print(json.dumps(result["hard"]))
        # Reloc-load variant: TWO orbits (revisits every hf/2 frames)
        # with two LONG dropout gaps placed so the post-gap view is
        # ~43 deg past the last keyframe (direct tracking fails) but
        # coincides with a first-orbit / start-cluster keyframe —
        # recovery must go through the stride-sampled global
        # relocalization query, measuring throughput UNDER reloc load
        # (VERDICT r3 #8: the hard clip's 3-frame gaps re-tracked
        # directly and never exercised reloc).
        result["reloc"] = run_variant(
            "reloc", hf, args.chunk, args.seed + 1, None,
            exposure_drift=0.25,
            noise_gaps=((int(0.465 * hf), int(0.52 * hf)),
                        (int(0.885 * hf), int(0.94 * hf))),
            turns=2,
            reloc_window=16,
        )
        print(json.dumps(result["reloc"]))

    result["caches"]["aot_entries_at_end"] = (
        len([p for p in os.listdir(aot_dir) if p.endswith(".jaxexp")])
        if aot_dir and os.path.isdir(aot_dir) else 0
    )
    out = args.out or os.path.join(REPO, f"ATE_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
