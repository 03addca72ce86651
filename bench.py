"""Round benchmark: keyframe throughput of the flagship SIFT front-end
AND the full SLAM loop (detect + track + triangulate + windowed BA).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with the
full-loop numbers under "extra".  Baseline target: >= 30 keyframes/s/chip
(BASELINE.md north star).  The primary metric is the BASELINE config-1
workload (detect+describe on 640x480 + the pair's share of matching); the
"extra.slam_keyframes_per_s" field is the same target measured on the
metric that matters — the complete SLAM loop via chunked dispatch
(SlamSystem.process_frames: one compiled program + one batched fetch per
8-frame chunk).
"""

import json
import time

import numpy as np


def make_scene(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : h + 16, 0 : w + 16].astype(np.float32)
    scene = np.zeros_like(yy)
    for _ in range(120):
        by, bx = rng.uniform(10, h), rng.uniform(10, w)
        bs = rng.uniform(2, 7)
        amp = rng.uniform(60, 255) * rng.choice([-1.0, 1.0])
        scene += amp * np.exp(-((yy - by) ** 2 + (xx - bx) ** 2) / (2 * bs**2))
    scene += 128.0
    return scene


def bench_slam_loop(n_frames=97, chunk=16):
    """Full SLAM loop throughput on rendered frames: detector + two-view
    tracking + triangulation + windowed BA, driven through the chunked
    dispatch path (one compiled program + one batched fetch per chunk).

    The store is pre-sized to the run's keyframe count (``store_capacity``),
    as a production deployment would: otherwise a capacity-doubling
    re-trace (~0.7 s, amortised O(log K)) lands inside the short timed
    window and dominates the measurement."""
    import jax

    from niftymatch_tpu.config import RansacConfig
    from niftymatch_tpu.data import make_scene as make_3d_scene
    from niftymatch_tpu.data import render_frames
    from niftymatch_tpu.slam import SlamConfig, SlamSystem

    w, h = 640, 480
    scene = make_3d_scene(
        num_cams=n_frames + chunk,
        num_landmarks=1200,
        seed=0,
        radius=6.0,
        width=w,
        height=h,
    )
    # uint8 frames, as a real camera delivers them: process_frames keeps
    # uint8 on the wire (4x less upload bandwidth) and casts on device.
    frames = np.clip(render_frames(scene, seed=0), 0, 255).astype(np.uint8)
    cfg = SlamConfig(
        width=w,
        height=h,
        intrinsics=tuple(float(v) for v in scene.intrinsics),
        ransac=RansacConfig(iterations=512, inlier_threshold=4.0),
        detector_features=1024,
        min_inliers=12,
        chunk_size=chunk,
        ba_every=4,
        ba_window=4,
        store_capacity=256,
    )
    slam = SlamSystem(cfg)
    # Warm-up: two chunks — the first compiles the fused chunk program +
    # detector, the second the store-scatter/windowed-BA programs that
    # only trigger once a chunk has been absorbed.
    slam.process_frames(frames[: 2 * chunk + 1])
    import time as _t

    start = _t.perf_counter()
    infos = slam.process_frames(frames[2 * chunk + 1 :])
    slam.flush_ba()
    elapsed = _t.perf_counter() - start
    accepted = sum(1 for i in infos if i["keyframe"])
    return {
        "slam_keyframes_per_s": round(len(infos) / elapsed, 2),
        "slam_frames": len(infos),
        "slam_accept_frac": round(accepted / max(len(infos), 1), 3),
    }


def main():
    import os

    import jax

    # Persistent compile cache: the tunneled remote-compile service is slow
    # and intermittently flaky on large graphs; caching makes reruns instant.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as _np

    from niftymatch_tpu import SiftConfig
    from niftymatch_tpu.sift import detect_and_describe_batch, match_pair

    h, w = 480, 640
    cfg = SiftConfig(width=w, height=h)
    # Chunked dispatch, the production serving mode (same shape as the SLAM
    # loop): each compiled call detects a batch of 2*chunk keyframes and
    # ratio-test matches the chunk's pairs — one dispatch, no per-pair host
    # round-trips.  Inputs are DISTINCT per call (identical repeated
    # dispatches can be memoized by the runtime and overstate throughput).
    chunk = 8                       # pairs per dispatch (16 keyframes)
    n_batches = 6

    def pair_chunk(imgs_a, imgs_b):
        feats = detect_and_describe_batch(
            jnp.concatenate([imgs_a, imgs_b]), cfg
        )
        fa = jax.tree.map(lambda v: v[:chunk], feats)
        fb = jax.tree.map(lambda v: v[chunk:], feats)
        m = jax.vmap(lambda a, b: match_pair(a, b).indices)(fa, fb)
        return m

    run = jax.jit(pair_chunk)

    batches = []
    for bi in range(n_batches + 1):
        scenes = [
            make_scene(h, w, seed=bi * chunk + s) for s in range(chunk)
        ]
        batches.append(
            (
                jnp.asarray(_np.stack([sc[:h, :w] for sc in scenes])),
                jnp.asarray(
                    _np.stack([sc[5 : h + 5, 5 : w + 5] for sc in scenes])
                ),
            )
        )

    # Warm-up / compile (fetch-forced: through the tunneled runtime
    # block_until_ready can return before execution finishes).
    jax.device_get(run(*batches[-1])[:1, :1])

    # Timed: completion forced by FETCHING real output values; execution is
    # in launch order on a single chip, so fetching the final batch's output
    # bounds the whole pipeline while keeping dispatch overlap.
    outs = []
    start = time.perf_counter()
    for bi in range(n_batches):
        outs.append(run(*batches[bi]))
    jax.device_get(outs[-1][:1, :1])
    elapsed = time.perf_counter() - start

    kf_per_s = 2.0 * chunk * n_batches / elapsed

    try:
        extra = bench_slam_loop()
    except Exception as e:  # pragma: no cover - keep the primary metric
        extra = {"slam_error": repr(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "keyframes_per_s_per_chip",
                "value": round(kf_per_s, 2),
                "unit": "keyframes/s",
                "vs_baseline": round(kf_per_s / 30.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
