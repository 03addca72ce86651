"""Scaling-efficiency harness: ring matching + distributed BA vs mesh size.

Runs the two collective workloads on meshes of 1..N devices and reports
throughput + parallel efficiency (BASELINE.md: >= 80% on a 2-host slice).
On a single TPU chip this runs on the virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``)
to validate the scaling *structure*; on real slices the same script
measures real ICI/DCN scaling (run once per slice size).

Usage: python benchmarks/scaling.py [max_devices]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(max_devices: int | None = None):
    import jax

    # The axon plugin overrides JAX_PLATFORMS from the environment; re-force
    # the requested platform via config (see tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from niftymatch_tpu.config import BAConfig
    from niftymatch_tpu.data.synthetic import make_observation_table, make_scene
    from niftymatch_tpu.parallel import (
        distributed_bundle_adjust,
        make_keyframe_mesh,
        partition_by_landmark,
        ring_allpairs_match_counts,
    )
    from niftymatch_tpu.parallel.ba import distributed_bundle_adjust_cg
    from niftymatch_tpu.sfm.ba import BAProblem
    from niftymatch_tpu.utils.timing import benchmark

    n_avail = len(jax.devices())
    n_max = min(max_devices or n_avail, n_avail)
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_max]

    rng = np.random.default_rng(0)
    results = {"ring_match": {}, "distributed_ba": {}, "distributed_ba_cg": {}}

    # --- Ring all-pairs matching: fixed global K, N, D ---
    # N = 512 keeps each per-pair GEMM (512 x 512 x 128) large enough
    # that the artifact measures the sweep's compute regime rather than
    # per-step dispatch overhead (VERDICT r3 #2).  Each mesh size is
    # additionally decomposed into compute-only and comm-only phases
    # (``phase=`` isolation in ring_allpairs_match) so the virtual-CPU-
    # mesh numbers are interpretable: the virtual devices SHARE the host
    # cores, so end-to-end wall time cannot scale once the one-device
    # baseline saturates them — the phase rows show what a real ICI ring
    # (async permutes riding dedicated links) would overlap.
    from niftymatch_tpu.parallel.matching import ring_allpairs_match

    K, N, D = 16, 512, 128
    desc_sets = [
        jnp.asarray(rng.normal(size=(K, N, D)).astype(np.float32))
        for _ in range(2)
    ]
    valid = jnp.ones((K, N), bool)
    results["ring_match_phases"] = {}
    for n in sizes:
        if K % n:
            continue
        mesh = make_keyframe_mesh(n)
        f = jax.jit(lambda d: ring_allpairs_match_counts(d, valid, mesh))
        ms = benchmark(lambda d: f(d), [(d,) for d in desc_sets], iters=4)
        results["ring_match"][n] = ms
        phases = {}
        for ph in ("compute", "comm"):
            fp = jax.jit(
                lambda d, _ph=ph: ring_allpairs_match(
                    d, valid, mesh, phase=_ph
                ).counts
            )
            phases[ph] = round(
                benchmark(lambda d: fp(d), [(d,) for d in desc_sets],
                          iters=4), 3)
        results["ring_match_phases"][n] = phases

    # --- Distributed BA: fixed global problem ---
    # 4096 landmarks (vs round-3's 256): the dense solver's per-iteration
    # work is dominated by the per-landmark Schur elimination, which is
    # what shards; at 256 landmarks the replicated O(C^2) psum(S) +
    # dense solve dominated and 8 virtual devices ran 0.76x (VERDICT r3
    # #2 root cause).
    scene = make_scene(num_cams=8, num_landmarks=4096, seed=0)
    obs_uv, obs_cam, obs_lm, valid_o = make_observation_table(scene, seed=0)
    fixed = np.zeros(8, bool)
    fixed[:2] = True
    problem = BAProblem(
        poses=jnp.asarray(scene.poses),
        landmarks=jnp.asarray(scene.landmarks + 0.05),
        intrinsics=jnp.asarray(scene.intrinsics),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid_o),
        pose_fixed=jnp.asarray(fixed),
    )
    cfg = BAConfig(max_iterations=5)
    for n in sizes:
        mesh = make_keyframe_mesh(n)
        sharded = partition_by_landmark(problem, n)
        f = jax.jit(
            lambda lm, uv: distributed_bundle_adjust(
                sharded._replace(landmarks=lm, obs_uv=uv), mesh, cfg
            )[0].poses
        )
        args = [
            (sharded.landmarks + 0.001 * i, sharded.obs_uv)
            for i in range(2)
        ]
        ms = benchmark(f, args, iters=4)
        results["distributed_ba"][n] = ms

    # --- Distributed CG BA: the at-scale solver (config 5) ---
    scene = make_scene(num_cams=32, num_landmarks=4096, seed=1)
    obs_uv, obs_cam, obs_lm, valid_o = make_observation_table(scene, seed=1)
    fixed = np.zeros(32, bool)
    fixed[:2] = True
    problem = BAProblem(
        poses=jnp.asarray(scene.poses),
        landmarks=jnp.asarray(scene.landmarks + 0.05),
        intrinsics=jnp.asarray(scene.intrinsics),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid_o),
        pose_fixed=jnp.asarray(fixed),
    )
    cfg = BAConfig(max_iterations=4, cg_iterations=16)
    for n in sizes:
        mesh = make_keyframe_mesh(n)
        sharded = partition_by_landmark(problem, n)
        f = jax.jit(
            lambda lm, uv: distributed_bundle_adjust_cg(
                sharded._replace(landmarks=lm, obs_uv=uv), mesh, cfg
            )[0].poses
        )
        args = [
            (sharded.landmarks + 0.001 * i, sharded.obs_uv)
            for i in range(2)
        ]
        ms = benchmark(f, args, iters=4)
        results["distributed_ba_cg"][n] = ms

    report = {}
    for name, times in results.items():
        if not times:
            continue
        if name == "ring_match_phases":
            report[name] = {str(n): v for n, v in sorted(times.items())}
            continue
        base = times[min(times)]
        report[name] = {
            str(n): {
                "ms": round(t, 3),
                "speedup": round(base / t, 2),
                "efficiency": round(base / t / (n / min(times)), 3),
            }
            for n, t in sorted(times.items())
        }
    print(json.dumps(report, indent=2))
    out = os.environ.get("SCALING_OUT")
    if out:
        with open(out, "w") as fo:
            json.dump(report, fo, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
