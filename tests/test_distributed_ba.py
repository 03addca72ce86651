"""Distributed (landmark-sharded, psum-reduced) BA vs the single-device
solver on the 8-device CPU mesh."""

import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.config import BAConfig
from niftymatch_tpu.data.synthetic import make_observation_table, make_scene
from niftymatch_tpu.parallel import make_keyframe_mesh
from niftymatch_tpu.parallel.ba import (
    distributed_bundle_adjust,
    partition_by_landmark,
)
from niftymatch_tpu.sfm.ba import BAProblem, bundle_adjust
from niftymatch_tpu.sfm.se3 import se3_compose, se3_exp


def _problem(seed=0):
    scene = make_scene(num_cams=6, num_landmarks=96, seed=seed)
    obs_uv, obs_cam, obs_lm, valid = make_observation_table(
        scene, seed=seed, noise_px=0.0
    )
    rng = np.random.default_rng(seed + 7)
    C = scene.poses.shape[0]
    xi = rng.normal(0, 0.02, size=(C, 6)).astype(np.float32)
    xi[0] = 0
    xi[1] = 0
    noisy_poses = np.asarray(
        se3_compose(se3_exp(jnp.asarray(xi)), jnp.asarray(scene.poses))
    )
    noisy_lms = scene.landmarks + rng.normal(
        0, 0.05, size=scene.landmarks.shape
    ).astype(np.float32)
    fixed = np.zeros(C, bool)
    fixed[:2] = True
    return scene, BAProblem(
        poses=jnp.asarray(noisy_poses),
        landmarks=jnp.asarray(noisy_lms),
        intrinsics=jnp.asarray(scene.intrinsics),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid),
        pose_fixed=jnp.asarray(fixed),
    )


def test_partition_preserves_observations():
    scene, problem = _problem()
    sharded = partition_by_landmark(problem, 8)
    # Every valid global observation appears exactly once in the shards.
    assert int(sharded.obs_valid.sum()) == int(problem.obs_valid.sum())
    # Landmark padding: divisible by shards.
    assert sharded.landmarks.shape[0] % 8 == 0


def test_distributed_matches_single_device():
    scene, problem = _problem(seed=1)
    cfg = BAConfig(max_iterations=10, damping=1e-3)
    solved_ref, stats_ref = bundle_adjust(problem, cfg)

    mesh = make_keyframe_mesh(8)
    sharded = partition_by_landmark(problem, 8)
    solved, stats = distributed_bundle_adjust(sharded, mesh, cfg)

    assert float(stats.final_cost) < float(stats.initial_cost) * 1e-2
    # Distributed and single-device converge to the same poses.
    np.testing.assert_allclose(
        np.asarray(solved.poses), np.asarray(solved_ref.poses), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(solved.poses), scene.poses, atol=5e-3
    )


def test_distributed_converges_to_ground_truth():
    scene, problem = _problem(seed=2)
    mesh = make_keyframe_mesh(4)
    sharded = partition_by_landmark(problem, 4)
    solved, stats = distributed_bundle_adjust(
        sharded, mesh, BAConfig(max_iterations=12, damping=1e-3)
    )
    np.testing.assert_allclose(np.asarray(solved.poses), scene.poses, atol=5e-3)
    # Landmarks (unpadded range) recover too.
    L = scene.landmarks.shape[0]
    np.testing.assert_allclose(
        np.asarray(solved.landmarks)[:L], scene.landmarks, atol=2e-2
    )
