"""Bundle-adjustment tests on synthetic scenes with exact ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from niftymatch_tpu.config import BAConfig
from niftymatch_tpu.data.synthetic import make_observation_table, make_scene
from niftymatch_tpu.sfm.ba import BAProblem, ba_cost, bundle_adjust, project
from niftymatch_tpu.sfm.se3 import se3_exp


def _perturbed_problem(seed=0, pose_noise=0.02, lm_noise=0.05, outlier_frac=0.0):
    scene = make_scene(num_cams=6, num_landmarks=128, seed=seed)
    obs_uv, obs_cam, obs_lm, valid = make_observation_table(
        scene, seed=seed, noise_px=0.0, outlier_frac=outlier_frac
    )
    rng = np.random.default_rng(seed + 7)
    C = scene.poses.shape[0]
    xi = rng.normal(0, pose_noise, size=(C, 6)).astype(np.float32)
    # Monocular BA has a 7-DoF gauge (similarity); fixing two poses pins it.
    xi[0] = 0
    xi[1] = 0
    from niftymatch_tpu.sfm.se3 import se3_compose

    noisy_poses = np.asarray(
        se3_compose(se3_exp(jnp.asarray(xi)), jnp.asarray(scene.poses))
    )
    noisy_lms = scene.landmarks + rng.normal(
        0, lm_noise, size=scene.landmarks.shape
    ).astype(np.float32)
    fixed = np.zeros(C, bool)
    fixed[0] = True
    fixed[1] = True
    problem = BAProblem(
        poses=jnp.asarray(noisy_poses),
        landmarks=jnp.asarray(noisy_lms),
        intrinsics=jnp.asarray(scene.intrinsics),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid),
        pose_fixed=jnp.asarray(fixed),
    )
    return scene, problem


def test_projection_matches_generator():
    scene = make_scene(num_cams=4, num_landmarks=64, seed=3)
    obs_uv, obs_cam, obs_lm, valid = make_observation_table(
        scene, seed=3, noise_px=0.0
    )
    uv, p = project(
        jnp.asarray(scene.poses),
        jnp.asarray(scene.landmarks),
        jnp.asarray(scene.intrinsics),
        jnp.asarray(obs_cam),
        jnp.asarray(obs_lm),
    )
    np.testing.assert_allclose(np.asarray(uv), obs_uv, atol=1e-2)
    assert np.all(np.asarray(p)[:, 2] > 0)


def test_ba_cost_zero_at_truth():
    scene = make_scene(num_cams=4, num_landmarks=64, seed=1)
    obs_uv, obs_cam, obs_lm, valid = make_observation_table(scene, seed=1, noise_px=0.0)
    problem = BAProblem(
        poses=jnp.asarray(scene.poses),
        landmarks=jnp.asarray(scene.landmarks),
        intrinsics=jnp.asarray(scene.intrinsics),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid),
        pose_fixed=jnp.asarray(np.eye(1, 4, dtype=bool)[0]),
    )
    c = float(ba_cost(problem, 2.0))
    assert c < 1e-2


def test_ba_converges_from_perturbation():
    scene, problem = _perturbed_problem(seed=0)
    cfg = BAConfig(max_iterations=15, damping=1e-3)
    solved, stats = jax.jit(lambda p: bundle_adjust(p, cfg))(problem)
    assert float(stats.final_cost) < float(stats.initial_cost) * 1e-3
    # Poses recover ground truth (gauge pose fixed at truth).
    np.testing.assert_allclose(
        np.asarray(solved.poses), scene.poses, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(solved.landmarks), scene.landmarks, atol=5e-3
    )


def test_ba_robust_to_outliers():
    scene, problem = _perturbed_problem(seed=2, outlier_frac=0.1)
    cfg = BAConfig(max_iterations=20, damping=1e-3, huber_delta=1.0)
    solved, stats = bundle_adjust(problem, cfg)
    # With 10% outliers and Huber loss, poses should still land close.
    err = np.abs(np.asarray(solved.poses) - scene.poses)
    assert np.median(err) < 5e-3
    assert float(stats.final_cost) < float(stats.initial_cost)


def test_ba_respects_gauge_fix():
    scene, problem = _perturbed_problem(seed=4)
    solved, _ = bundle_adjust(problem, BAConfig(max_iterations=5))
    np.testing.assert_array_equal(
        np.asarray(solved.poses[0]), np.asarray(problem.poses[0])
    )


def test_ba_ignores_invalid_observations():
    scene, problem = _perturbed_problem(seed=5)
    # Invalidate half the observations; BA should still converge.
    valid = np.asarray(problem.obs_valid).copy()
    valid[:: 2] = False
    problem = problem._replace(obs_valid=jnp.asarray(valid))
    solved, stats = bundle_adjust(problem, BAConfig(max_iterations=15))
    assert float(stats.final_cost) < float(stats.initial_cost) * 1e-2
