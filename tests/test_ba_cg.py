"""Matrix-free Schur-PCG bundle adjustment vs. the dense window solver."""

import numpy as np
import jax.numpy as jnp

from niftymatch_tpu.config import BAConfig
from niftymatch_tpu.data.synthetic import make_observation_table, make_scene
from niftymatch_tpu.sfm.ba import BAProblem, ba_cost, bundle_adjust
from niftymatch_tpu.sfm.ba_cg import bundle_adjust_cg
from niftymatch_tpu.sfm.se3 import se3_compose, se3_exp

from test_ba import _perturbed_problem


def test_cg_matches_dense_on_window():
    _, problem = _perturbed_problem(seed=2)
    cfg = BAConfig(max_iterations=8, damping=1e-3, cg_iterations=40)
    dense, stats_d = bundle_adjust(problem, cfg)
    cg, stats_c = bundle_adjust_cg(problem, cfg)
    cd, cc = float(stats_d.final_cost), float(stats_c.final_cost)
    assert cc < float(stats_c.initial_cost)
    # The PCG solve reaches the dense solver's optimum (loose factor for
    # fp32 CG truncation).
    assert cc <= 1.3 * cd + 1e-3


def test_cg_converges_to_ground_truth_midscale():
    scene = make_scene(num_cams=32, num_landmarks=1024, seed=5, radius=8.0)
    obs_uv, obs_cam, obs_lm, valid = make_observation_table(
        scene, seed=5, noise_px=0.0
    )
    rng = np.random.default_rng(9)
    C = scene.poses.shape[0]
    xi = rng.normal(0, 0.01, size=(C, 6)).astype(np.float32)
    xi[:2] = 0
    noisy_poses = np.asarray(
        se3_compose(se3_exp(jnp.asarray(xi)), jnp.asarray(scene.poses))
    )
    noisy_lms = scene.landmarks + rng.normal(
        0, 0.03, scene.landmarks.shape
    ).astype(np.float32)
    fixed = np.zeros(C, bool)
    fixed[:2] = True
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
    cfg = BAConfig(max_iterations=10, damping=1e-3, cg_iterations=50)
    solved, stats = bundle_adjust_cg(problem, cfg)
    assert float(stats.final_cost) < 1e-2 * float(stats.initial_cost)
    pose_err = np.abs(np.asarray(solved.poses) - scene.poses).max()
    assert pose_err < 5e-3


def test_distributed_cg_matches_single_device():
    """Landmark-sharded PCG on the 8-device CPU mesh reaches the same
    optimum as the single-device PCG solver."""
    from niftymatch_tpu.parallel import (
        distributed_bundle_adjust_cg,
        make_keyframe_mesh,
        partition_by_landmark,
    )

    _, problem = _perturbed_problem(seed=3)
    cfg = BAConfig(max_iterations=6, damping=1e-3, cg_iterations=40)
    _, stats_ref = bundle_adjust_cg(problem, cfg)
    mesh = make_keyframe_mesh(8)
    sharded = partition_by_landmark(problem, 8)
    solved, stats = distributed_bundle_adjust_cg(sharded, mesh, cfg)
    ci, cf = float(stats.initial_cost), float(stats.final_cost)
    np.testing.assert_allclose(ci, float(stats_ref.initial_cost), rtol=1e-4)
    assert cf < ci
    assert cf <= 1.3 * float(stats_ref.final_cost) + 1e-3
    # Fixed poses untouched through the sharded path too.
    fixed = np.asarray(problem.pose_fixed)
    np.testing.assert_array_equal(
        np.asarray(solved.poses)[fixed], np.asarray(problem.poses)[fixed]
    )


def test_cg_respects_pose_gauge():
    _, problem = _perturbed_problem(seed=4)
    cfg = BAConfig(max_iterations=4, damping=1e-3, cg_iterations=30)
    solved, _ = bundle_adjust_cg(problem, cfg)
    fixed = np.asarray(problem.pose_fixed)
    np.testing.assert_array_equal(
        np.asarray(solved.poses)[fixed], np.asarray(problem.poses)[fixed]
    )


def test_block_sums_exact_vs_prefix_diff():
    """Adversarial sorted segment sum: a tiny late segment after a huge
    prefix.  The fp32 prefix-difference loses ~eps * prefix absolute
    accuracy, which is why the once-per-LM block sums (Hll/Hcc/b/
    preconditioner) use exact per-segment accumulation instead."""
    import numpy as np
    import jax.numpy as jnp

    from niftymatch_tpu.sfm.ba_cg import (
        _seg_reduce,
        build_obs_layout,
        seg_sum_lm_exact,
    )

    rng = np.random.default_rng(0)
    O = 1 << 17
    vals = rng.uniform(1e3, 1e5, size=(O, 1)).astype(np.float32)
    vals[-16:] = rng.uniform(0.5, 2.0, size=(16, 1)).astype(np.float32)
    lm = np.zeros(O, np.int32)
    lm[-16:] = 1
    cam = np.zeros(O, np.int32)
    lay = build_obs_layout(jnp.asarray(cam), jnp.asarray(lm), 1, 2)
    ref = vals[-16:].astype(np.float64).sum()

    exact = float(seg_sum_lm_exact(jnp.asarray(vals), lay, 2)[1, 0])
    plain = float(
        _seg_reduce(jnp.asarray(vals), lay.ends_lm)[1, 0]
    )
    assert abs(exact - ref) / ref < 1e-5, (exact, ref)
    # The exact path must beat the prefix-difference on this input.
    assert abs(exact - ref) <= abs(plain - ref)
