"""Pose-graph optimization + trajectory metric tests."""

import numpy as np
import jax
import jax.numpy as jnp

from niftymatch_tpu.sfm import (
    PoseGraph,
    graph_cost,
    optimize_pose_graph,
    se3_compose,
    se3_exp,
    se3_inverse,
    se3_relative,
)
from niftymatch_tpu.utils import ate_rmse, rpe_rmse, umeyama_alignment


def _chain_graph(rng, n=12, drift=0.03, loop=True):
    """Ground-truth pose chain + noisy odometry edges + exact loop closure."""
    xi_gt = rng.normal(0, 0.3, size=(n, 6)).astype(np.float32)
    poses_gt = [np.asarray(se3_exp(jnp.asarray(xi_gt[0]) * 0))]  # identity
    for i in range(1, n):
        step = se3_exp(jnp.asarray(xi_gt[i] * 0.3))
        poses_gt.append(np.asarray(se3_compose(step, jnp.asarray(poses_gt[-1]))))
    poses_gt = np.stack(poses_gt)

    edges_i, edges_j, edges_T, w = [], [], [], []
    def rel_meas(a, b):
        # Edge (i, j) measures Z = T_i T_j^-1.
        return np.asarray(
            se3_compose(jnp.asarray(poses_gt[a]), se3_inverse(jnp.asarray(poses_gt[b])))
        )

    # Odometry edges with drift noise.
    for i in range(n - 1):
        Z = rel_meas(i + 1, i)
        noise = se3_exp(jnp.asarray(rng.normal(0, drift, 6).astype(np.float32)))
        Z = np.asarray(se3_compose(noise, jnp.asarray(Z)))
        edges_i.append(i + 1)
        edges_j.append(i)
        edges_T.append(Z)
        w.append(1.0)
    if loop:
        # exact loop-closure edges (end->start and midpoint->start)
        for a in (n - 1, n // 2):
            Z = rel_meas(a, 0)
            edges_i.append(a)
            edges_j.append(0)
            edges_T.append(Z)
            w.append(10.0)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    return poses_gt, PoseGraph(
        poses=None,
        edge_i=jnp.asarray(np.asarray(edges_i, np.int32)),
        edge_j=jnp.asarray(np.asarray(edges_j, np.int32)),
        edge_T=jnp.asarray(np.stack(edges_T)),
        edge_weight=jnp.asarray(np.asarray(w, np.float32)),
        edge_valid=jnp.ones(len(w), bool),
        node_fixed=jnp.asarray(fixed),
    )


def _integrate_odometry(graph, n):
    """Dead-reckoned initial poses from the odometry edges."""
    poses = [np.eye(3, 4, dtype=np.float32)]
    for e in range(n - 1):
        Z = np.asarray(graph.edge_T[e])  # T_{i+1} T_i^-1
        poses.append(np.asarray(se3_compose(jnp.asarray(Z), jnp.asarray(poses[-1]))))
    return np.stack(poses)


def test_pose_graph_reduces_cost_and_drift(rng):
    n = 12
    poses_gt, graph = _chain_graph(rng, n=n, drift=0.08)
    init = _integrate_odometry(graph, n)
    graph = graph._replace(poses=jnp.asarray(init))
    out, stats = jax.jit(
        lambda g: optimize_pose_graph(g, iterations=12, damping=1e-4)
    )(graph)
    # Dead-reckoned poses satisfy the odometry edges exactly, so the initial
    # cost is all loop-closure violation; optimization must redistribute it.
    assert float(stats.final_cost) < float(stats.initial_cost) * 0.5

    def positions(T):
        # camera center: -R^T t
        R, t = T[:, :, :3], T[:, :, 3]
        return -np.einsum("nij,ni->nj", R, t)

    ate_before = ate_rmse(positions(init), positions(poses_gt), with_scale=False)
    ate_after = ate_rmse(
        positions(np.asarray(out.poses)), positions(poses_gt), with_scale=False
    )
    assert ate_after < ate_before * 0.8


def test_pose_graph_exact_measurements_zero_cost(rng):
    poses_gt, graph = _chain_graph(rng, n=8, drift=0.0)
    graph = graph._replace(poses=jnp.asarray(poses_gt))
    assert float(graph_cost(graph)) < 1e-6


def test_umeyama_alignment(rng):
    src = rng.normal(size=(50, 3))
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    s_true, t_true = 1.7, np.array([1.0, -2.0, 3.0])
    dst = s_true * src @ R.T + t_true
    s, R_est, t = umeyama_alignment(src, dst)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R_est, R, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ate_rmse_zero_for_aligned(rng):
    traj = rng.normal(size=(30, 3))
    assert ate_rmse(traj, traj) < 1e-12
    # Similarity-transformed copy aligns to ~zero error.
    dst = 2.0 * traj + np.array([5, 5, 5])
    assert ate_rmse(traj, dst) < 1e-9
    assert rpe_rmse(traj, traj) < 1e-12
