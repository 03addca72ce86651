"""TUM trajectory IO round-trip tests (no dataset required)."""

import numpy as np

from niftymatch_tpu.data.tum import (
    Trajectory,
    associate,
    poses_to_trajectory,
    quaternion_to_rotation,
    read_trajectory,
    rotation_to_quaternion,
    write_trajectory,
)


def test_quaternion_roundtrip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[3] < 0:
            q = -q
        R = quaternion_to_rotation(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        q2 = rotation_to_quaternion(R)
        np.testing.assert_allclose(q2, q, atol=1e-9)


def test_trajectory_file_roundtrip(tmp_path, rng):
    n = 10
    traj = Trajectory(
        timestamps=np.arange(n, dtype=np.float64) * 0.1 + 1e9,
        positions=rng.normal(size=(n, 3)),
        quaternions=np.tile([0.0, 0.0, 0.0, 1.0], (n, 1)),
    )
    p = str(tmp_path / "traj.txt")
    write_trajectory(p, traj)
    back = read_trajectory(p)
    np.testing.assert_allclose(back.timestamps, traj.timestamps, atol=1e-6)
    np.testing.assert_allclose(back.positions, traj.positions, atol=1e-5)


def test_poses_to_trajectory_centers(rng):
    # Identity pose -> center at origin; translation-only pose -> -t.
    poses = np.tile(np.eye(3, 4, dtype=np.float64), (2, 1, 1))
    poses[1, :, 3] = [1.0, 2.0, 3.0]
    traj = poses_to_trajectory(poses)
    np.testing.assert_allclose(traj.positions[0], [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(traj.positions[1], [-1, -2, -3], atol=1e-12)


def test_associate():
    ta = np.array([0.0, 0.1, 0.2, 0.35])
    tb = np.array([0.005, 0.11, 0.32])
    ia, ib = associate(ta, tb, max_dt=0.02)
    np.testing.assert_array_equal(ia, [0, 1])
    np.testing.assert_array_equal(ib, [0, 1])
