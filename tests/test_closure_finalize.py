"""Loop-closure finalisation invariants (VERDICT r4 #2/#3/#7).

The closure pipeline lives in ``slam/closure.py`` with unit-testable
seams; these tests cover the new guarantees:

* ``finalize`` is monotone by construction — map snapshots + rollback
  when the re-detected graph's initial cost rises;
* snapshot/restore round-trips the exact map state;
* temporal candidate NMS suppresses dense-revisit duplicates BEFORE
  verification (fewer, better edges instead of post-hoc gate rejection).
"""

import types

import numpy as np
import jax.numpy as jnp
import pytest

from niftymatch_tpu.config import RansacConfig
from niftymatch_tpu.slam.closure import LoopCloser
from niftymatch_tpu.slam import SlamConfig, SlamSystem
from niftymatch_tpu.utils import ate_rmse


def test_select_candidates_nms_and_cap():
    """Temporal NMS keeps only the best-matched candidate per (nms x nms)
    window on the (i, j) grid; the cap keeps the best-matched overall."""
    cfg = SlamConfig(loop_candidate_nms=2, max_loop_candidates=96)
    stub = types.SimpleNamespace(config=cfg)
    closer = types.SimpleNamespace(_sys=stub)
    sel = LoopCloser.select_candidates
    # A dense revisit: frames 50..55 all match frames 0..5 — 36 nearly
    # duplicate candidates; counts peak at (52, 2).
    cands = [
        (i, j, 100 - abs(i - 52) * 10 - abs(j - 2) * 10)
        for i in range(50, 56)
        for j in range(0, 6)
    ]
    kept = sel(closer, cands)
    # The peak survives; its 2-neighbourhood is suppressed.
    assert (52, 2, 100) in kept
    assert len(kept) < len(cands)
    for a, b, _ in kept:
        others = [k for k in kept if k[:2] != (a, b)]
        assert all(
            abs(a - oa) > 2 or abs(b - ob) > 2 for oa, ob, _ in others
        ), kept
    # nms=0 disables suppression entirely.
    cfg0 = SlamConfig(loop_candidate_nms=0, max_loop_candidates=96)
    closer0 = types.SimpleNamespace(_sys=types.SimpleNamespace(config=cfg0))
    assert sel(closer0, cands) == sorted(cands)
    # The cap keeps the best-matched candidates.
    cfg_cap = SlamConfig(loop_candidate_nms=0, max_loop_candidates=5)
    closer_cap = types.SimpleNamespace(
        _sys=types.SimpleNamespace(config=cfg_cap)
    )
    kept_cap = sel(closer_cap, cands)
    assert len(kept_cap) == 5
    assert min(c[2] for c in kept_cap) >= sorted(
        (c[2] for c in cands), reverse=True
    )[4]


def _loop_slam(K=12, noise_px=1.0, seed=1):
    from niftymatch_tpu.data import make_scene
    from niftymatch_tpu.data.synthetic import make_feature_sequence

    scene = make_scene(
        num_cams=K, num_landmarks=800, seed=seed, radius=6.0,
        width=640, height=480, arc=(0.0, 2 * np.pi * (K - 1) / K),
    )
    feats = make_feature_sequence(
        scene, capacity=384, noise_px=noise_px, seed=seed
    )
    cfg = SlamConfig(
        width=640, height=480,
        intrinsics=tuple(float(v) for v in scene.intrinsics),
        ransac=RansacConfig(iterations=512, inlier_threshold=4.0),
        detector_features=384, ba_every=10_000,
        loop_min_gap=4, loop_min_matches=40,
    )
    slam = SlamSystem(cfg)
    for f in feats:
        slam.process_features(f)
    return scene, slam


@pytest.mark.slow
def test_snapshot_restore_roundtrip():
    from niftymatch_tpu.sfm.se3 import camera_center

    scene, slam = _loop_slam()
    snap = slam.closer.snapshot_map()
    poses_before = slam.poses()
    tp_before = slam.track_positions.copy()
    # Wreck the map.
    for kf in slam.keyframes:
        kf.pose = jnp.asarray(np.asarray(kf.pose) * 2.0 + 1.0)
    slam.track_positions[:] = -7.0
    slam.track_alive[:] = False
    slam.closer.restore_map(snap)
    np.testing.assert_allclose(slam.poses(), poses_before, atol=1e-7)
    np.testing.assert_allclose(slam.track_positions, tp_before, atol=1e-7)
    assert slam.track_alive.any()


@pytest.mark.slow
def test_finalize_never_worse():
    """After an accepted closure, finalize must not degrade the map:
    final Sim(3)-aligned ATE <= post-closure ATE (small tolerance).
    Regression for VERDICT r4 weak #2 (hard variant 0.275 -> 0.594 over
    blind extra rounds; reloc variant final worse than pre-closure)."""
    from niftymatch_tpu.sfm.se3 import camera_center

    scene, slam = _loop_slam(noise_px=1.0, seed=1)
    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    pre = ate_rmse(slam.trajectory(), gt, align=True, with_scale=True)
    n = slam.close_loops()
    assert n > 0
    slam.global_ba()
    post = ate_rmse(slam.trajectory(), gt, align=True, with_scale=True)
    fin = slam.finalize(rounds=3)
    final = ate_rmse(slam.trajectory(), gt, align=True, with_scale=True)
    assert fin["rounds"]
    # Monotone: never worse than the state finalize started from.
    assert final <= post * 1.05 + 1e-9, (pre, post, final, fin)


def test_loop_edge_consistency_metric():
    """loop_edge_consistency is ~0 for edges measured from the poses
    themselves and grows when a pose is perturbed."""
    from niftymatch_tpu.slam.closure import LoopCloser

    rng = np.random.default_rng(0)
    K = 6
    # Random valid SE(3) poses.
    poses = []
    for _ in range(K):
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        poses.append(np.concatenate([q, rng.normal(size=(3, 1))], 1))
    poses = np.stack(poses).astype(np.float32)

    def measure(i, j):
        Ti, Tj = poses[i], poses[j]
        R = Ti[:, :3] @ Tj[:, :3].T
        t = Ti[:, 3] - R @ Tj[:, 3]
        return np.concatenate([R, t[:, None]], 1).astype(np.float32)

    closer = types.SimpleNamespace(
        last_loop_edges=([5, 4], [0, 1], [1.0, 1.0],
                         [measure(5, 0), measure(4, 1)]),
    )
    consistent = LoopCloser.loop_edge_consistency(closer, poses)
    assert consistent < 1e-9, consistent
    bad = poses.copy()
    bad[5, :, 3] += 2.0
    inconsistent = LoopCloser.loop_edge_consistency(closer, bad)
    assert inconsistent > 0.1, inconsistent
    # No applied closure -> None.
    closer_none = types.SimpleNamespace(last_loop_edges=None)
    assert LoopCloser.loop_edge_consistency(closer_none, poses) is None


def test_loop_edge_consistency_separates_benign_from_catastrophic():
    """The guard floor (0.01, slam/globalba.py) must separate a benign
    global-BA nudge (~1 % of the map scale) from map-scale corruption:
    the metric is normalised by camera-centre spread, NOT the edge's own
    near-zero loop baseline (which rejected every GBA when tried)."""
    from niftymatch_tpu.slam.closure import LoopCloser

    rng = np.random.default_rng(3)
    K = 24
    # Circular trajectory, radius 6 (map scale ~ 6): loop edge joins the
    # spatially-adjacent endpoints, so its baseline is tiny (~1.6).
    poses = []
    for k in range(K):
        th = 2 * np.pi * k / K
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        center = np.array([6.0 * c, 6.0 * s, 0.0])
        t = -R @ center
        poses.append(np.concatenate([R, t[:, None]], 1))
    poses = np.stack(poses).astype(np.float64)

    def measure(i, j):
        Ti, Tj = poses[i], poses[j]
        R = Ti[:, :3] @ Tj[:, :3].T
        t = Ti[:, 3] - R @ Tj[:, 3]
        return np.concatenate([R, t[:, None]], 1)

    closer = types.SimpleNamespace(
        last_loop_edges=([K - 1], [0], [1.0], [measure(K - 1, 0)]),
    )
    # Benign: jitter every pose translation by ~1 % of the map scale.
    benign = poses.copy()
    benign[:, :, 3] += rng.normal(scale=0.06, size=(K, 3))
    m_benign = LoopCloser.loop_edge_consistency(closer, benign)
    assert m_benign < 0.01, m_benign
    # Catastrophic: drag the loop endpoint by half the map scale (the
    # r4 reloc failure moved endpoints by ~1-2 units on a ~6 map).
    bad = poses.copy()
    bad[K - 1, :, 3] += 3.0
    m_bad = LoopCloser.loop_edge_consistency(closer, bad)
    assert m_bad > 0.01, m_bad
    # Scale invariance: the metric is a fraction of the map, so a global
    # rescale of poses + edges leaves it unchanged.
    closer2x = types.SimpleNamespace(
        last_loop_edges=([K - 1], [0], [1.0],
                         [np.concatenate([measure(K - 1, 0)[:, :3],
                                          2 * measure(K - 1, 0)[:, 3:]], 1)]),
    )
    bad2x = bad.copy()
    bad2x[:, :, 3] *= 2.0
    m_bad2x = LoopCloser.loop_edge_consistency(closer2x, bad2x)
    np.testing.assert_allclose(m_bad2x, m_bad, rtol=1e-6)


@pytest.mark.slow
def test_global_ba_guard_keeps_consistent_solves():
    """With an APPLIED closure on record, a benign global BA must still
    be accepted (the guard only rejects solves that blow up the loop
    edges), and close_loops must record last_loop_edges."""
    scene, slam = _loop_slam(noise_px=1.0, seed=1)
    n = slam.close_loops()
    assert n > 0
    assert slam.closer.last_loop_edges is not None
    assert len(slam.closer.last_loop_edges[0]) == n
    before = slam.closer.loop_edge_consistency(slam.poses())
    assert before is not None and np.isfinite(before)
    applied = slam.global_ba()
    # On this clean synthetic clip BA refines without damaging the
    # edges: the guard must not reject it.
    assert applied
    after = slam.closer.loop_edge_consistency(slam.poses())
    assert after <= max(3.0 * before, 0.01)
