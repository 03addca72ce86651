"""Full-trajectory (global) bundle adjustment for the SLAM system
(split out of ``system.py``, VERDICT r4 #7).

The global-BA stage of BASELINE configs 3-5; the per-frame loop only
ever solves the trailing window (``system.run_windowed_ba``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BAConfig
from ..sfm.ba import BAProblem, bundle_adjust


def run_global_ba(
    system,
    ba_config: BAConfig | None = None,
    use_cg: bool | None = None,
    max_landmarks: int | None = None,
) -> bool:
    """Final full-trajectory bundle adjustment over ALL keyframes and
    their tracks.

    Solver selection: the dense Schur solver for small problems, the
    matrix-free Schur-PCG (``sfm.ba_cg``) when the dense (C, L, 6, 3)
    camera-landmark coupling block would be memory-prohibitive.
    Problem shapes are padded to power-of-two buckets so repeated
    finalisation calls reuse the compile.

    This is a finalisation pass, not per-frame work: one dispatch and
    one blocking fetch.  The solve is applied only if it lowers the
    robust cost; returns True when applied."""
    system.flush_ba()
    K = len(system.keyframes)
    if K < 3:
        return False
    cfg = system.config
    ids = np.stack([kf.track_ids for kf in system.keyframes])  # (K, N)
    has = ids >= 0
    if not has.any():
        return False
    counts = np.bincount(ids[has],
                         minlength=system.track_positions.shape[0])
    # Mask tracks culled as outliers during tracking: reintroducing
    # dead tracks with stale positions can locally degrade the solve
    # even when the aggregate robust cost still decreases.
    active = np.nonzero((counts >= 2) & system.track_alive)[0]
    if len(active) < 8:
        return False
    if max_landmarks is not None and len(active) > max_landmarks:
        order = np.argsort(-counts[active], kind="stable")
        active = np.sort(active[order[:max_landmarks]])
    lmap = np.full(system.track_positions.shape[0], -1, np.int64)
    lmap[active] = np.arange(len(active))
    for kf in system.keyframes:
        kf.ensure_host_coords()
    xs = np.stack([kf.host_x for kf in system.keyframes])
    ys = np.stack([kf.host_y for kf in system.keyframes])
    local = np.where(has, lmap[np.maximum(ids, 0)], -1)
    ci, si = np.nonzero(local >= 0)
    O, L = len(ci), len(active)
    if O < 16:
        return False
    O_cap = 1 << int(np.ceil(np.log2(max(O, 1024))))
    L_cap = 1 << int(np.ceil(np.log2(max(L, 256))))
    obs_uv = np.zeros((O_cap, 2), np.float32)
    obs_uv[:O, 0] = xs[ci, si]
    obs_uv[:O, 1] = ys[ci, si]
    obs_cam = np.zeros(O_cap, np.int32)
    obs_cam[:O] = ci
    obs_lm = np.zeros(O_cap, np.int32)
    obs_lm[:O] = local[ci, si]
    valid = np.zeros(O_cap, bool)
    valid[:O] = True
    lms = np.zeros((L_cap, 3), np.float32)
    lms[:L] = system.track_positions[active]
    fixed = np.zeros(K, bool)
    fixed[: min(2, K)] = True  # pin the 7-DoF monocular gauge
    problem = BAProblem(
        poses=jnp.stack([kf.pose for kf in system.keyframes]),
        landmarks=jnp.asarray(lms),
        intrinsics=jnp.asarray(np.asarray(cfg.intrinsics, np.float32)),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_lm=jnp.asarray(obs_lm),
        obs_valid=jnp.asarray(valid),
        pose_fixed=jnp.asarray(fixed),
    )
    ba_cfg = ba_config or dataclasses.replace(cfg.ba, max_iterations=12)
    if use_cg is None:
        # Dense Schur materialises the (C, L, 6, 3) coupling block.
        use_cg = K * L_cap * 18 > (1 << 27)
    # Cache the jitted solver per (solver, config) so the power-of-two
    # O_cap/L_cap bucketing actually reuses compiles across repeated
    # finalisation calls (a fresh jax.jit wrapper re-traces every call).
    jit_key = (bool(use_cg), ba_cfg)
    solve = system._global_ba_jits.get(jit_key)
    if solve is None:
        if use_cg:
            from ..sfm.ba_cg import bundle_adjust_cg as solver
        else:
            solver = bundle_adjust
        solve = jax.jit(partial(solver, config=ba_cfg))
        system._global_ba_jits[jit_key] = solve
    solved, stats = solve(problem)
    poses_h, lms_h, c0, c1 = jax.device_get(
        (solved.poses, solved.landmarks,
         stats.initial_cost, stats.final_cost)
    )
    if not (float(c1) <= float(c0)):
        return False
    # Loop-edge consistency guard (round-5): accepted loop closures are
    # geometric measurements INDEPENDENT of the reprojection problem.  A
    # BA solve that lowers the robust cost while blowing up the loop
    # edges' relative-pose residuals is re-fitting observation noise at
    # the expense of global structure (measured on the reloc-load clip:
    # GBA passed its cost gate while edge consistency rose 0.13 -> 1.01
    # and Sim3 ATE rose 1.54 -> 2.41).  Reject such a solve.
    closer = getattr(system, "closer", None)
    guard = None
    if closer is not None and closer.last_loop_edges is not None:
        before = closer.loop_edge_consistency(
            np.stack([np.asarray(p) for p in jax.device_get(
                [kf.pose for kf in system.keyframes])])
        )
        after = closer.loop_edge_consistency(poses_h[:K])
        # Map-scale-normalised metric (see loop_edge_consistency).
        # Tripping is NOT a verdict on the solve: a monocular global BA
        # routinely refines structure while drifting the trajectory
        # along weakly-constrained gauge directions (measured on every
        # golden-clip variant: edge consistency 1e-7 -> 0.03-0.19,
        # recoverable by re-closure on three of four, catastrophic on
        # the reloc clip at a SMALLER metric value than the standard
        # clip's recoverable one — no solve-time floor separates them).
        # So: accept the solve, demand RECOVERY — re-run loop closure
        # against the refined map; roll the whole round back only if
        # re-closure cannot re-apply an accepted edge set.
        guard = {
            "edge_consistency_before": before,
            "edge_consistency_after": after,
            "tripped": bool(
                before is not None
                and after is not None
                and after > max(3.0 * before, 0.01)
            ),
        }
    if guard is not None and guard["tripped"]:
        snap = closer.snapshot_map()
        for k, kf in enumerate(system.keyframes):
            kf.pose = jnp.asarray(poses_h[k])
        system.track_positions[active] = lms_h[:L]
        reapplied = int(system.close_loops())
        guard["reclosure_edges"] = reapplied
        if reapplied <= 0:
            closer.restore_map(snap)
            guard["rolled_back"] = True
            system.last_gba_guard = guard
            return False
        guard["rolled_back"] = False
        system.last_gba_guard = guard
        return True
    system.last_gba_guard = guard
    for k, kf in enumerate(system.keyframes):
        kf.pose = jnp.asarray(poses_h[k])
    system.track_positions[active] = lms_h[:L]
    return True
