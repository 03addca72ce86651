"""Keyframe monocular SLAM system (BASELINE configs 2-4).

Architecture: the per-frame *geometry* is all jitted device work (detection,
matching, E-RANSAC, triangulation, BA); the *bookkeeping* (keyframe list,
track-ID association, window assembly) is light host-side integer logic —
the same split the reference forces on its clients (host drives, device
computes; SURVEY.md §3.1), but with the device side fused into a handful of
compiled steps.

Pipeline per frame:
  detect -> match vs. last keyframe -> essential RANSAC -> cheirality pose
  -> monocular scale propagation (median depth ratio of re-observed
  landmarks) -> triangulate new landmarks -> track-ID propagation
  -> (periodic) sliding-window BA over tracked observations.

Loop closure: ring all-pairs match counts (``parallel.matching``) propose
candidate pairs; verified closures become pose-graph edges; a final
``optimize_pose_graph`` redistributes drift.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..config import BAConfig, RansacConfig, SiftConfig
from ..features import Features
from ..sfm.ba import BAProblem, bundle_adjust
from ..sfm.se3 import se3_identity
from ..sift import make_detector
from ..ops.match import MatchResult
from .closure import LoopCloser
from .globalba import run_global_ba
from .keyframe import Keyframe
from .reloc import Relocalizer
from .store import FeatureStore
from .frontend import (
    estimate_two_view,
    normalize_points,
    slam_chunk,
    slam_step,
    two_view_from_matches,
)


@dataclasses.dataclass
class SlamConfig:
    width: int = 640
    height: int = 480
    intrinsics: tuple = (525.0, 525.0, 320.0, 240.0)  # fx, fy, cx, cy
    distortion: tuple | None = None  # (k1, k2, k3) radial; None = rectified
    ransac: RansacConfig = dataclasses.field(
        default_factory=lambda: RansacConfig(iterations=1024, inlier_threshold=4.0)
    )
    ba: BAConfig = dataclasses.field(
        default_factory=lambda: BAConfig(max_iterations=8, damping=1e-3)
    )
    min_inliers: int = 15
    ba_window: int = 5          # keyframes per BA window
    ba_every: int = 3           # run windowed BA every k keyframes
    max_tracks: int = 4096      # INITIAL landmark capacity (host arrays grow)
    max_obs: int = 8192         # BA observation capacity (fixed shape)
    ba_landmarks_cap: int = 1024  # window-BA landmark capacity (fixed shape)
    detector_features: int = 1024
    # Loop closure: candidate pairs need >= loop_min_matches ratio-test
    # matches between keyframes >= loop_min_gap apart; verified closures
    # enter the pose graph with loop_weight vs. 1.0 odometry weight.
    loop_min_gap: int = 3
    loop_min_matches: int = 50
    loop_weight: float = 10.0
    # Verification batch/cap: candidates are verified (dual RANSAC) in
    # fixed-size vmapped batches; beyond the cap only the best-matched
    # candidates are kept (vmapping RANSAC over unbounded candidate
    # counts would exhaust HBM).
    loop_verify_batch: int = 32
    max_loop_candidates: int = 96
    # Relocalization: after reloc_after consecutive rejected frames, query
    # the frame against the last reloc_window keyframes in ONE batched
    # dispatch (vmapped slam_step) and re-anchor at the best hit instead of
    # waiting forever on the stale last keyframe.
    reloc_after: int = 2
    reloc_window: int = 6
    # Temporal non-max suppression on loop candidates BEFORE verification
    # (VERDICT r4 #3): within a (nms x nms) window on the (i, j) keyframe
    # grid only the best-matched candidate survives — dense revisits
    # otherwise flood the graph with near-duplicate edges the post-solve
    # gate then has to reject wholesale.  0 disables.
    loop_candidate_nms: int = 2
    # Inlier-weighted top-E edge cap AFTER verification (VERDICT r4 #3):
    # keep only the loop_max_edges best-verified edges in the Sim(3)
    # graph.  More near-duplicate edges add solver cost and gate risk
    # without adding information.  0 disables.
    loop_max_edges: int = 32
    # Landmark anchoring (VERDICT r3 #5): re-observed tracks keep their
    # stored (BA-refined) positions instead of re-triangulating every
    # frame.  Anchoring stops the multiplicative re-chaining of the
    # per-step scale median on feature-dense clips; on SPARSE scenes
    # (few hundred usable features) the anchored positions can outlive
    # windowed-BA consistency and feed back into the scale estimate —
    # set False to chain fresh triangulations instead.
    anchor_landmarks: bool = True
    # Frames per compiled chunk in process_frames: the whole chunk
    # (detection + N sequential SLAM steps) is ONE dispatch + ONE fetch, so
    # tunnel round-trips amortise over chunk_size frames.
    chunk_size: int = 8
    # Initial FeatureStore capacity (keyframe rows).  The store doubles on
    # demand (O(log K) amortised re-traces of the grow/scatter/gather
    # programs); pre-sizing to the expected map size skips those mid-run
    # pauses entirely — the TPU analogue of the reference pre-allocating
    # MAX_DESCRIPTORS-capacity SiftData up front (siftdata.h:15).
    store_capacity: int = 64


class SlamSystem:
    """Host-orchestrated keyframe SLAM over jitted device steps."""

    def __init__(self, config: SlamConfig):
        self.config = config
        sift_cfg = SiftConfig(
            width=config.width,
            height=config.height,
            max_features=config.detector_features,
        )
        self._detect = make_detector(sift_cfg)
        fx4 = tuple(float(v) for v in config.intrinsics)
        if config.distortion is not None:
            from ..ops.warp import undistort_map

            self._undist = undistort_map(
                jnp.asarray(fx4, jnp.float32),
                jnp.asarray(config.distortion, jnp.float32),
                config.height,
                config.width,
            )
        else:
            self._undist = None
        self._two_view = jax.jit(
            lambda fa, fb: estimate_two_view(
                fa, fb, fx4, ransac_config=config.ransac
            )
        )
        self._two_view_from = jax.jit(
            lambda fa, fb, idx: two_view_from_matches(
                fa,
                fb,
                MatchResult(
                    indices=idx,
                    distances=jnp.zeros_like(idx, jnp.float32),
                    ratios=jnp.ones_like(idx, jnp.float32),
                ),
                fx4,
                ransac_config=config.ransac,
            )
        )
        self._step = jax.jit(
            lambda fa, fb, T, world, has: slam_step(
                fa, fb, T, world, has, fx4, config.ransac
            )
        )

        O_cap, L_cap = config.max_obs, config.ba_landmarks_cap

        def _ba_gated(pose_list, buf):
            # The host packs the whole problem into ONE float32 buffer (one
            # tunnel upload instead of six); unpack with static slicing.
            # obs_cam/obs_lm ride as floats — exact below 2^24.  Window
            # poses go in (and come out) as per-keyframe arrays so no eager
            # stack/slice ops bracket the call — everything is one dispatch.
            o2, o3, o4, o5 = 2 * O_cap, 3 * O_cap, 4 * O_cap, 5 * O_cap
            poses = jnp.stack(pose_list)
            C = poses.shape[0]
            p = BAProblem(
                poses=poses,
                landmarks=buf[o5 : o5 + 3 * L_cap].reshape(L_cap, 3),
                intrinsics=jnp.asarray(
                    np.asarray(config.intrinsics, np.float32)
                ),
                obs_uv=buf[:o2].reshape(O_cap, 2),
                obs_cam=buf[o2:o3].astype(jnp.int32),
                obs_lm=buf[o3:o4].astype(jnp.int32),
                obs_valid=buf[o4:o5] > 0.5,
                pose_fixed=buf[o5 + 3 * L_cap : o5 + 3 * L_cap + C] > 0.5,
            )
            # Accept/reject ON DEVICE so the host never has to block on the
            # solver before using its output: rejected solves fall back to
            # the input state inside the compiled program.
            solved, stats = bundle_adjust(p, config.ba)
            improved = stats.final_cost <= stats.initial_cost
            out_poses = jnp.where(improved, solved.poses, p.poses)
            lms = jnp.where(improved, solved.landmarks, p.landmarks)
            return tuple(out_poses[i] for i in range(C)), lms, stats

        self._ba = jax.jit(_ba_gated)

        def _chunk_images(frames, kf_feats, pose, world, has):
            # frames (N, H, W) — ONE upload (uint8 stays uint8 on the wire:
            # 4x less tunnel bandwidth than float32, cast on device);
            # undistort + detect + N sequential SLAM steps fused into one
            # compiled program.
            frames = frames.astype(jnp.float32)
            if self._undist is not None:
                from ..ops.warp import remap

                u, v = self._undist
                frames = jax.vmap(lambda f: remap(f, u, v))(frames)
            from ..sift import detect_and_describe_batch

            feats_b = detect_and_describe_batch(frames, sift_cfg)
            outs, accepts = slam_chunk(
                kf_feats, feats_b, pose, world, has, fx4,
                config.ransac, config.min_inliers,
                anchor_landmarks=config.anchor_landmarks,
            )
            return feats_b, outs, accepts

        from ..utils.aot import aot_jit as _aot_jit

        # The fused chunk programs are the framework's biggest compiles
        # (minutes on an empty compile cache); the AOT export additionally
        # skips their multi-second re-TRACE in every later process.
        self._chunk_images = _aot_jit(
            _chunk_images, "chunk-images", salt=repr(config)
        )
        self._chunk_features = _aot_jit(
            lambda feats_b, kf_feats, pose, world, has: slam_chunk(
                kf_feats, feats_b, pose, world, has, fx4,
                config.ransac, config.min_inliers,
                anchor_landmarks=config.anchor_landmarks,
            ),
            "chunk-features",
            salt=repr(config),
        )
        self._take_frame = jax.jit(
            lambda fb, poses, i: (
                jax.tree.map(lambda a: a[i], fb), poses[i]
            )
        )
        # Index-TRACED row take / gather over a chunk batch.  An eager
        # ``tree.map(lambda a: a[i], fb)`` with a Python int bakes the
        # index into the program — a NEW remote compile (~0.4 s through
        # the tunnel) per distinct gap position; the reloc-load clip
        # spent 9.5 s of its timed segment compiling those one-index
        # slicers (measured by cProfile: 36 in-run from_hlo compiles).
        self._take_row = jax.jit(
            lambda fb, i: jax.tree.map(lambda a: a[i], fb)
        )
        self._gather_rows = jax.jit(
            lambda fb, idx: jax.tree.map(lambda a: a[idx], fb)
        )
        self._store = FeatureStore(
            init_capacity=config.store_capacity,
            chunk_pad=config.chunk_size,
        )

        self._global_ba_jits: dict = {}
        # In-flight windowed-BA landmark update, harvested (one batched
        # fetch) at the start of the next frame.
        self._pending_ba = None
        self.keyframes: List[Keyframe] = []
        # Global track store (host bookkeeping + device positions).
        self._next_track = 0
        self.track_positions = np.zeros((config.max_tracks, 3), np.float32)
        self.track_alive = np.zeros((config.max_tracks,), bool)
        self._frames_since_ba = 0
        # Subsystems: loop closure (candidate sweep / verify / Sim(3)
        # solve / apply, slam/closure.py) and relocalization
        # (slam/reloc.py) own their programs and state.
        self.closer = LoopCloser(self)
        self.reloc = Relocalizer(self)

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def process_frame(self, image) -> dict:
        """Ingest one grayscale frame; returns per-frame status."""
        frame = jnp.asarray(image, jnp.float32)
        if self._undist is not None:
            from ..ops.warp import remap

            frame = remap(frame, self._undist[0], self._undist[1])
        feats = self._detect(frame)
        return self.process_features(feats)

    def process_frames(self, frames, chunk: int | None = None) -> List[dict]:
        """Ingest N grayscale frames with chunked dispatch: ONE compiled
        program (undistort + detect + sequential SLAM scan) and ONE batched
        fetch per ``chunk_size`` frames.  Behind a network tunnel where each
        readback costs a full round-trip, this amortises the per-frame RTT
        of :meth:`process_frame` over the chunk — the lever that takes the
        full SLAM loop past the per-frame tunnel floor."""
        chunk = chunk or self.config.chunk_size
        frames = np.asarray(frames)
        if frames.dtype != np.uint8:
            frames = frames.astype(np.float32, copy=False)
        results: List[dict] = []
        start = 0
        if not self.keyframes:
            f0 = jnp.asarray(frames[0], jnp.float32)
            if self._undist is not None:
                from ..ops.warp import remap

                f0 = remap(f0, self._undist[0], self._undist[1])
            feats0 = self._detect(f0)
            self.keyframes.append(
                Keyframe(
                    index=0,
                    feats=feats0,
                    pose=se3_identity(),
                    track_ids=np.full((feats0.x.shape[0],), -1, np.int64),
                    store=self._store,
                    slot=self._store.stage_single(feats0),
                )
            )
            results.append({"keyframe": True, "num_inliers": 0, "tracked": 0})
            start = 1
        while start < len(frames):
            batch = frames[start : start + chunk]
            n_real = len(batch)
            if n_real < chunk:
                # Pad with repeats of the final frame: padded slots sit at
                # the chunk tail, so their carry updates never feed a real
                # frame, and their outputs are simply not read below.
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], chunk - n_real, axis=0)]
                )
            last = self.keyframes[-1]
            ids = last.track_ids
            has = (ids >= 0) & self.track_alive[np.maximum(ids, 0)]
            world = self.track_positions[np.maximum(ids, 0)]
            feats_b, outs, accepts = self._chunk_images(
                jnp.asarray(batch),
                last.feats,
                last.pose,
                jnp.asarray(world),
                jnp.asarray(has),
            )
            results.extend(
                self._absorb_chunk(feats_b, outs, accepts, n_real)
            )
            start += n_real
        return results

    def process_features_batch(
        self, feats_batch: Features, n_real: int | None = None
    ) -> List[dict]:
        """Chunked ingest of pre-detected features (leading batch axis on
        every ``Features`` field) — the feature-level twin of
        :meth:`process_frames`."""
        n = feats_batch.x.shape[0]
        results: List[dict] = []
        if not self.keyframes:
            feats0, _ = self._take_frame(
                feats_batch, jnp.zeros((n, 3, 4), jnp.float32), 0
            )
            self.keyframes.append(
                Keyframe(
                    index=0,
                    feats=feats0,
                    pose=se3_identity(),
                    track_ids=np.full((feats0.x.shape[0],), -1, np.int64),
                    store=self._store,
                    slot=self._store.stage_single(feats0),
                )
            )
            results.append({"keyframe": True, "num_inliers": 0, "tracked": 0})
            feats_batch = jax.tree.map(lambda a: a[1:], feats_batch)
            n -= 1
            if n == 0:
                return results
        last = self.keyframes[-1]
        ids = last.track_ids
        has = (ids >= 0) & self.track_alive[np.maximum(ids, 0)]
        world = self.track_positions[np.maximum(ids, 0)]
        outs, accepts = self._chunk_features(
            feats_batch,
            last.feats,
            last.pose,
            jnp.asarray(world),
            jnp.asarray(has),
        )
        results.extend(
            self._absorb_chunk(
                feats_batch, outs, accepts, n if n_real is None else n_real
            )
        )
        return results

    def _absorb_chunk(self, feats_b, outs, accepts, n_real: int) -> List[dict]:
        """Host bookkeeping for one processed chunk: ONE batched fetch,
        then per-frame track propagation / keyframe creation (numpy only).
        Accepted frames\' features are committed to the FeatureStore with
        ONE gather+scatter dispatch at the end of the chunk, after which
        nothing references the chunk batch — rejected frames\' descriptors
        are freed immediately."""
        pending, self._pending_ba = self._pending_ba, None
        host = jax.device_get(
            (
                accepts,
                outs.num_inliers,
                outs.indices,
                outs.inliers,
                outs.points_w,
                outs.points_valid,
                feats_b.x,
                feats_b.y,
                outs.pose,
            )
            + ((pending[0],) if pending is not None else ())
        )
        if pending is not None:
            active = pending[2]
            self.track_positions[active] = host[9][: len(active)]
        acc, ninl, m_idx, inl, pts_w, valid_w, xs, ys, poses_h = host[:9]
        results: List[dict] = []
        acc_rows: List[int] = []   # chunk rows accepted as keyframes
        acc_kfs: List[Keyframe] = []

        def commit_rows():
            # Reserve store slots for this chunk\'s accepted keyframes (the
            # device write is one deferred gather+scatter dispatch).
            if acc_rows:
                slots = self._store.stage_chunk(feats_b, acc_rows)
                for kf_, slot_ in zip(acc_kfs, slots):
                    kf_.slot = slot_
                acc_rows.clear()
                acc_kfs.clear()

        for i in range(n_real):
            if not bool(acc[i]):
                self.reloc.note_miss()
                if self.reloc.due():
                    commit_rows()
                    feats_i = self._take_row(feats_b, jnp.int32(i))
                    info = self.reloc.maybe_relocalize(feats_i)
                    if info is not None:
                        results.append(info)
                        # Re-anchoring invalidates the rest of this chunk's
                        # device results (they tracked the pre-reloc
                        # keyframe carry): RE-CHUNK the tail against the
                        # new anchor rather than reprocessing per frame
                        # (VERDICT r3 weak #7 — per-frame fallback
                        # reverted throughput to one tunnel RTT per frame
                        # under reloc load).  The tail is padded back to
                        # the chunk bucket size so the compiled chunk
                        # program is reused, with n_real masking the pads.
                        rest = n_real - (i + 1)
                        if rest > 0:
                            # Index-traced gather (pads repeat the last
                            # real row): ONE compiled program for every
                            # gap position, vs a per-(i, rest) eager
                            # concatenate program (see _gather_rows).
                            bucket = int(feats_b.x.shape[0])
                            idx = np.minimum(
                                np.arange(bucket) + (i + 1), n_real - 1
                            ).astype(np.int32)
                            tail = self._gather_rows(
                                feats_b, jnp.asarray(idx)
                            )
                            results.extend(
                                self.process_features_batch(
                                    tail, n_real=rest
                                )
                            )
                        return results
                results.append(
                    {"keyframe": False, "num_inliers": int(ninl[i]), "tracked": 0}
                )
                continue
            self.reloc.reset()
            last = self.keyframes[-1]
            # No per-frame device work here: the pose rides the batched
            # fetch above (48 bytes), and the feature row is committed to
            # the store in one end-of-chunk dispatch.
            kf = Keyframe(
                index=len(self.keyframes),
                store=self._store,
                slot=-1,  # assigned by commit_rows()
                pose=poses_h[i],
                track_ids=np.full((xs.shape[1],), -1, np.int64),
                host_x=xs[i],
                host_y=ys[i],
            )
            acc_rows.append(i)
            acc_kfs.append(kf)
            tracked = self._propagate_tracks(
                last, kf, m_idx=m_idx[i], inl=inl[i],
                pts_w=pts_w[i], valid_w=valid_w[i],
            )
            self.keyframes.append(kf)
            results.append(
                {
                    "keyframe": True,
                    "num_inliers": int(ninl[i]),
                    "tracked": tracked,
                }
            )
            self._frames_since_ba += 1
        commit_rows()
        if (
            self._frames_since_ba >= self.config.ba_every
            and len(self.keyframes) >= 3
        ):
            self.run_windowed_ba()
            self._frames_since_ba = 0
        return results

    def process_features(self, feats: Features) -> dict:
        """Ingest a pre-detected feature set (e.g. from an external detector
        or the synthetic track generator)."""
        if not self.keyframes:
            kf = Keyframe(
                index=0,
                feats=feats,
                pose=se3_identity(),
                track_ids=np.full((feats.x.shape[0],), -1, np.int64),
                store=self._store,
                slot=self._store.stage_single(feats),
            )
            self.keyframes.append(kf)
            return {"keyframe": True, "num_inliers": 0, "tracked": 0}

        last = self.keyframes[-1]
        # Stored landmark depth context for scale resolution: tiny host->
        # device uploads instead of any mid-frame readback.  (An in-flight
        # BA landmark update is harvested in the same batched fetch below —
        # the scale context may be one refinement behind, which the median
        # estimator absorbs.)
        ids = last.track_ids
        has_track = (ids >= 0) & self.track_alive[np.maximum(ids, 0)]
        world = self.track_positions[np.maximum(ids, 0)]
        out = self._step(
            last.feats, feats, last.pose, jnp.asarray(world), jnp.asarray(has_track)
        )
        pending, self._pending_ba = self._pending_ba, None
        # ONE device dispatch above, ONE host round-trip here — every extra
        # fetch through the accelerator tunnel is a full network RTT.
        host = jax.device_get(
            (
                out.success,
                out.num_inliers,
                out.indices,
                out.inliers,
                out.points_w,
                out.points_valid,
                feats.x,
                feats.y,
            )
            + ((pending[0],) if pending is not None else ())
        )
        if pending is not None:
            active = pending[2]
            self.track_positions[active] = host[8][: len(active)]
        success, num_inl = bool(host[0]), int(host[1])
        if not success or num_inl < self.config.min_inliers:
            self.reloc.note_miss()
            if self.reloc.due():
                info = self.reloc.maybe_relocalize(feats)
                if info is not None:
                    return info
            return {"keyframe": False, "num_inliers": num_inl, "tracked": 0}
        self.reloc.reset()

        kf = Keyframe(
            index=len(self.keyframes),
            feats=feats,
            pose=out.pose,
            track_ids=np.full((feats.x.shape[0],), -1, np.int64),
            host_x=host[6],
            host_y=host[7],
            store=self._store,
            slot=self._store.stage_single(feats),
        )
        tracked = self._propagate_tracks(
            last, kf, m_idx=host[2], inl=host[3], pts_w=host[4], valid_w=host[5]
        )
        self.keyframes.append(kf)

        self._frames_since_ba += 1
        if self._frames_since_ba >= self.config.ba_every and len(self.keyframes) >= 3:
            self.run_windowed_ba()
            self._frames_since_ba = 0
        return {"keyframe": True, "num_inliers": num_inl, "tracked": tracked}

    def trajectory(self) -> np.ndarray:
        """(K, 3) camera centers of all keyframes.

        Host math on one batched fetch: a device ``jnp.stack`` +
        ``camera_center`` here compiles a fresh program for every
        keyframe COUNT — ~3.9 s of in-run remote compile measured on
        the reloc-load clip when this ran at the end of a timed
        segment."""
        poses = self.poses()
        R, t = poses[:, :, :3], poses[:, :, 3]
        return -np.einsum("kji,kj->ki", R, t)

    def poses(self) -> np.ndarray:
        self.flush_ba()
        return np.stack([
            np.asarray(p) for p in
            jax.device_get([kf.pose for kf in self.keyframes])
        ])

    # ------------------------------------------------------------------
    # Relocalization (slam/reloc.py) — thin delegation for API stability
    # ------------------------------------------------------------------
    def prewarm_reloc(self):
        """Compile/load the relocalization query program now (see
        :meth:`.reloc.Relocalizer.prewarm`)."""
        self.reloc.prewarm()

    def _maybe_relocalize(self, feats: Features) -> dict | None:
        return self.reloc.maybe_relocalize(feats)

    def _ensure_track_capacity(self, need: int):
        """Double the host-side track arrays when the id space fills up.
        Track state is host numpy (positions/alive) — device programs only
        ever see per-keyframe gathers — so growth is free of recompiles.
        Without this, long sequences silently stop minting tracks once
        ``max_tracks`` ids are spent and the back half of the trajectory
        loses all BA/scale constraints."""
        cap = self.track_positions.shape[0]
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        grow = cap - self.track_positions.shape[0]
        self.track_positions = np.concatenate(
            [self.track_positions, np.zeros((grow, 3), np.float32)]
        )
        self.track_alive = np.concatenate(
            [self.track_alive, np.zeros((grow,), bool)]
        )

    def _propagate_tracks(
        self, last: Keyframe, kf: Keyframe, *, m_idx, inl, pts_w, valid_w
    ) -> int:
        """Assign track IDs to the new keyframe's slots from the fused
        step's (already-fetched) triangulation.  Vectorised host
        bookkeeping — no device access at all.

        Scale anchoring (VERDICT r3 #5): an EXISTING track keeps its
        stored (BA-refined) world position — only newly-minted tracks
        take this frame's triangulation.  Overwriting re-observed
        landmarks with the current frame's unit-baseline re-triangulation
        re-chained the monocular scale frame-to-frame, compounding the
        per-step median bias into the 2.5-7x drift ATE_r03 recorded
        (sim3_scale 0.39/0.15); anchoring to the oldest surviving
        landmarks stops the chain."""
        anchor = self.config.anchor_landmarks
        has_old = last.track_ids >= 0
        keep_mask = (valid_w | has_old) if anchor else valid_w
        sel = np.nonzero(inl & (m_idx >= 0) & keep_mask)[0]
        if sel.size == 0:
            return 0
        tids = last.track_ids[sel].copy()
        # Mint new track ids for slots without one (capacity-bounded).
        need = np.nonzero(tids < 0)[0]
        self._ensure_track_capacity(self._next_track + len(need))
        n_new = min(
            len(need), self.track_positions.shape[0] - self._next_track
        )
        minted = np.zeros_like(tids, bool)
        if n_new > 0:
            new_ids = np.arange(
                self._next_track, self._next_track + n_new, dtype=np.int64
            )
            tids[need[:n_new]] = new_ids
            minted[need[:n_new]] = True
            self._next_track += n_new
        keep = tids >= 0
        sel = sel[keep]
        tids = tids[keep]
        minted = minted[keep]
        last.track_ids[sel] = tids
        kf.track_ids[m_idx[sel]] = tids
        if anchor:
            self.track_positions[tids[minted]] = pts_w[sel[minted]]
        else:
            fresh = valid_w[sel]
            self.track_positions[tids[fresh]] = pts_w[sel[fresh]]
        self.track_alive[tids] = True
        return int(sel.size)

    def _window_problem(self, window: List[Keyframe]):
        """Assemble a FIXED-CAPACITY BAProblem from a keyframe window.

        All shapes depend only on (window size, ba_landmarks_cap, max_obs),
        so the jitted solver compiles once per window size instead of once
        per frame (varying observation counts were recompiling BA every
        call — 3.3 s/keyframe).  Assembly is vectorised numpy."""
        C = len(window)
        cfg = self.config
        ids = np.stack([kf.track_ids for kf in window])  # (C, N)
        has = ids >= 0
        if not has.any():
            return None, None, None
        counts = np.bincount(ids[has], minlength=self.track_positions.shape[0])
        active_mask = counts >= 2
        active = np.nonzero(active_mask)[0]
        if len(active) < 8:
            return None, None, None
        if len(active) > cfg.ba_landmarks_cap:
            # Keep the most-observed tracks.
            order = np.argsort(-counts[active], kind="stable")
            active = np.sort(active[order[: cfg.ba_landmarks_cap]])
        L_cap = cfg.ba_landmarks_cap
        lmap = np.full(self.track_positions.shape[0], -1, np.int64)
        lmap[active] = np.arange(len(active))

        for kf in window:
            kf.ensure_host_coords()
        xs = np.stack([kf.host_x for kf in window])  # (C, N)
        ys = np.stack([kf.host_y for kf in window])
        local = np.where(has, lmap[np.maximum(ids, 0)], -1)       # (C, N)
        ci, si = np.nonzero(local >= 0)
        O = len(ci)
        if O < 16:
            return None, None, None
        O_cap = cfg.max_obs
        if O > O_cap:
            ci, si = ci[:O_cap], si[:O_cap]
            O = O_cap
        # Pack everything into one float32 buffer = ONE host->device upload
        # (each separate upload through the accelerator tunnel pays a full
        # round-trip).  Layout: uv | cam | lm | valid | landmarks | fixed.
        buf = np.zeros(5 * O_cap + 3 * L_cap + C, np.float32)
        uv = buf[: 2 * O_cap].reshape(O_cap, 2)
        uv[:O, 0] = xs[ci, si]
        uv[:O, 1] = ys[ci, si]
        buf[2 * O_cap : 2 * O_cap + O] = ci
        buf[3 * O_cap : 3 * O_cap + O] = local[ci, si]
        buf[4 * O_cap : 4 * O_cap + O] = 1.0
        lms = buf[5 * O_cap : 5 * O_cap + 3 * L_cap].reshape(L_cap, 3)
        lms[: len(active)] = self.track_positions[active]
        fixed = buf[5 * O_cap + 3 * L_cap :]
        fixed[0] = 1.0
        if C > 1:
            fixed[1] = 1.0  # pin the 7-DoF monocular gauge
        poses = tuple(kf.pose for kf in window)
        return (poses, jnp.asarray(buf)), active, window

    # ------------------------------------------------------------------
    # Loop closure / finalisation (slam/closure.py, slam/globalba.py) —
    # thin delegation for API stability
    # ------------------------------------------------------------------
    @property
    def last_closure_stages(self) -> dict:
        """Per-stage timings + diagnostics of the most recent
        :meth:`close_loops` call."""
        return self.closer.last_stages

    def match_keyframes(self, pairs) -> np.ndarray:
        """Mutual ratio-test match indices for keyframe index pairs
        (see :meth:`.closure.LoopCloser.match_keyframes`)."""
        return self.closer.match_keyframes(pairs)

    def detect_loop_candidates(self, return_matches: bool = False):
        """Candidate loop pairs from the all-pairs sweep (see
        :meth:`.closure.LoopCloser.detect_candidates`)."""
        return self.closer.detect_candidates(return_matches)

    def close_loops(self) -> int:
        """One loop-closure pass (see
        :meth:`.closure.LoopCloser.close_loops`)."""
        return self.closer.close_loops()

    def finalize(self, rounds: int = 3) -> dict:
        """Monotone closure <-> global-BA alternation (see
        :meth:`.closure.LoopCloser.finalize`)."""
        return self.closer.finalize(rounds)

    def global_ba(
        self,
        ba_config: BAConfig | None = None,
        use_cg: bool | None = None,
        max_landmarks: int | None = None,
    ) -> bool:
        """Full-trajectory bundle adjustment (see
        :func:`.globalba.run_global_ba`)."""
        return run_global_ba(
            self, ba_config=ba_config, use_cg=use_cg,
            max_landmarks=max_landmarks,
        )

    def run_windowed_ba(self, block: bool = False) -> bool:
        """Optimize the last ``ba_window`` keyframes + their tracks.

        Fire-and-forget: the solve is dispatched, poses are applied as
        device-side slices of the (device-gated) result, and the landmark
        readback rides the NEXT frame's batched fetch — a BA frame costs
        one tunnel round-trip like any other frame.  Pass ``block=True``
        (or call :meth:`flush_ba`) to harvest immediately."""
        self.flush_ba()  # at most one solve in flight; seeds must be current
        window = self.keyframes[-self.config.ba_window :]
        problem, active, window = self._window_problem(window)
        if problem is None:
            return False
        poses, lms, stats = self._ba(*problem)
        for ci, kf in enumerate(window):
            kf.pose = poses[ci]  # per-kf jit output, no transfer
        self._pending_ba = (lms, stats, active)
        if block:
            self.flush_ba()
        return True

    def flush_ba(self) -> None:
        """Harvest an in-flight windowed-BA landmark update, if any."""
        if self._pending_ba is None:
            return
        lms, stats, active = self._pending_ba
        self._pending_ba = None
        self.track_positions[active] = jax.device_get(lms)[: len(active)]
