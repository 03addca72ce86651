"""Relocalization: recovery after tracking loss (split out of
``system.py``, VERDICT r4 #7).

The reference's whole failure story is "RANSAC returns false"
(``ransac.cu:538-541``); a SLAM session needs actual recovery
(SURVEY.md §5 failure detection).  Two-stage design (VERDICT r4 #3 —
the round-4 single-stage query vmapped a FULL slam_step, 1024-iteration
RANSAC included, over 2*reloc_window keyframes on every attempt, so a
dropout of garbage frames ran the map at 1.96 fps):

1. **score**: one batched mutual-match COUNT of the lost frame against
   the candidate keyframes — a pure descriptor GEMM sweep, no RANSAC.
   Garbage frames (sensor dropout) score below ``min_inliers`` matches
   everywhere and fail here, costing one light dispatch.
2. **verify**: full vmapped ``slam_step`` (match + E/H RANSAC +
   triangulation) on only the top-``VERIFY_K`` scored keyframes.

Candidates are the recent ``reloc_window`` tail plus a stride-sample
over the whole map (global relocalization), padded to the fixed
``2 * reloc_window`` bucket so both programs compile once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..features import Features
from .frontend import slam_step
from .keyframe import Keyframe

# Score->verify funnel width: full slam_step runs on this many keyframes
# per successful attempt (fixed so the verify program compiles once).
VERIFY_K = 4


class Relocalizer:
    """Owns the reloc query programs, the miss counter, and the backoff
    policy for one :class:`~.system.SlamSystem`."""

    def __init__(self, system):
        self._sys = system
        cfg = system.config
        fx4 = tuple(float(v) for v in cfg.intrinsics)
        self.misses = 0  # consecutive rejected frames

        def _score(kf_feats_b, feats):
            # Mutual ratio-test match count per candidate keyframe: the
            # necessary condition for slam_step success (inliers are a
            # subset of matches), at GEMM cost only.
            from ..ops.match import mutual_ratio_match

            return jax.vmap(
                lambda kf: jnp.sum((mutual_ratio_match(
                    kf.desc, kf.valid, feats.desc, feats.valid,
                    ambiguity=0.8,
                ) >= 0).astype(jnp.int32))
            )(kf_feats_b)

        def _verify(kf_feats_b, feats, poses_b, world_b, has_b):
            # Full geometry on the scored-in candidates only.
            outs = jax.vmap(
                lambda kf, T, w, h: slam_step(
                    kf, feats, T, w, h, fx4, cfg.ransac
                )
            )(kf_feats_b, poses_b, world_b, has_b)
            score = jnp.where(outs.success, outs.num_inliers, -1)
            best = jnp.argmax(score)
            return best, jax.tree.map(lambda a: a[best], outs)

        from ..utils.aot import aot_jit

        # Reloc queries fire mid-sequence on rejected frames; a plain jit
        # would pay its first trace+compile inside the throughput-critical
        # segment (ATE r4: the hard clip's dropout gaps cost ~13 s of
        # in-run compile).
        self._score = aot_jit(_score, "reloc-score", salt=repr(cfg))
        self._verify = aot_jit(_verify, "reloc-verify", salt=repr(cfg))

    def note_miss(self) -> None:
        self.misses += 1

    def reset(self) -> None:
        self.misses = 0

    def due(self) -> bool:
        """Attempt relocalization on this rejected frame?

        Backoff after the first few attempts: during a long dropout
        every garbage frame would otherwise pay a reloc query (the
        score stage is light but not free).  Attempts fire at misses =
        after, after+1, after+2, then every 4th miss, so recovery on
        the first good frame is delayed at most 3 frames.
        """
        m, a = self.misses, self._sys.config.reloc_after
        if m < a:
            return False
        return m <= a + 2 or (m - a) % 4 == 0

    def _candidate_indices(self) -> list:
        """Recent tail + stride-sample over the whole map, padded to the
        fixed 2*reloc_window bucket (repeat last index) so the compiled
        score program is reused."""
        sys_ = self._sys
        cfg = sys_.config
        K = len(sys_.keyframes)
        W = min(K, cfg.reloc_window)
        idx = list(range(K - W, K))
        older = K - W
        if older > 0:
            stride = max(1, older // W)
            sampled = list(range(0, older, stride))[:W]
            idx = sampled + idx
        pad = 2 * cfg.reloc_window - len(idx)
        return idx + [K - 1] * max(pad, 0)

    def prewarm(self) -> None:
        """Compile/load the relocalization query programs NOW, plus the
        feature-path chunk program the post-reloc tail re-chunk uses.

        These otherwise first fire mid-sequence on a rejected frame,
        putting one-time trace+compiles inside whatever the caller is
        timing (ATE r4: the reloc variant's first tail re-chunk compiled
        the fused chunk-features program in-run).  Requires at least one
        committed keyframe (shapes come from the store); a no-op
        otherwise.  Results are discarded."""
        sys_ = self._sys
        if not sys_.keyframes:
            return
        cfg = sys_.config
        kf0 = sys_.keyframes[0]
        ids0 = np.asarray(kf0.track_ids)
        has0 = (ids0 >= 0) & sys_.track_alive[np.maximum(ids0, 0)]
        world0 = sys_.track_positions[np.maximum(ids0, 0)]

        W2 = 2 * cfg.reloc_window
        feats_b = sys_._store.gather([kf0.slot] * W2)
        feats = jax.tree.map(lambda a: a[0], feats_b)
        jax.block_until_ready(self._score(feats_b, feats))

        feats_v = sys_._store.gather([kf0.slot] * VERIFY_K)
        poses_v = jnp.stack([kf0.pose] * VERIFY_K)
        world_v = jnp.asarray(np.stack([world0] * VERIFY_K))
        has_v = jnp.asarray(np.stack([has0] * VERIFY_K))
        jax.block_until_ready(
            self._verify(feats_v, feats, poses_v, world_v, has_v)
        )

        # Post-reloc tail re-chunking dispatches the FEATURES-path chunk
        # program (the frames-path warmup never compiles it), plus the
        # index-traced take/gather helpers the miss path uses.
        chunk_b = sys_._store.gather([kf0.slot] * cfg.chunk_size)
        jax.block_until_ready(
            sys_._chunk_features(
                chunk_b, feats, kf0.pose,
                jnp.asarray(world0), jnp.asarray(has0),
            )[0].num_inliers
        )
        jax.block_until_ready(
            sys_._take_row(chunk_b, jnp.int32(0)).x
        )
        jax.block_until_ready(
            sys_._gather_rows(
                chunk_b, jnp.zeros((cfg.chunk_size,), jnp.int32)
            ).x
        )

    def maybe_relocalize(self, feats: Features) -> dict | None:
        """Recovery query after ``reloc_after`` consecutive rejections.

        Score the lost frame against the candidate set in ONE light
        batched dispatch; when the best match count clears
        ``min_inliers`` (a necessary condition for verification), run
        the full vmapped ``slam_step`` on the top ``VERIFY_K`` keyframes
        and re-anchor at the best successful hit.  Returns the frame
        info dict on success, None when recovery fails (garbage frames
        exit at the score stage)."""
        sys_ = self._sys
        cfg = sys_.config
        K = len(sys_.keyframes)
        if min(K, cfg.reloc_window) < 1:
            return None
        idx = self._candidate_indices()
        kfs = [sys_.keyframes[i] for i in idx]
        feats_b = sys_._store.gather([k.slot for k in kfs])
        counts = np.asarray(self._score(feats_b, feats))
        if int(counts.max()) < cfg.min_inliers:
            return None  # cheap fail: nothing can verify
        # Top-VERIFY_K distinct keyframes by match count (the padded
        # tail repeats an index; dedup before ranking).
        order = np.argsort(-counts, kind="stable")
        top, seen = [], set()
        for o in order:
            if idx[o] in seen:
                continue
            seen.add(idx[o])
            top.append(int(idx[o]))
            if len(top) == VERIFY_K:
                break
        top += [top[0]] * (VERIFY_K - len(top))
        kfs_v = [sys_.keyframes[i] for i in top]
        feats_v = sys_._store.gather([k.slot for k in kfs_v])
        poses_v = jnp.stack([k.pose for k in kfs_v])
        ids = np.stack([k.track_ids for k in kfs_v])
        has = (ids >= 0) & sys_.track_alive[np.maximum(ids, 0)]
        world = sys_.track_positions[np.maximum(ids, 0)]
        best, out = self._verify(
            feats_v, feats, poses_v, jnp.asarray(world), jnp.asarray(has)
        )
        host = jax.device_get(
            (
                best,
                out.success,
                out.num_inliers,
                out.indices,
                out.inliers,
                out.points_w,
                out.points_valid,
                feats.x,
                feats.y,
            )
        )
        b, ok, n_inl = int(host[0]), bool(host[1]), int(host[2])
        if not ok or n_inl < cfg.min_inliers:
            return None
        anchor = kfs_v[b]
        kf = Keyframe(
            index=len(sys_.keyframes),
            feats=feats,
            pose=out.pose,
            track_ids=np.full((host[7].shape[0],), -1, np.int64),
            host_x=host[7],
            host_y=host[8],
            store=sys_._store,
            slot=sys_._store.stage_single(feats),
        )
        tracked = sys_._propagate_tracks(
            anchor, kf, m_idx=host[3], inl=host[4],
            pts_w=host[5], valid_w=host[6],
        )
        sys_.keyframes.append(kf)
        self.misses = 0
        sys_._frames_since_ba += 1
        return {
            "keyframe": True,
            "num_inliers": n_inl,
            "tracked": tracked,
            "reloc": True,
            "anchor": anchor.index,
        }
