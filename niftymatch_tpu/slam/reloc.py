"""Relocalization: recovery after tracking loss (split out of
``system.py``, VERDICT r4 #7).

The reference's whole failure story is "RANSAC returns false"
(``ransac.cu:538-541``); a SLAM session needs actual recovery
(SURVEY.md §5 failure detection).  The mechanism: after ``reloc_after``
consecutive rejected frames, match the lost frame against a candidate
keyframe set — the recent tail plus a stride-sample over the whole map —
in ONE batched dispatch (vmapped ``slam_step``) and re-anchor at the
best successful hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..features import Features
from .frontend import slam_step
from .keyframe import Keyframe


class Relocalizer:
    """Owns the reloc query program, the miss counter, and the backoff
    policy for one :class:`~.system.SlamSystem`."""

    def __init__(self, system):
        self._sys = system
        cfg = system.config
        fx4 = tuple(float(v) for v in cfg.intrinsics)
        self.misses = 0  # consecutive rejected frames

        def _reloc(kf_feats_b, feats, poses_b, world_b, has_b):
            # One batched dispatch: the lost frame vs W recent keyframes.
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
        self._reloc = aot_jit(_reloc, "reloc", salt=repr(cfg))

    def note_miss(self) -> None:
        self.misses += 1

    def reset(self) -> None:
        self.misses = 0

    def due(self) -> bool:
        """Attempt relocalization on this rejected frame?

        Backoff after the first few attempts: during a long dropout
        every garbage frame would otherwise pay a full batched reloc
        query (one tunnel dispatch each — the dominant throughput cost
        under dropout load).  Attempts fire at misses = after,
        after+1, after+2, then every 4th miss, so recovery on the first
        good frame is delayed at most 3 frames.
        """
        m, a = self.misses, self._sys.config.reloc_after
        if m < a:
            return False
        return m <= a + 2 or (m - a) % 4 == 0

    def prewarm(self) -> None:
        """Compile/load the relocalization query program NOW.

        The query otherwise first fires mid-sequence on a rejected frame,
        putting its one-time trace+compile inside whatever the caller is
        timing (ATE r4: dropout gaps cost 10+ s of in-run compile).
        Requires at least one committed keyframe (shapes come from the
        store); a no-op otherwise.  Result is discarded."""
        sys_ = self._sys
        if not sys_.keyframes:
            return
        W2 = 2 * sys_.config.reloc_window
        kf0 = sys_.keyframes[0]
        feats_b = sys_._store.gather([kf0.slot] * W2)
        poses_b = jnp.stack([kf0.pose] * W2)
        ids = np.stack([kf0.track_ids] * W2)
        has = (ids >= 0) & sys_.track_alive[np.maximum(ids, 0)]
        world = sys_.track_positions[np.maximum(ids, 0)]
        feats = jax.tree.map(lambda a: a[0], feats_b)
        jax.block_until_ready(
            self._reloc(
                feats_b, feats, poses_b, jnp.asarray(world),
                jnp.asarray(has),
            )
        )

    def maybe_relocalize(self, feats: Features) -> dict | None:
        """Recovery query after ``reloc_after`` consecutive rejections:
        match the lost frame against the last ``reloc_window`` keyframes in
        ONE batched dispatch (vmapped ``slam_step``), re-anchor at the best
        successful hit, and resume tracking from there.  Returns the frame
        info dict on success, None when recovery also fails."""
        sys_ = self._sys
        cfg = sys_.config
        K = len(sys_.keyframes)
        W = min(K, cfg.reloc_window)
        if W < 1:
            return None
        # Candidate set: the last W keyframes (local recovery) plus up to
        # W stride-sampled over the WHOLE map (global re-localization —
        # after a long dropout the nearest view may be from a much
        # earlier pass, e.g. the start of a closed loop; querying only
        # the recent tail can never recover there).  One batched
        # dispatch either way; the list is padded to the 2W bucket by
        # repeating the last index so the compiled program is reused.
        idx = list(range(K - W, K))
        older = K - W
        if older > 0:
            stride = max(1, older // W)
            sampled = list(range(0, older, stride))[:W]
            idx = sampled + idx
        pad = 2 * cfg.reloc_window - len(idx)
        idx = idx + [K - 1] * max(pad, 0)
        kfs = [sys_.keyframes[i] for i in idx]
        feats_b = sys_._store.gather([k.slot for k in kfs])
        poses_b = jnp.stack([k.pose for k in kfs])
        ids = np.stack([k.track_ids for k in kfs])
        has = (ids >= 0) & sys_.track_alive[np.maximum(ids, 0)]
        world = sys_.track_positions[np.maximum(ids, 0)]
        best, out = self._reloc(
            feats_b, feats, poses_b, jnp.asarray(world), jnp.asarray(has)
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
        anchor = kfs[b]
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
