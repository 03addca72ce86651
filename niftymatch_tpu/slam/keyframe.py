"""Keyframe record for the SLAM system (split out of ``system.py``,
VERDICT r4 #7).

The TPU twin of the reference's per-image feature state (``SiftData``,
``siftdata.h:20``): fixed-capacity features living in the device-resident
:class:`~.store.FeatureStore`, plus host bookkeeping (pose, track ids,
coordinate mirrors).
"""

from __future__ import annotations

import jax
import numpy as np

from ..features import Features


class Keyframe:
    """One SLAM keyframe.

    Features live in the system's :class:`~.store.FeatureStore` (device-
    resident, one row per keyframe); ``feats`` materialises the row on
    first access and caches it.  Keyframes created on the per-frame path
    pass ``feats`` directly (already materialised) *and* a store slot so
    the loop-closure sweep can read every keyframe from one buffer.
    ``pose`` is a host (3, 4) array for chunk-produced keyframes (it rides
    the chunk's batched fetch) and a device array on the per-frame /
    BA-output paths; both are valid jit arguments.
    """

    def __init__(
        self,
        index: int,
        feats: Features | None = None,
        pose=None,
        track_ids: np.ndarray = None,
        host_x: np.ndarray = None,
        host_y: np.ndarray = None,
        store=None,
        slot: int | None = None,
    ):
        if feats is None and (store is None or slot is None):
            raise ValueError(
                "Keyframe needs feats or a (store, slot) reference"
            )
        self.index = index
        self._feats = feats
        self._store = store
        self.slot = slot
        self.pose = pose
        self.track_ids = track_ids
        # Host mirrors of the (immutable) keypoint coords — populated
        # lazily or from an already-batched fetch so window assembly never
        # re-crosses the device boundary.
        self.host_x = host_x
        self.host_y = host_y

    @property
    def feats(self) -> Features:
        if self._feats is None:
            self._feats = self._store.get(self.slot)
        return self._feats

    def ensure_host_coords(self):
        if self.host_x is None:
            self.host_x, self.host_y = jax.device_get(
                (self.feats.x, self.feats.y)
            )
