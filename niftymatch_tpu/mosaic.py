"""Mosaic builder: the reference's client application loop as a library.

The reference ships the mosaicking *ingredients* — SIFT front-end, RANSAC
homography, undistort/warp/blend kernels — and leaves the composition loop
to the client (SURVEY.md §3.4: undistort -> detect -> match -> RANSAC ->
``resample_perspective_transform`` -> ``transform_blend``).  This module is
that loop: sequential frames are registered by homography chaining into a
canvas with weighted running-average blending.

All device work (detection, matching, RANSAC, warping, blending) is jitted;
the Python layer only chains 3x3 matrices.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .config import RansacConfig, SiftConfig
from .geometry.linalg import inv3x3
from .geometry.ransac import align_points, ransac
from .ops.match import mutual_matches
from .ops.warp import blend_into_mosaic, remap, undistort_map
from .sift import make_detector, match_pair


@dataclasses.dataclass
class MosaicConfig:
    width: int                      # frame width
    height: int                     # frame height
    canvas_width: int = 2048
    canvas_height: int = 1536
    # Canvas anchor: where frame 0's origin lands on the canvas.
    anchor_x: float | None = None   # default: centered
    anchor_y: float | None = None
    ransac: RansacConfig = dataclasses.field(
        default_factory=lambda: RansacConfig(iterations=1024, inlier_threshold=9.0)
    )
    ambiguity: float = 0.7
    min_inliers: int = 12
    detector_features: int = 1024
    # Optional undistortion (reference: cuda_undistort + resample_undistort)
    camera_matrix: tuple | None = None   # (fx, fy, cx, cy)
    distortion: tuple | None = None      # (k1, k2, k3)
    # Per-pixel blend weight map for incoming frames; default center-weighted
    # (plain ones reproduce straight running average).
    center_weighted: bool = True


class MosaicBuilder:
    """Sequential homography mosaicking (the GIFT-Surg use case)."""

    def __init__(self, config: MosaicConfig):
        self.config = config
        self._detect = make_detector(
            SiftConfig(
                width=config.width,
                height=config.height,
                max_features=config.detector_features,
            )
        )
        h, w = config.height, config.width
        ch, cw = config.canvas_height, config.canvas_width
        self.canvas = jnp.zeros((ch, cw), jnp.float32)
        self.weights = jnp.zeros((ch, cw), jnp.float32)
        ax = config.anchor_x if config.anchor_x is not None else (cw - w) / 2.0
        ay = config.anchor_y if config.anchor_y is not None else (ch - h) / 2.0
        # H mapping current frame coords -> canvas coords; frame 0 anchors.
        self._H_canvas = jnp.asarray(
            [[1.0, 0.0, ax], [0.0, 1.0, ay], [0.0, 0.0, 1.0]], jnp.float32
        )
        self._prev_feats = None
        self.num_registered = 0
        self.num_failed = 0

        if config.camera_matrix is not None:
            dist = config.distortion or (0.0, 0.0, 0.0)
            self._undist = undistort_map(
                jnp.asarray(config.camera_matrix, jnp.float32),
                jnp.asarray(dist, jnp.float32),
                h,
                w,
            )
        else:
            self._undist = None

        if config.center_weighted:
            yy = jnp.arange(h, dtype=jnp.float32)[:, None]
            xx = jnp.arange(w, dtype=jnp.float32)[None, :]
            wy = 1.0 - jnp.abs(2.0 * yy / (h - 1) - 1.0)
            wx = 1.0 - jnp.abs(2.0 * xx / (w - 1) - 1.0)
            self._frame_weights = jnp.maximum(wy * wx, 1e-3)
        else:
            self._frame_weights = jnp.ones((h, w), jnp.float32)

        cfg = config

        @jax.jit
        def _register(prev_feats, cur_feats):
            fwd = match_pair(prev_feats, cur_feats, ambiguity=cfg.ambiguity)
            bwd = match_pair(cur_feats, prev_feats, ambiguity=cfg.ambiguity)
            idx = mutual_matches(fwd, bwd)
            src, dst, mask = align_points(
                prev_feats.x,
                prev_feats.y,
                cur_feats.x,
                cur_feats.y,
                idx,
                prev_feats.valid,
            )
            # Fit cur -> prev (dst -> src) directly: that is the chaining
            # direction H_canvas_cur = H_canvas_prev @ H_prev_cur.
            res = ransac(dst, src, mask, cfg.ransac, model="homography")
            return res.transform, res.num_inliers, res.success

        @jax.jit
        def _blend(canvas, weights, frame, H_canvas_cur):
            # blend expects canvas pixel -> frame coords.
            H_cur_canvas = inv3x3(H_canvas_cur)
            return blend_into_mosaic(
                canvas, weights, frame, self._frame_weights, H_cur_canvas
            )

        self._register = _register
        self._blend = _blend

    def add_frame(self, image) -> dict:
        """Register + blend one grayscale frame. Returns status."""
        frame = jnp.asarray(image, jnp.float32)
        if self._undist is not None:
            frame = remap(frame, self._undist[0], self._undist[1])
        feats = self._detect(frame)

        if self._prev_feats is None:
            self.canvas, self.weights = self._blend(
                self.canvas, self.weights, frame, self._H_canvas
            )
            self._prev_feats = feats
            self.num_registered += 1
            return {"registered": True, "num_inliers": 0}

        H_prev_cur, num_inl, success = self._register(self._prev_feats, feats)
        if not bool(success) or int(num_inl) < self.config.min_inliers:
            self.num_failed += 1
            return {"registered": False, "num_inliers": int(num_inl)}

        self._H_canvas = self._H_canvas @ H_prev_cur
        self.canvas, self.weights = self._blend(
            self.canvas, self.weights, frame, self._H_canvas
        )
        self._prev_feats = feats
        self.num_registered += 1
        return {"registered": True, "num_inliers": int(num_inl)}

    def result(self) -> np.ndarray:
        """Current mosaic canvas as a numpy array."""
        return np.asarray(self.canvas)

    def frame_to_canvas(self) -> np.ndarray:
        """Homography of the latest registered frame into the canvas."""
        return np.asarray(self._H_canvas)
