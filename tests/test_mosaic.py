"""Mosaic builder end-to-end: register translated crops of one big scene
and verify the recovered chain + blended canvas (the reference's GIFT-Surg
mosaicking loop, SURVEY.md §3.4)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run via ci/test-full.sh

from niftymatch_tpu.mosaic import MosaicBuilder, MosaicConfig
from niftymatch_tpu.config import RansacConfig


def _big_scene(rng, H=360, W=480):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.full((H, W), 128.0, np.float32)
    for _ in range(140):
        by, bx = rng.uniform(5, H - 5), rng.uniform(5, W - 5)
        bs = rng.uniform(1.5, 5.0)
        amp = rng.uniform(60, 255) * rng.choice([-1.0, 1.0])
        img += amp * np.exp(-((yy - by) ** 2 + (xx - bx) ** 2) / (2 * bs**2))
    return img


def test_mosaic_registers_translated_crops(rng):
    scene = _big_scene(rng)
    h, w = 180, 240
    shifts = [(0, 0), (18, 7), (36, 14), (54, 21), (72, 28)]
    frames = [scene[dy : dy + h, dx : dx + w] for (dy, dx) in shifts]

    cfg = MosaicConfig(
        width=w,
        height=h,
        canvas_width=480,
        canvas_height=360,
        anchor_x=40.0,
        anchor_y=40.0,
        ransac=RansacConfig(iterations=512, inlier_threshold=9.0),
        detector_features=512,
    )
    mb = MosaicBuilder(cfg)
    infos = [mb.add_frame(f) for f in frames]
    assert all(i["registered"] for i in infos), infos
    assert mb.num_failed == 0

    # Final chain: frame k coords -> canvas = anchor + cumulative shift.
    H_final = mb.frame_to_canvas()
    dy, dx = shifts[-1]
    np.testing.assert_allclose(H_final[0, 2], 40.0 + dx, atol=1.0)
    np.testing.assert_allclose(H_final[1, 2], 40.0 + dy, atol=1.0)
    np.testing.assert_allclose(H_final[:2, :2], np.eye(2), atol=0.01)

    # Canvas content matches the source scene where covered.
    canvas = mb.result()
    wts = np.asarray(mb.weights)
    covered = wts > 0.2
    assert covered.sum() > 0.8 * h * w  # grew beyond one frame
    # Compare canvas to scene shifted by the anchor.
    ys, xs = np.nonzero(covered)
    sel = (ys >= 40) & (ys < 40 + 252) & (xs >= 40) & (xs < 40 + 268)
    ys, xs = ys[sel], xs[sel]
    src_vals = scene[ys - 40, xs - 40]
    diff = np.abs(canvas[ys, xs] - src_vals)
    assert np.median(diff) < 2.0, np.median(diff)


def test_mosaic_rejects_unrelated_frame(rng):
    scene = _big_scene(rng)
    h, w = 180, 240
    cfg = MosaicConfig(
        width=w,
        height=h,
        canvas_width=400,
        canvas_height=320,
        detector_features=512,
        min_inliers=12,
    )
    mb = MosaicBuilder(cfg)
    assert mb.add_frame(scene[:h, :w])["registered"]
    noise = rng.normal(128, 30, (h, w)).astype(np.float32)
    info = mb.add_frame(noise)
    assert not info["registered"]
    assert mb.num_failed == 1
