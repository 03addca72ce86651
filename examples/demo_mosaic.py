"""Demo: sequential mosaicking of a drifting camera over a synthetic scene.

The reference's GIFT-Surg use case (SURVEY.md §3.4) end-to-end:
detect -> match -> RANSAC homography -> warp -> blend.

Run: python examples/demo_mosaic.py  (CPU or TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from niftymatch_tpu.config import RansacConfig
    from niftymatch_tpu.mosaic import MosaicBuilder, MosaicConfig

    rng = np.random.default_rng(0)
    H, W = 480, 640
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    scene = np.full((H, W), 128.0, np.float32)
    for _ in range(220):
        by, bx = rng.uniform(5, H - 5), rng.uniform(5, W - 5)
        bs = rng.uniform(1.5, 5.0)
        amp = rng.uniform(60, 255) * rng.choice([-1.0, 1.0])
        scene += amp * np.exp(-((yy - by) ** 2 + (xx - bx) ** 2) / (2 * bs**2))

    h, w = 240, 320
    mb = MosaicBuilder(
        MosaicConfig(
            width=w,
            height=h,
            canvas_width=W,
            canvas_height=H,
            anchor_x=20.0,
            anchor_y=20.0,
            ransac=RansacConfig(iterations=512, inlier_threshold=9.0),
            detector_features=512,
        )
    )
    # Camera drifts diagonally across the scene.
    for k in range(8):
        dy, dx = 12 * k, 28 * k
        frame = scene[dy : dy + h, dx : dx + w]
        info = mb.add_frame(frame)
        print(f"frame {k}: {info}")

    canvas = mb.result()
    covered = (np.asarray(mb.weights) > 0).mean()
    print(f"mosaic covers {covered:.0%} of the canvas; "
          f"registered {mb.num_registered}, failed {mb.num_failed}")
    out = os.path.join(os.path.dirname(__file__), "mosaic_out.npy")
    np.save(out, canvas)
    print(f"canvas saved to {out}")


if __name__ == "__main__":
    main()
