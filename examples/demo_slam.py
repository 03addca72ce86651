"""Demo: monocular keyframe SLAM on a synthetic orbit with loop closure.

Pipeline: match -> E/H-RANSAC -> cheirality pose -> monocular scale
propagation -> windowed BA -> loop closure -> pose-graph optimization,
evaluated with ATE against ground truth and dumped in TUM format.

Run: python examples/demo_slam.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from niftymatch_tpu.config import RansacConfig
    from niftymatch_tpu.data import make_scene
    from niftymatch_tpu.data.synthetic import make_feature_sequence
    from niftymatch_tpu.data.tum import poses_to_trajectory, write_trajectory
    from niftymatch_tpu.sfm.se3 import camera_center
    from niftymatch_tpu.slam import SlamConfig, SlamSystem
    from niftymatch_tpu.utils import ate_rmse

    K = 12
    scene = make_scene(
        num_cams=K,
        num_landmarks=800,
        seed=1,
        width=640,
        height=480,
        arc=(0.0, 2 * np.pi * (K - 1) / K),
    )
    feats = make_feature_sequence(scene, capacity=384, noise_px=1.0, seed=1)

    slam = SlamSystem(
        SlamConfig(
            width=640,
            height=480,
            intrinsics=tuple(float(v) for v in scene.intrinsics),
            ransac=RansacConfig(iterations=512, inlier_threshold=4.0),
            detector_features=384,
            ba_every=3,
            ba_window=4,
            loop_min_gap=4,
            loop_min_matches=40,
        )
    )
    for i, f in enumerate(feats):
        info = slam.process_features(f)
        print(f"frame {i}: {info}")

    gt = np.asarray(camera_center(jnp.asarray(scene.poses)))
    print(f"ATE before loop closure: {ate_rmse(slam.trajectory(), gt):.4f}")
    n = slam.close_loops()
    ate = ate_rmse(slam.trajectory(), gt)
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    print(f"loop edges: {n}; ATE after: {ate:.4f} "
          f"({ate / scale:.2%} of trajectory scale)")

    out = os.path.join(os.path.dirname(__file__), "trajectory_tum.txt")
    write_trajectory(out, poses_to_trajectory(slam.poses()))
    print(f"trajectory (TUM format, evo-compatible) saved to {out}")


if __name__ == "__main__":
    main()
