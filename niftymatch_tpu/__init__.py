"""NiftyMatch-TPU: a TPU-native feature-matching + SLAM/SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
gift-surg/NiftyMatch (GPU SIFT detection/matching/RANSAC/mosaicking),
extended into a full SLAM/SfM engine: triangulation, bundle adjustment with
a batched Schur-complement solver, pose-graph optimisation, and multi-host
sharding over ICI/DCN via jax.sharding.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

  niftymatch_tpu.sift        — pipeline driver (the layer the reference lacks)
  niftymatch_tpu.ops         — kernel layer (L2 equivalent, jnp oracles)
  niftymatch_tpu.pallas      — hand-tiled Pallas fast paths for hot ops
  niftymatch_tpu.geometry    — RANSAC, epipolar geometry, BA, pose graphs
  niftymatch_tpu.slam        — keyframe SLAM system
  niftymatch_tpu.parallel    — device-mesh sharding (matching + distributed BA)
  niftymatch_tpu.data        — datasets (TUM/EuRoC/synthetic) + native loader
  niftymatch_tpu.utils       — timing, metrics (ATE), checkpointing
"""

from .config import (
    BAConfig,
    CompatFlags,
    MatchConfig,
    PipelineConfig,
    RansacConfig,
    RuntimeConfig,
    SiftConfig,
    MAX_DESCRIPTORS,
    SIFT_VECTOR_SIZE,
)
from .features import Features, concat_features, topk_features
from .geometry import RansacResult, align_points, ransac
from .sift import (
    detect_and_describe,
    make_batch_detector,
    make_detector,
    make_pair_pipeline,
    match_pair,
)

__version__ = "0.1.0"

__all__ = [
    "BAConfig",
    "CompatFlags",
    "MatchConfig",
    "PipelineConfig",
    "RansacConfig",
    "RuntimeConfig",
    "SiftConfig",
    "MAX_DESCRIPTORS",
    "SIFT_VECTOR_SIZE",
    "Features",
    "RansacResult",
    "align_points",
    "concat_features",
    "ransac",
    "topk_features",
    "detect_and_describe",
    "make_batch_detector",
    "make_detector",
    "make_pair_pipeline",
    "match_pair",
    "__version__",
]
