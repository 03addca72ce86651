"""Utilities: trajectory metrics (ATE/RPE), timing, checkpointing.

The reference's only instrumentation is a cudaEvent timer
(``src/gpu/utils/cudatimer.{h,cu}``); this package adds the observability
and evaluation layer SURVEY.md §5 calls for."""

from .checkpoint import load_pytree, load_slam_state, save_pytree, save_slam_state
from .metrics import ate_rmse, rpe_rmse, sim3_align, umeyama_alignment
from .precision import f32
from .profiling import RooflineReport, annotate, roofline, trace
from .timing import Timer, benchmark

__all__ = [
    "RooflineReport",
    "Timer",
    "annotate",
    "ate_rmse",
    "benchmark",
    "f32",
    "load_pytree",
    "load_slam_state",
    "roofline",
    "rpe_rmse",
    "sim3_align",
    "save_pytree",
    "save_slam_state",
    "trace",
    "umeyama_alignment",
]
