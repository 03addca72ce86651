"""Utilities: trajectory metrics (ATE/RPE), timing, checkpointing.

The reference's only instrumentation is a cudaEvent timer
(``src/gpu/utils/cudatimer.{h,cu}``); this package adds the observability
and evaluation layer SURVEY.md §5 calls for."""

from .metrics import ate_rmse, rpe_rmse, umeyama_alignment
from .timing import Timer, benchmark

__all__ = ["ate_rmse", "rpe_rmse", "umeyama_alignment", "Timer", "benchmark"]
