"""Keyframe SLAM: front-end two-view estimation + host-orchestrated system
(SURVEY.md §7 M4-M5; BASELINE configs 2-4)."""

from .frontend import (
    TwoViewResult,
    estimate_two_view,
    normalize_points,
    triangulate_in_world,
)
from .system import Keyframe, SlamConfig, SlamSystem

__all__ = [
    "Keyframe",
    "SlamConfig",
    "SlamSystem",
    "TwoViewResult",
    "estimate_two_view",
    "normalize_points",
    "triangulate_in_world",
]
