"""Keyframe SLAM: front-end two-view estimation + host-orchestrated system
(SURVEY.md §7 M4-M5; BASELINE configs 2-4)."""

from .frontend import (
    TwoViewResult,
    estimate_two_view,
    normalize_points,
    triangulate_in_world,
)
from .store import FeatureStore
from .system import Keyframe, SlamConfig, SlamSystem

__all__ = [
    "FeatureStore",
    "Keyframe",
    "SlamConfig",
    "SlamSystem",
    "TwoViewResult",
    "estimate_two_view",
    "normalize_points",
    "triangulate_in_world",
]
