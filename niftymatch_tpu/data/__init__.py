"""Datasets: synthetic scene generation + TUM-format trajectory IO.

The reference ships no data layer (clients feed raw device buffers).  This
package provides the evaluation inputs for BASELINE configs 2-5: synthetic
multi-view scenes with exact ground truth, and TUM RGB-D trajectory
parsing/writing for ATE evaluation."""

from . import euroc, native_loader, tum
from .synthetic import (
    SyntheticScene,
    apply_photometric,
    make_observation_table,
    make_scene,
    render_frames,
)

__all__ = [
    "SyntheticScene",
    "apply_photometric",
    "euroc",
    "native_loader",
    "tum",
    "make_observation_table",
    "make_scene",
    "render_frames",
]
