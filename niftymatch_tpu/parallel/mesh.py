"""Mesh construction helpers.

Replaces the reference's device-selection utility (``CudaUtils::setup_CUDA``,
``src/gpu/utils/cudautils.cpp:10-28``, which picks the max-GFLOPS single GPU)
with ``jax.sharding`` mesh construction.  The workload's scaling dimension is
*keyframes* (SURVEY.md §2: "data-sharding by keyframe/map-block is the only
parallelism this workload needs"), so the canonical mesh is 1-D over a
``kf`` axis; callers can add a ``host`` axis for DCN-aware layouts.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_keyframe_mesh(
    n_devices: int | None = None, axis_name: str = "kf"
) -> Mesh:
    """1-D mesh over the keyframe axis.

    ``n_devices=None`` uses all local devices.  On a multi-host slice,
    build with ``jax.devices()`` after ``jax.distributed.initialize`` —
    XLA lays the ring over ICI within a slice and DCN across slices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are visible — a silently smaller "
                f"mesh would fake scaling results"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis_name,))
