"""Multi-host initialization and mesh layout helpers.

The reference is single-GPU (SURVEY.md §2); scaling here rides JAX's
distributed runtime: ``jax.distributed.initialize`` forms the process
group, XLA lays collectives over ICI within a slice and DCN across slices.
The framework's sharding layouts (keyframe-major 1-D mesh for ring matching
and landmark shards for distributed BA) are host-count agnostic — the same
``shard_map`` programs run on 8 CPU devices, 1 TPU host, or an N-host pod
slice unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host process group (no-op on a single host).

    On TPU pods the arguments auto-detect from the environment; pass them
    explicitly for CPU/GPU clusters.  Must run before any jax computation.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_hierarchical_mesh(
    kf_axis: str = "kf", host_axis: str | None = None
) -> Mesh:
    """Global mesh over all devices (all hosts).

    With ``host_axis`` set, devices factor as (hosts, devices-per-host) so
    shardings can keep heavy traffic (ring matching) on the intra-host ICI
    axis and only psum-reduced scalars/blocks on the DCN host axis."""
    devs = jax.devices()  # global across hosts after initialize
    if host_axis is None:
        return Mesh(np.asarray(devs), (kf_axis,))
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devs) // n_hosts
    grid = np.asarray(devs).reshape(n_hosts, per_host)
    return Mesh(grid, (host_axis, kf_axis))


def local_batch_slice(global_batch: int) -> slice:
    """Rows of a globally-sharded keyframe batch owned by this process."""
    n = max(jax.process_count(), 1)
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
