"""Device-mesh parallelism: sharded matching and distributed reductions.

The reference is strictly single-GPU (SURVEY.md §2 "Parallelism strategies":
no NCCL/MPI, no multi-device anything).  This package is the net-new scaling
layer: keyframe-sharded meshes, a ring-scheduled all-pairs descriptor-match
sweep (``ppermute`` over ICI — the ring-attention communication pattern
without softmax, SURVEY.md §5 "long-context"), and ``psum``-reduced
distributed bundle adjustment."""

from .ba import (
    ShardedBAProblem,
    distributed_bundle_adjust,
    distributed_bundle_adjust_cg,
    partition_by_landmark,
)
from .mesh import make_keyframe_mesh
from .multihost import (
    initialize_distributed,
    local_batch_slice,
    make_hierarchical_mesh,
)
from .matching import (
    AllPairsMatches,
    allpairs_match,
    allpairs_match_pallas,
    ring_allpairs_match,
    ring_allpairs_match_counts,
    shard_detect,
)

__all__ = [
    "AllPairsMatches",
    "ShardedBAProblem",
    "allpairs_match",
    "allpairs_match_pallas",
    "distributed_bundle_adjust",
    "distributed_bundle_adjust_cg",
    "initialize_distributed",
    "local_batch_slice",
    "make_hierarchical_mesh",
    "make_keyframe_mesh",
    "partition_by_landmark",
    "ring_allpairs_match",
    "ring_allpairs_match_counts",
    "shard_detect",
]
