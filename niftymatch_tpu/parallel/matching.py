"""Sharded descriptor matching over a device mesh.

Net-new capability (the reference is single-GPU; SURVEY.md §5 "long-context"
maps its O(K^2) all-pairs keyframe matching onto the blockwise-ring pattern
of ring attention):

* :func:`shard_detect` — data-parallel SIFT detection over a batch of
  frames sharded on the keyframe mesh axis (one jit, XLA inserts no
  collectives: detection is embarrassingly parallel).
* :func:`ring_allpairs_match_counts` — the K x K loop-closure affinity
  sweep.  Keyframe descriptor blocks are sharded over the mesh; at each of
  ``n_devices`` ring steps every device matches its resident block against
  the visiting block (a batched MXU distance GEMM + ratio test) while
  ``ppermute`` rotates the visiting block one hop around the ICI ring.
  Peak memory is O(K_local^2 * N^2 / ...) per step instead of O(K^2), and
  all comm rides neighbor links.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.match import pairwise_sq_distances, ratio_test_matches


def shard_detect(detect_fn, images: jnp.ndarray, mesh: Mesh, axis: str = "kf"):
    """Run a per-image detector over a frame batch sharded across the mesh.

    ``detect_fn``: (H, W) -> Features (e.g. from ``make_detector``).
    ``images``: (K, H, W) with K divisible by the mesh axis size.
    Returns batched Features sharded over the leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    images = jax.device_put(images, sharding)
    batched = jax.jit(
        jax.vmap(detect_fn),
        in_shardings=sharding,
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return batched(images)


def _pair_match_count(da, va, db, vb, ambiguity: float) -> jnp.ndarray:
    """Number of ratio-test matches from frame a to frame b (scalar)."""
    d = pairwise_sq_distances(da, db)
    res = ratio_test_matches(d, ambiguity, va, vb)
    return jnp.sum((res.indices >= 0).astype(jnp.int32))


def _block_counts(desc_a, valid_a, desc_b, valid_b, ambiguity):
    """(Ka, N, D) x (Kb, N, D) -> (Ka, Kb) match-count block."""
    f_b = jax.vmap(
        lambda da, va: jax.vmap(
            lambda db, vb: _pair_match_count(da, va, db, vb, ambiguity)
        )(desc_b, valid_b)
    )
    return f_b(desc_a, valid_a)


def ring_allpairs_match_counts(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    mesh: Mesh,
    axis: str = "kf",
    ambiguity: float = 0.8,
) -> jnp.ndarray:
    """All-pairs keyframe match-count matrix, ring-scheduled over the mesh.

    Args:
      desc: (K, N, D) float descriptors, K divisible by mesh axis size.
      valid: (K, N) bool.
      mesh: 1-D (or factored) mesh with ``axis``.
      ambiguity: Lowe ratio threshold.

    Returns:
      (K, K) int32; entry (i, j) = #descriptors of frame i whose 2-NN ratio
      test against frame j passes.  Diagonal is the trivial self-match count
      (callers mask it).  Layout: rows sharded over ``axis``.
    """
    n_dev = mesh.shape[axis]
    k_total = desc.shape[0]
    assert k_total % n_dev == 0, "K must divide the mesh axis"
    k_local = k_total // n_dev

    def local_fn(desc_blk, valid_blk):
        # desc_blk: (k_local, N, D); valid_blk: (k_local, N)
        me = jax.lax.axis_index(axis)
        # Mark the accumulator as device-varying so the scan carry type is
        # stable (shard_map varying-manual-axes rule).
        out = jax.lax.pcast(
            jnp.zeros((k_local, k_total), jnp.int32), axis, to="varying"
        )
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, s):
            vis_desc, vis_valid, out = carry
            # The visiting block at step s originated on device (me - s).
            owner = (me - s) % n_dev
            counts = _block_counts(
                desc_blk, valid_blk, vis_desc, vis_valid, ambiguity
            )
            out = jax.lax.dynamic_update_slice(out, counts, (0, owner * k_local))
            vis_desc = jax.lax.ppermute(vis_desc, axis, perm)
            vis_valid = jax.lax.ppermute(vis_valid, axis, perm)
            return (vis_desc, vis_valid, out), None

        (_, _, out), _ = jax.lax.scan(
            step,
            (desc_blk, valid_blk, out),
            jnp.arange(n_dev),
        )
        return out

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(desc, valid.astype(jnp.bool_))
