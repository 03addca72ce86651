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
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.match import (
    mutual_matches,
    pairwise_sq_distances,
    ratio_test_matches,
)


class AllPairsMatches(NamedTuple):
    """Result of an all-pairs keyframe match sweep.

    ``counts[i, j]``: number of ratio-test (optionally mutual) matches from
    frame i to frame j.  ``indices[i, j, n]``: the slot in frame j matched
    by slot n of frame i (-1 sentinel) — ``None`` unless requested."""

    counts: jnp.ndarray            # (K, K) int32
    indices: jnp.ndarray | None    # (K, K, N) int32


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


def _pair_match(da, va, db, vb, ambiguity: float, mutual: bool):
    """Ratio-test matches a->b: ((,) int32 count, (N,) int32 indices).

    ``mutual=True`` cross-checks against the b->a matches derived from the
    SAME distance matrix (transpose — no second GEMM)."""
    d = pairwise_sq_distances(da, db)
    fwd = ratio_test_matches(d, ambiguity, va, vb)
    idx = fwd.indices
    if mutual:
        bwd = ratio_test_matches(d.T, ambiguity, vb, va)
        idx = mutual_matches(fwd, bwd)
    return jnp.sum((idx >= 0).astype(jnp.int32)), idx


def _block_match(desc_a, valid_a, desc_b, valid_b, ambiguity, mutual):
    """(Ka, N, D) x (Kb, N, D) -> ((Ka, Kb) counts, (Ka, Kb, N) indices)."""
    f_b = jax.vmap(
        lambda da, va: jax.vmap(
            lambda db, vb: _pair_match(da, va, db, vb, ambiguity, mutual)
        )(desc_b, valid_b)
    )
    return f_b(desc_a, valid_a)


def allpairs_match(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    ambiguity: float = 0.8,
    mutual: bool = False,
    return_indices: bool = False,
    jblock: int = 8,
) -> AllPairsMatches:
    """Dense single-device all-pairs sweep: one jittable call.

    Memory-blocked: a naive vmap x vmap materialises every pairwise
    (N, N) distance matrix simultaneously — K^2 N^2 floats, 64 GB at
    K=128, N=1024 — so rows are processed sequentially (``lax.map``)
    against column blocks of ``jblock`` frames, bounding the live
    intermediate at jblock * N^2 floats regardless of K."""
    K, N, D = desc.shape
    KP = -(-K // jblock) * jblock
    if KP != K:
        descp = jnp.pad(desc, ((0, KP - K), (0, 0), (0, 0)))
        validp = jnp.pad(valid, ((0, KP - K), (0, 0)))
    else:
        descp, validp = desc, valid
    db = descp.reshape(KP // jblock, jblock, N, D)
    vb = validp.reshape(KP // jblock, jblock, N)

    def one_row(dv):
        da, va = dv

        def one_block(blk):
            dbj, vbj = blk
            return jax.vmap(
                lambda d2, v2: _pair_match(da, va, d2, v2, ambiguity, mutual)
            )(dbj, vbj)

        cnts, idx = jax.lax.map(one_block, (db, vb))
        return cnts.reshape(KP)[:K], idx.reshape(KP, N)[:K]

    counts, idx = jax.lax.map(one_row, (desc, valid))
    return AllPairsMatches(counts, idx if return_indices else None)


def allpairs_match_pallas(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    ambiguity: float = 0.8,
    mutual: bool = False,
    return_indices: bool = False,
    precision: str = "fp32",
    interpret: bool = False,
) -> AllPairsMatches:
    """All-pairs sweep through the fused Pallas match kernel.

    The K^2 sweep is reshaped into K tall-skinny fused-kernel calls
    inside one ``lax.scan``: all K*N descriptor rows (prepared ONCE)
    match against one keyframe's set per step — the kernel's best regime
    (M large, B resident in VMEM; see ``pallas/match.py``), instead of
    K^2 separate (N, N) GEMMs with materialised distance matrices.
    Mutuality is resolved from the full forward index table: slot n of
    frame i matching slot m of frame j is mutual iff frame j's slot m
    matches back to (i, n) — the (j -> i) direction is just another row
    block of the same sweep, so no backward pass is computed.

    Semantics match ``allpairs_match`` (the jnp oracle): Lowe ratio test
    at ``ambiguity`` per pair, -1 sentinels, invalid slots excluded.
    ``precision='bf16'`` halves GEMM time (4x MXU rate + half the DMA);
    candidate counts can then differ from the oracle by ratio-test flips
    within bf16 noise of the threshold — fine for loop-closure candidate
    DETECTION (verification re-matches candidates exactly).
    """
    from ..pallas.match import (
        _MASKVAL,
        _NOVALID,
        fused_match_topk_prepared,
        prepare_descriptors,
    )

    K, N, D = desc.shape
    flat = desc.reshape(K * N, D)
    prep_a = prepare_descriptors(flat, bf16=(precision == "bf16"))
    a_neg2, mat, norm = prep_a
    norm_b = jnp.where(valid.reshape(K * N), norm, _MASKVAL)

    def step(_, j):
        pb = (
            None,
            jax.lax.dynamic_slice(mat, (j * N, 0), (N, D)),
            jax.lax.dynamic_slice(norm_b, (j * N,), (N,)),
        )
        min1, idx1, min2 = fused_match_topk_prepared(
            (a_neg2, None, norm), pb, interpret=interpret
        )
        had = min1 < _NOVALID
        ratio = min1 / jnp.where(min2 > 0.0, min2, 1.0)
        ok = (min2 > 0.0) & (ratio < ambiguity) & had & valid.reshape(-1)
        return None, jnp.where(ok, idx1, -1)        # (K*N,) int32

    _, idx_all = jax.lax.scan(step, None, jnp.arange(K))
    # idx_all: (j, i*N+n) -> slot in frame j matched by slot n of frame i.
    idx = jnp.transpose(idx_all.reshape(K, K, N), (1, 0, 2))  # (i, j, n)

    if mutual:
        # back[i, j, n] = who frame j's slot idx[i,j,n] matches in frame i.
        m = jnp.maximum(idx, 0)
        j_ids = jnp.arange(K)[None, :, None]
        i_ids = jnp.arange(K)[:, None, None]
        back = idx[j_ids, i_ids, m]                  # (i, j, n)
        n_ids = jnp.arange(N)[None, None, :]
        idx = jnp.where((idx >= 0) & (back == n_ids), idx, -1)

    counts = jnp.sum((idx >= 0).astype(jnp.int32), axis=-1)
    return AllPairsMatches(counts, idx if return_indices else None)


def ring_allpairs_match(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    mesh: Mesh,
    axis: str = "kf",
    ambiguity: float = 0.8,
    mutual: bool = False,
    return_indices: bool = False,
    phase: str = "full",
) -> AllPairsMatches:
    """All-pairs keyframe matching, ring-scheduled over the device mesh.

    Keyframe descriptor blocks are sharded over ``axis``; at each of
    ``n_devices`` ring steps every device matches its resident block
    against the visiting block while ``ppermute`` rotates the visitor one
    hop around the ICI ring.  Peak memory is the per-step block product,
    not O(K^2), and all comm rides neighbor links.

    Args:
      desc: (K, N, D) float descriptors — ANY K (padded internally to a
        multiple of the mesh axis size with all-invalid frames).
      valid: (K, N) bool.
      mesh: 1-D (or factored) mesh with ``axis``.
      ambiguity: Lowe ratio threshold.
      mutual: cross-check matches both directions (transpose of the same
        distance matrix — no extra GEMM).
      return_indices: also return the (K, K, N) per-pair match indices
        (the "long-context" correspondence sweep, SURVEY.md §5) instead of
        counts only.
      phase: "full" (default) runs the real sweep; "compute" runs the
        same schedule with the ppermutes elided (resident block matched
        every step) and "comm" elides the block matches — the two
        isolation modes behind the compute-vs-collective breakdown in
        ``benchmarks/scaling.py`` (results are only meaningful as
        timings, not matches).

    Returns:
      AllPairsMatches with rows sharded over ``axis``.  Diagonal is the
      trivial self-match (callers mask it).
    """
    n_dev = mesh.shape[axis]
    k_orig = desc.shape[0]
    n_cap = desc.shape[1]
    pad = (-k_orig) % n_dev
    if pad:
        desc = jnp.concatenate(
            [desc, jnp.zeros((pad,) + desc.shape[1:], desc.dtype)]
        )
        valid = jnp.concatenate([valid, jnp.zeros((pad, n_cap), bool)])
    k_total = k_orig + pad

    fn = _build_ring(mesh, axis, ambiguity, mutual, return_indices,
                     k_total, n_cap, phase)
    # Inputs produced by single-device programs (e.g. the FeatureStore
    # buffers) arrive COMMITTED to device 0; a shard_map over the full
    # mesh rejects that ("incompatible devices").  Explicitly lay the
    # keyframe rows out over the ring axis first.
    from jax.sharding import NamedSharding, PartitionSpec

    row_sharding = NamedSharding(mesh, PartitionSpec(axis))
    desc = jax.device_put(desc, row_sharding)
    valid = jax.device_put(valid.astype(jnp.bool_), row_sharding)
    counts, idx = fn(desc, valid)
    counts = counts[:k_orig, :k_orig]
    return AllPairsMatches(
        counts, idx[:k_orig, :k_orig] if return_indices else None
    )


@lru_cache(maxsize=64)
def _build_ring(mesh: Mesh, axis: str, ambiguity: float, mutual: bool,
                return_indices: bool, k_total: int, n_cap: int,
                phase: str = "full"):
    """Jitted ring-sweep program, cached per (mesh, params, shape bucket).

    An unjitted shard_map executes eagerly (one dispatch per primitive)
    and a rebuilt jit wrapper re-traces per call — the same two wrapper
    bugs fixed in parallel/ba.py's distributed solvers."""
    n_dev = mesh.shape[axis]
    k_local = k_total // n_dev

    def local_fn(desc_blk, valid_blk):
        # desc_blk: (k_local, N, D); valid_blk: (k_local, N)
        me = jax.lax.axis_index(axis)
        # Mark the accumulators as device-varying so the scan carry type is
        # stable (shard_map varying-manual-axes rule).
        var = lambda x: jax.lax.pcast(x, axis, to="varying")
        out_c = var(jnp.zeros((k_local, k_total), jnp.int32))
        out_i = var(
            jnp.zeros(
                (k_local, k_total if return_indices else 1, n_cap), jnp.int32
            )
        )
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        # Validity rides as an extra descriptor column so each ring step
        # issues ONE collective instead of two: every ppermute is a
        # mesh-wide synchronisation point, and halving the per-step
        # collective count measurably cuts the sync-bound overhead the
        # phase breakdown exposes on the virtual mesh (and sends one
        # message, not two, on real ICI).
        packed0 = jnp.concatenate(
            [desc_blk, valid_blk[..., None].astype(desc_blk.dtype)], axis=-1
        )

        def step(carry, s):
            vis, out_c, out_i = carry
            vis_desc = vis[..., :-1]
            vis_valid = vis[..., -1] > 0.5
            # The visiting block at step s originated on device (me - s).
            owner = (me - s) % n_dev
            # Double-buffering (VERDICT r3 #2): the ppermute moving the
            # NEXT visiting block is issued before the local block match
            # consumes the current one — the rotation has no data
            # dependence on the match, so XLA's async collective-permute
            # overlaps the hop with the GEMMs instead of serialising
            # n_dev (comm + compute) rounds.  The last step's rotation is
            # a wasted hop (result unused) but keeps the scan body static.
            if phase == "compute":
                # Keep the block resident but STEP-DEPENDENT (one scalar
                # nudged by the step index): with a loop-invariant ``vis``
                # XLA hoists the whole block match out of the scan and the
                # "compute" phase measures ONE step's GEMMs, not n_dev.
                nxt = vis.at[0, 0, 0].add(
                    jnp.float32(1e-30) * (s + 1).astype(jnp.float32))
            else:
                nxt = jax.lax.ppermute(vis, axis, perm)
            if phase == "comm":
                # Cheap data dependence on the visiting block so the
                # permute chain survives DCE; no match GEMMs.
                counts = jnp.zeros((k_local, k_local), jnp.int32) + (
                    jnp.sum(vis_desc[:, :1, :1]).astype(jnp.int32)
                )
                idx = jnp.zeros((k_local, k_local, n_cap), jnp.int32)
            else:
                counts, idx = _block_match(
                    desc_blk, valid_blk, vis_desc, vis_valid, ambiguity,
                    mutual
                )
            out_c = jax.lax.dynamic_update_slice(
                out_c, counts, (0, owner * k_local)
            )
            if return_indices:
                out_i = jax.lax.dynamic_update_slice(
                    out_i, idx, (0, owner * k_local, 0)
                )
            return (nxt, out_c, out_i), None

        (_, out_c, out_i), _ = jax.lax.scan(
            step,
            (packed0, out_c, out_i),
            jnp.arange(n_dev),
        )
        return out_c, out_i

    return jax.jit(jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    ))


def ring_allpairs_match_counts(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    mesh: Mesh,
    axis: str = "kf",
    ambiguity: float = 0.8,
) -> jnp.ndarray:
    """Counts-only compatibility wrapper over :func:`ring_allpairs_match`."""
    return ring_allpairs_match(
        desc, valid, mesh, axis=axis, ambiguity=ambiguity
    ).counts
