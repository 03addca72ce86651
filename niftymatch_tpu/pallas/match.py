"""Fused descriptor-match kernel: distance GEMM + running top-2, one pass.

The reference materialises the full A x B distance matrix twice plus two
transposes (``siftfunctions.cu:21-34``), then re-scans it for the 2-NN ratio
test (``match.cu:82-117``).  The jnp oracle (``ops/match.py``) already
removes the transposes; this kernel removes the materialisation too:

  for each A-tile (grid dim 0), sweep B-tiles (grid dim 1, fastest):
      for each row-chunk of the A-tile (in-kernel loop):
          D_chunk = bnorm - 2 a.b         (one MXU dot per chunk)
          fold D_chunk into a running per-row (min1, argmin1, min2)

``||a||^2`` is constant along each row so it cannot change any row's argmin
or ordering; it is added back outside the kernel (exactly), which removes a
broadcast add from the hot loop.  B-column validity and padding are folded
into the precomputed fp32 ``bnorm`` vector as ``+MASKVAL`` — no mask
``where`` in the hot loop either.

HBM traffic is the design target (this is what limits large sweeps, see
``match.cu:13-80`` whose CHUNK tiling existed to reuse B):
  A read once; B re-streamed ceil(M/TM) times.  TM grows with N (up to
  4096), so at 32k x 32k the B re-stream is 8 passes instead of 128, and
  bf16 descriptor storage halves the bytes of each pass.  The in-kernel
  row-chunk loop (MC rows at a time) keeps the live distance tile at
  MC x TN f32 regardless of TM, so TM is VMEM-cheap.

Accumulator scratch persists across the sequential TPU grid.  Semantics
match ``ops.match.top2_min`` up to fp rounding of the distance
computation: ties resolve to the lowest column index; min2 is the
smallest distance at any *other* column.  (For EXACT-duplicate
descriptors the true second-best distance is 0 and both paths clamp a
rounding-noise value at 0 — whether the ratio test then rejects is an
fp coin-flip in the oracle and the kernel alike; indices agree exactly
wherever the top-2 gap exceeds rounding noise, which the hardware
equivalence tests assert.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.match import MatchResult

_BIG = 3.4e38    # +inf surrogate for accumulator init (survives arithmetic)
_MASKVAL = 1e30  # folded into bnorm for invalid/padded columns
_NOVALID = 1e29  # min1 above this => the row saw no valid B column


def _match_kernel(
    a_ref,        # (TM, D)  A tile, pre-scaled by -2 (bf16 or f32)
    b_ref,        # (TN, D)  B tile (bf16 or f32)
    bnorm_ref,    # (1, TN)  f32 ||b||^2, +MASKVAL where invalid/padded
    min1_ref,     # (1, 1, TM) out f32 (excludes ||a||^2)
    idx1_ref,     # (1, 1, TM) out int32
    min2_ref,     # (1, 1, TM) out f32 (excludes ||a||^2)
    m1_s,         # (MC, NC) scratch f32   — lane-packed per-chunk columns
    i1_s,         # (MC, NC) scratch i32     (a (TM,1)-shaped buffer would
    m2_s,         # (MC, NC) scratch f32      be lane-padded 128x in VMEM)
    c1_s,         # (MC, NC) scratch f32   — this B-tile's chunk candidates
    ci_s,         # (MC, NC) scratch i32     (staged per chunk so no SSA
    c2_s,         # (MC, NC) scratch f32      value lives across the loop)
    *,
    tn: int,
    mc: int,
    nc: int,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m1_s[:] = jnp.full_like(m1_s, _BIG)
        i1_s[:] = jnp.full_like(i1_s, -1)
        m2_s[:] = jnp.full_like(m2_s, _BIG)

    b = b_ref[:]
    bnorm = bnorm_ref[:]

    for c in range(nc):  # static chunk count: unrolled, static slices
        a = a_ref[c * mc:(c + 1) * mc, :]                    # (MC, D)
        ab = jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (MC, TN) = -2 a.b
        d = ab + bnorm                                       # ||b||^2 - 2 a.b

        # Per-row top-2 within the chunk (ties -> lowest column).
        t1 = jnp.min(d, axis=-1, keepdims=True)              # (MC, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        is_min = d == t1
        first_min_col = jnp.min(
            jnp.where(is_min, cols, jnp.int32(2**30)), axis=-1, keepdims=True
        )
        d2 = jnp.where(cols == first_min_col, _BIG, d)
        # Stage into scratch columns: ends each chunk's SSA lifetime, so
        # Mosaic reuses one (MC, TN) stack slot for every chunk's d
        # (keeping all nc candidate VALUES live to concat at the end
        # exceeded the 16 MB scoped-VMEM stack at nc = 32).
        c1_s[:, c:c+1] = t1
        ci_s[:, c:c+1] = first_min_col + j * tn              # global index
        c2_s[:, c:c+1] = jnp.min(d2, axis=-1, keepdims=True)

    # ONE vectorised merge of all chunks' candidates into the running
    # top-2 (each chunk is a distinct row group -> lane-packed columns
    # of the (MC, NC) scratch).  Merging per chunk on (MC, 1) slices
    # cost ~6 single-lane VPU ops per chunk; batched across lanes the
    # merge is 6 ops on the whole (MC, NC) tile.
    cand1, candi, cand2 = c1_s[:], ci_s[:], c2_s[:]
    m1, i1, m2 = m1_s[:], i1_s[:], m2_s[:]
    better = cand1 < m1
    m1_s[:] = jnp.where(better, cand1, m1)
    i1_s[:] = jnp.where(better, candi, i1)
    m2_s[:] = jnp.where(
        better, jnp.minimum(m1, cand2), jnp.minimum(m2, cand1))

    @pl.when(j == nj - 1)
    def _flush():
        # Straight scratch copy in (MC, NC) block layout; the caller
        # un-blocks with one tiny XLA transpose+reshape.  The previous
        # flush transposed each (MC, 1) scratch column into lanes —
        # 3 * NC sublane->lane shuffles per A-tile, a measurable fixed
        # cost at small K where the flush runs once per pair.
        min1_ref[0] = m1_s[:]
        idx1_ref[0] = i1_s[:]
        min2_ref[0] = m2_s[:]


def _pad_to(x: jnp.ndarray, size: int, axis: int, value):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _round_up(x: int, q: int) -> int:
    return -(-x // q) * q


def select_tiles(m: int, n: int, bf16: bool) -> tuple[int, int, int]:
    """Shape-adaptive (tm, tn, mc), tuned on a v5e chip (see
    ``benchmarks/match_sweep.py``; MATCH_r03.json records the sweep).

    B is re-streamed ceil(M/TM) times, so TM is large (8192 bf16 / 4096
    fp32 — VMEM-bound); the in-kernel row-chunk loop keeps the live
    distance tile at MC x TN f32 regardless of TM.  Measured at
    32k x 32k x 128 bf16: (8192, 1024, 256) -> 143 TF/s = 73% of the
    197 TF/s MXU peak; wider TN or MC=512 lose ~15% (top-2 fold VPU
    pressure), TM=256 (round-2 default) loses 4x to B re-streaming.
    """
    cap = 8192 if bf16 else 4096
    tm = min(_round_up(m, 256), cap)
    tn = min(_round_up(n, 256), 1024)
    mc = min(256, tm)
    return tm, tn, mc


@partial(jax.jit, static_argnames=("bf16",))
def prepare_descriptors(desc: jnp.ndarray, bf16: bool = True):
    """One-time per-descriptor-set preparation for repeated matching.

    Returns ``(neg2, mat, norm)``: the A-role operand (``-2 x`` cast),
    the B-role operand (plain cast), and fp32 squared norms.  In a K^2
    sweep every keyframe plays both roles many times; preparing once
    moves the cast/norm passes out of the per-pair path (they are ~5% of
    kernel time at 32k, pure overhead when repeated)."""
    cdtype = jnp.bfloat16 if bf16 else jnp.float32
    d32 = desc.astype(jnp.float32)
    norm = jnp.sum(d32 * d32, axis=-1)
    return (-2.0 * d32).astype(cdtype), d32.astype(cdtype), norm


def _fused_call(a, b, bn, a_norm, m, tm, tn, mc, interpret):
    """Core pallas invocation on prepared operands (a pre-scaled by -2,
    bn masked with +_MASKVAL on invalid columns)."""
    d = a.shape[1]
    nc = tm // mc
    mp = _round_up(a.shape[0], tm)
    np_ = _round_up(b.shape[0], tn)
    a = _pad_to(a, mp, 0, 0.0)
    b = _pad_to(b, np_, 0, 0.0)
    bn = _pad_to(bn, np_, 1, _MASKVAL)

    grid = (mp // tm, np_ // tn)
    min1, idx1, min2 = pl.pallas_call(
        partial(_match_kernel, tn=tn, mc=mc, nc=nc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, mc, nc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc, nc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc, nc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp // tm, mc, nc), jnp.float32),
            jax.ShapeDtypeStruct((mp // tm, mc, nc), jnp.int32),
            jax.ShapeDtypeStruct((mp // tm, mc, nc), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mc, nc), jnp.float32),
            pltpu.VMEM((mc, nc), jnp.int32),
            pltpu.VMEM((mc, nc), jnp.float32),
            pltpu.VMEM((mc, nc), jnp.float32),
            pltpu.VMEM((mc, nc), jnp.int32),
            pltpu.VMEM((mc, nc), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * d,
            bytes_accessed=(mp * d + np_ * d * grid[0]) * a.dtype.itemsize
            + 4 * np_ * grid[0]
            + 12 * mp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, bn)
    # Un-block (mi, MC, NC) -> (mp,): global row = i*tm + c*mc + row, so
    # transpose the (row, chunk) axes before flattening (tiny XLA op,
    # replaces the kernel's former per-column sublane->lane transposes).
    min1 = min1.transpose(0, 2, 1).reshape(mp)
    idx1 = idx1.transpose(0, 2, 1).reshape(mp)
    min2 = min2.transpose(0, 2, 1).reshape(mp)

    # Add ||a||^2 back (constant per row: cannot change argmin/ordering),
    # clamp fp rounding below zero.  No-valid rows stay above _NOVALID
    # because _MASKVAL dwarfs any real norm.
    min1 = jnp.maximum(min1[:m] + a_norm, 0.0)
    min2 = jnp.maximum(min2[:m] + a_norm, 0.0)
    return min1, idx1[:m], min2


@partial(
    jax.jit, static_argnames=("tm", "tn", "mc", "bf16", "interpret")
)
def fused_match_topk(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    b_valid: jnp.ndarray | None = None,
    tm: int | None = None,
    tn: int | None = None,
    mc: int | None = None,
    bf16: bool = False,
    interpret: bool = False,
):
    """Per-A-row (min1, argmin1, min2) squared-L2 against all B rows.

    Returns (min1 (M,), idx1 (M,) int32, min2 (M,)); invalid B columns are
    excluded.  Rows with min1 >= the no-valid threshold (~1e29) had no
    valid B at all.  With ``bf16=True`` descriptors are stored and
    multiplied in bfloat16 (norms stay fp32) — half the HBM bytes.
    """
    m, d = desc_a.shape
    n = desc_b.shape[0]

    atm, atn, amc = select_tiles(m, n, bf16)
    tm = atm if tm is None else tm
    tn = atn if tn is None else tn
    mc = min(tm, amc if mc is None else mc)
    assert tm % mc == 0

    a_neg2, _, a_norm = prepare_descriptors(desc_a, bf16=bf16)
    _, b_mat, b_norm = prepare_descriptors(desc_b, bf16=bf16)
    if b_valid is not None:
        b_norm = jnp.where(b_valid, b_norm, _MASKVAL)
    return _fused_call(a_neg2, b_mat, b_norm[None, :], a_norm, m,
                       tm, tn, mc, interpret)


@partial(
    jax.jit, static_argnames=("tm", "tn", "mc", "interpret")
)
def fused_match_topk_prepared(
    prep_a,
    prep_b,
    b_valid: jnp.ndarray | None = None,
    tm: int | None = None,
    tn: int | None = None,
    mc: int | None = None,
    interpret: bool = False,
):
    """``fused_match_topk`` on ``prepare_descriptors`` outputs — the
    per-pair fast path for K^2 sweeps (no cast/norm passes per call)."""
    a_neg2, _, a_norm = prep_a
    _, b_mat, b_norm = prep_b
    m = a_neg2.shape[0]
    bf16 = a_neg2.dtype == jnp.bfloat16
    atm, atn, amc = select_tiles(m, b_mat.shape[0], bf16)
    tm = atm if tm is None else tm
    tn = atn if tn is None else tn
    mc = min(tm, amc if mc is None else mc)
    # A non-divisible tm would silently floor the chunk count and leave
    # tile rows >= nc*mc with UNWRITTEN (garbage) outputs.
    assert tm % mc == 0, (tm, mc)
    if b_valid is not None:
        b_norm = jnp.where(b_valid, b_norm, _MASKVAL)
    return _fused_call(a_neg2, b_mat, b_norm[None, :], a_norm, m,
                       tm, tn, mc, interpret)


def match_descriptors_pallas(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    ambiguity: float = 0.8,
    a_valid: jnp.ndarray | None = None,
    b_valid: jnp.ndarray | None = None,
    precision: str = "fp32",
    interpret: bool = False,
) -> MatchResult:
    """Drop-in fast path for ``ops.match.match_descriptors`` — identical
    semantics (Lowe ratio test of ``match.cu:82-117``), fused kernel."""
    min1, idx1, min2 = fused_match_topk(
        desc_a,
        desc_b,
        b_valid,
        bf16=(precision == "bf16"),
        interpret=interpret,
    )
    had_valid = min1 < _NOVALID
    ratio = min1 / jnp.where(min2 > 0.0, min2, 1.0)
    # Same acceptance rule as the jnp oracle (ops/match.py): min2 > 0 and
    # ratio below threshold; a lone valid candidate (min2 at the +inf
    # surrogate) matches, exactly as the oracle's min2 = inf does.
    ok = (min2 > 0.0) & (ratio < ambiguity) & had_valid
    if a_valid is not None:
        ok = ok & a_valid
    return MatchResult(
        indices=jnp.where(ok, idx1, -1),
        distances=jnp.where(had_valid, min1, 0.0),
        ratios=jnp.where(min2 > 0.0, ratio, 1.0),
    )
