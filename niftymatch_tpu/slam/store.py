"""Device-resident keyframe feature store.

One growing set of ``(capacity, N, ...)`` device buffers holds every
keyframe's features (the map-scale analogue of the reference's per-image
``SiftData``, ``siftdata.h:20-170``).  Design drivers:

- **Chunked appends, zero retention.**  The SLAM chunk pipeline produces a
  batch of candidate features per dispatch; accepted rows are *staged* on
  the host and written with ONE gather+dynamic_update_slice dispatch per
  chunk at flush time.  After the flush nothing references the chunk batch,
  so rejected frames' descriptors are freed immediately (round-2 advisor
  finding: per-keyframe lazy slices pinned the entire chunk batch for the
  lifetime of the run).
- **Bucketed shapes.**  Capacity grows by doubling, so programs compiled
  against the store (the all-pairs loop-closure sweep, relocalization
  batches) see power-of-two shapes and recompile O(log K) times instead of
  once per keyframe.
- **Single-program appends.**  Staged chunk writes are padded to
  ``chunk_pad`` rows (repeating the last accepted row); the ghost rows sit
  beyond ``count`` and are overwritten by the next append, and every
  store consumer masks by ``count``, so exactly one scatter program is
  compiled regardless of per-chunk acceptance counts.
"""

from __future__ import annotations

from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..features import Features


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(buf: Features, feats_b: Features, idx: jnp.ndarray,
                  k0: jnp.ndarray) -> Features:
    """buf[k0 : k0+len(idx)] = feats_b[idx] (one fused dispatch)."""
    sel = jax.tree.map(lambda a: a[idx], feats_b)
    return jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_slice(
            b, s, (k0,) + (0,) * (b.ndim - 1)
        ),
        buf,
        sel,
    )


@partial(jax.jit, donate_argnums=(0,))
def _scatter_one(buf: Features, feats: Features, k0: jnp.ndarray) -> Features:
    sel = jax.tree.map(lambda a: a[None], feats)
    return jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_slice(
            b, s, (k0,) + (0,) * (b.ndim - 1)
        ),
        buf,
        sel,
    )


@jax.jit
def _grow(buf: Features) -> Features:
    return jax.tree.map(
        lambda b: jnp.concatenate([b, jnp.zeros_like(b)], axis=0), buf
    )


@partial(jax.jit, static_argnames=("n",))
def _tail(buf: Features, lo: jnp.ndarray, n: int) -> Features:
    return jax.tree.map(
        lambda b: jax.lax.dynamic_slice(
            b, (lo,) + (0,) * (b.ndim - 1), (n,) + b.shape[1:]
        ),
        buf,
    )


@jax.jit
def _row(buf: Features, i: jnp.ndarray) -> Features:
    return jax.tree.map(lambda b: b[i], buf)


@jax.jit
def _gather(buf: Features, idx: jnp.ndarray) -> Features:
    return jax.tree.map(lambda b: b[idx], buf)


class FeatureStore:
    """Append-only device store of keyframe feature sets."""

    def __init__(self, init_capacity: int = 64, chunk_pad: int = 16):
        self._buf: Features | None = None
        self.capacity = init_capacity
        self.count = 0
        self.chunk_pad = chunk_pad
        # Staged writes: list of ("rows", feats_b, [frame_idx...], k0) or
        # ("one", feats, k0) executed in order at flush.
        self._pending: List[tuple] = []
        self._staged = 0  # rows reserved beyond count (incl. pending)

    # -- staging -------------------------------------------------------
    def stage_chunk(self, feats_b: Features, accepted: List[int]) -> List[int]:
        """Reserve slots for ``accepted`` rows of a chunk batch; returns the
        slot indices.  The device write happens at :meth:`flush` (one
        dispatch, padded to ``chunk_pad`` rows)."""
        if not accepted:
            return []
        k0 = self.count + self._staged
        self._pending.append(("rows", feats_b, list(accepted), k0))
        self._staged += len(accepted)
        return list(range(k0, k0 + len(accepted)))

    def stage_single(self, feats: Features) -> int:
        k0 = self.count + self._staged
        self._pending.append(("one", feats, k0))
        self._staged += 1
        return k0

    # -- flush ---------------------------------------------------------
    def _ensure_capacity(self, need: int):
        if self._buf is None:
            # Infer per-frame feature capacity from the first staged item.
            kind, feats, *_ = self._pending[0]
            while self.capacity < need:
                self.capacity *= 2
            row = jax.tree.map(
                lambda a: (a[0] if kind == "rows" else a), feats
            )
            self._buf = jax.tree.map(
                lambda a: jnp.zeros((self.capacity,) + a.shape, a.dtype), row
            )
            return
        while self.capacity < need:
            self._buf = _grow(self._buf)
            self.capacity *= 2

    def _pad_len(self, n: int) -> int:
        # Round each chunk write up to a multiple of chunk_pad so the
        # scatter program count stays O(max_batch / chunk_pad), not O(n).
        return -(-n // self.chunk_pad) * self.chunk_pad

    def flush(self):
        """Execute staged writes (one dispatch per staged chunk)."""
        if not self._pending:
            return
        need = self.count
        k = self.count
        for item in self._pending:
            if item[0] == "rows":
                n = len(item[2])
                need = max(need, k + self._pad_len(n))
                k += n
            else:
                need = max(need, k + 1)
                k += 1
        self._ensure_capacity(need)
        for item in self._pending:
            if item[0] == "rows":
                _, feats_b, accepted, k0 = item
                pad = self._pad_len(len(accepted))
                idx = accepted + [accepted[-1]] * (pad - len(accepted))
                self._buf = _scatter_rows(
                    self._buf,
                    feats_b,
                    jnp.asarray(np.asarray(idx, np.int32)),
                    jnp.int32(k0),
                )
                self.count = k0 + len(accepted)
            else:
                _, feats, k0 = item
                self._buf = _scatter_one(self._buf, feats, jnp.int32(k0))
                self.count = k0 + 1
        self._pending = []
        self._staged = 0

    # -- reads (all flush first) ----------------------------------------
    def get(self, slot: int) -> Features:
        if slot < 0:
            raise ValueError("feature row not committed yet (slot < 0)")
        self.flush()
        return _row(self._buf, jnp.int32(slot))

    def gather(self, slots) -> Features:
        """Batched row gather (leading dim = len(slots)), one dispatch."""
        self.flush()
        return _gather(self._buf, jnp.asarray(np.asarray(slots, np.int32)))

    def tail(self, n: int) -> Features:
        """Last ``n`` rows (leading dim n), one dispatch."""
        self.flush()
        lo = max(0, self.count - n)
        return _tail(self._buf, jnp.int32(lo), n)

    def view(self) -> Features:
        """The full (capacity, ...) buffers.  Rows >= count are zeros or
        overwritten ghosts — callers must mask by ``count``.  Shape only
        changes on capacity doublings (compile-friendly)."""
        self.flush()
        return self._buf
