"""Fixed-capacity feature container — the TPU-native ``SiftData``.

The reference's ``SiftData`` (``siftdata.h:20-170``) holds 128-D descriptors,
x/y coordinates and match indexes in fixed-capacity device vectors with a
host-side ``_num_items`` count.  The TPU version replaces the count with a
per-slot validity mask (static shapes end-to-end, SURVEY.md §7.1) and adds
scale / orientation / response / octave metadata so downstream geometry can
rank and filter without re-detection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import SIFT_VECTOR_SIZE


class Features(NamedTuple):
    """A fixed-capacity set of SIFT features.

    All arrays share leading capacity dimension K; ``valid`` marks live
    slots.  Registered as a pytree (NamedTuple), so it flows through jit /
    vmap / shard_map.
    """

    x: jnp.ndarray          # (K,) float32, input-image coords
    y: jnp.ndarray          # (K,) float32
    sigma: jnp.ndarray      # (K,) float32 absolute scale
    angle: jnp.ndarray      # (K,) float32 first orientation
    response: jnp.ndarray   # (K,) float32 |DoG| response
    octave: jnp.ndarray     # (K,) int32
    level: jnp.ndarray      # (K,) int32 DoG level within octave
    desc: jnp.ndarray       # (K, 128) float32
    valid: jnp.ndarray      # (K,) bool

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jnp.ndarray:
        """Number of live features (device scalar; no host sync forced)."""
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int) -> "Features":
        z = jnp.zeros((capacity,), jnp.float32)
        return Features(
            x=z,
            y=z,
            sigma=z,
            angle=z,
            response=z,
            octave=jnp.zeros((capacity,), jnp.int32),
            level=jnp.zeros((capacity,), jnp.int32),
            desc=jnp.zeros((capacity, SIFT_VECTOR_SIZE), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    def take(self, idx: jnp.ndarray, new_valid: jnp.ndarray) -> "Features":
        """Gather slots by index with an explicit validity override."""
        return Features(
            x=self.x[idx],
            y=self.y[idx],
            sigma=self.sigma[idx],
            angle=self.angle[idx],
            response=self.response[idx],
            octave=self.octave[idx],
            level=self.level[idx],
            desc=self.desc[idx],
            valid=new_valid,
        )


def concat_features(parts) -> Features:
    """Concatenate feature sets along the capacity axis."""
    return Features(*[jnp.concatenate(arrs, axis=0) for arrs in zip(*parts)])


def topk_features(feats: Features, k: int) -> Features:
    """Global top-k by response — the deterministic replacement for the
    reference's first-come capacity clamp (``siftfunctions.cu:165-178``)."""
    scores = jnp.where(feats.valid, feats.response, -jnp.inf)
    kk = min(k, scores.shape[-1])
    top_scores, idx = jax.lax.top_k(scores, kk)
    out = feats.take(idx, jnp.isfinite(top_scores))
    if kk < k:
        pad = Features.empty(k - kk)
        out = concat_features([out, pad])
    return out
