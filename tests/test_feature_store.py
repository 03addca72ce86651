"""FeatureStore: staged chunk appends, capacity doubling, read paths.

The store is the device-side keyframe feature table (``slam/store.py``):
chunk-accepted rows are staged on the host and committed with one
gather+scatter dispatch, so the chunk batch is never retained (round-2
advisor finding)."""

import numpy as np
import jax
import jax.numpy as jnp

from niftymatch_tpu.features import Features
from niftymatch_tpu.slam.store import FeatureStore


def _feats(rng, n=32, d=8):
    return Features(
        x=jnp.asarray(rng.random(n, np.float32)),
        y=jnp.asarray(rng.random(n, np.float32)),
        sigma=jnp.ones((n,), jnp.float32),
        angle=jnp.zeros((n,), jnp.float32),
        response=jnp.asarray(rng.random(n, np.float32)),
        octave=jnp.zeros((n,), jnp.int32),
        level=jnp.zeros((n,), jnp.int32),
        desc=jnp.asarray(rng.random((n, d), np.float32)),
        valid=jnp.ones((n,), bool),
    )


def _batch(rng, b=6, n=32, d=8):
    return jax.tree.map(lambda *a: jnp.stack(a), *[_feats(rng, n, d) for _ in range(b)])


def test_stage_chunk_and_get(rng):
    store = FeatureStore(init_capacity=4, chunk_pad=4)
    fb = _batch(rng, b=6)
    slots = store.stage_chunk(fb, [1, 3, 4])
    assert slots == [0, 1, 2]
    got = store.get(1)  # triggers flush
    np.testing.assert_array_equal(np.asarray(got.desc), np.asarray(fb.desc[3]))
    assert store.count == 3


def test_single_and_chunk_interleave(rng):
    store = FeatureStore(init_capacity=4, chunk_pad=4)
    f0 = _feats(rng)
    s0 = store.stage_single(f0)
    fb = _batch(rng, b=5)
    slots = store.stage_chunk(fb, [0, 2])
    s3 = store.stage_single(_feats(rng))
    assert (s0, slots, s3) == (0, [1, 2], 3)
    store.flush()
    assert store.count == 4
    np.testing.assert_array_equal(
        np.asarray(store.get(0).x), np.asarray(f0.x))
    np.testing.assert_array_equal(
        np.asarray(store.get(2).desc), np.asarray(fb.desc[2]))


def test_capacity_doubles_and_preserves(rng):
    store = FeatureStore(init_capacity=2, chunk_pad=2)
    rows = []
    for _ in range(9):
        f = _feats(rng)
        rows.append(f)
        store.stage_single(f)
        store.flush()
    assert store.capacity >= 9 and store.count == 9
    for i, f in enumerate(rows):
        np.testing.assert_array_equal(
            np.asarray(store.get(i).desc), np.asarray(f.desc))


def test_tail_and_gather(rng):
    store = FeatureStore(init_capacity=4, chunk_pad=4)
    fb = _batch(rng, b=8)
    store.stage_chunk(fb, list(range(8)))
    tail = store.tail(3)
    np.testing.assert_array_equal(
        np.asarray(tail.x), np.asarray(fb.x[5:8]))
    g = store.gather([0, 7, 2])
    np.testing.assert_array_equal(
        np.asarray(g.y), np.asarray(fb.y)[[0, 7, 2]])


def test_view_masks_ghost_rows(rng):
    store = FeatureStore(init_capacity=8, chunk_pad=4)
    fb = _batch(rng, b=4)
    store.stage_chunk(fb, [0])  # pad repeats row 0 into ghost slots
    buf = store.view()
    assert buf.x.shape[0] == store.capacity
    assert store.count == 1  # ghosts are beyond count
    # A later append overwrites the ghost region.
    f1 = _feats(rng)
    store.stage_single(f1)
    np.testing.assert_array_equal(
        np.asarray(store.get(1).x), np.asarray(f1.x))


def test_uncommitted_slot_raises(rng):
    store = FeatureStore()
    try:
        store.get(-1)
    except ValueError:
        return
    raise AssertionError("expected ValueError for slot < 0")
