"""Sharding tests on the 8-device CPU mesh (conftest forces
``xla_force_host_platform_device_count=8`` — SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from niftymatch_tpu.ops.match import match_descriptors
from niftymatch_tpu.parallel import (
    make_keyframe_mesh,
    ring_allpairs_match_counts,
)


def _fake_descriptors(rng, k, n, d=32):
    """k frames of n descriptors where frame pairs (2i, 2i+1) share content."""
    base = rng.normal(size=(k // 2, n, d)).astype(np.float32)
    desc = np.zeros((k, n, d), np.float32)
    desc[0::2] = base
    desc[1::2] = base + 0.01 * rng.normal(size=base.shape).astype(np.float32)
    # L2-normalise rows so distances are well-scaled
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    valid = np.ones((k, n), bool)
    valid[:, -3:] = False  # some dead capacity slots
    return desc, valid


def test_mesh_construction():
    mesh = make_keyframe_mesh()
    assert mesh.shape["kf"] == len(jax.devices())


def test_ring_allpairs_matches_single_device_oracle(rng):
    k, n = 16, 24
    desc, valid = _fake_descriptors(rng, k, n)
    mesh = make_keyframe_mesh(8)
    counts = np.asarray(
        ring_allpairs_match_counts(
            jnp.asarray(desc), jnp.asarray(valid), mesh
        )
    )
    assert counts.shape == (k, k)
    # Oracle: direct per-pair matching on one device.
    oracle = np.zeros((k, k), np.int32)
    for i in range(k):
        for j in range(k):
            res = match_descriptors(
                jnp.asarray(desc[i]),
                jnp.asarray(desc[j]),
                a_valid=jnp.asarray(valid[i]),
                b_valid=jnp.asarray(valid[j]),
            )
            oracle[i, j] = int(np.sum(np.asarray(res.indices) >= 0))
    np.testing.assert_array_equal(counts, oracle)
    # Paired frames should dominate their rows (loop-closure signal).
    off = counts.copy()
    np.fill_diagonal(off, -1)
    for i in range(k):
        partner = i + 1 if i % 2 == 0 else i - 1
        assert off[i].argmax() == partner


def test_ring_allpairs_jits_under_mesh(rng):
    k, n = 8, 16
    desc, valid = _fake_descriptors(rng, k, n)
    mesh = make_keyframe_mesh(4)
    f = jax.jit(
        lambda d, v: ring_allpairs_match_counts(d, v, mesh)
    )
    out = f(jnp.asarray(desc), jnp.asarray(valid))
    assert out.shape == (k, k)
    out2 = f(jnp.asarray(desc), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_shard_detect_data_parallel(rng):
    """Data-parallel detection over a sharded frame batch matches
    per-frame detection."""
    import jax
    from niftymatch_tpu import SiftConfig, make_detector
    from niftymatch_tpu.parallel import make_keyframe_mesh, shard_detect

    h, w = 48, 64
    cfg = SiftConfig(width=w, height=h, max_keypoints_per_level=32, max_features=64)
    det = make_detector(cfg)
    frames = rng.uniform(0, 255, size=(8, h, w)).astype(np.float32)
    mesh = make_keyframe_mesh(8)
    batched = shard_detect(det, jnp.asarray(frames), mesh)
    assert batched.x.shape[0] == 8
    # Compare one shard against direct detection.
    single = det(jnp.asarray(frames[3]))
    np.testing.assert_allclose(
        np.asarray(batched.x[3]), np.asarray(single.x), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(batched.valid[3]), np.asarray(single.valid)
    )


def test_multihost_helpers_single_process():
    from niftymatch_tpu.parallel import (
        initialize_distributed,
        local_batch_slice,
        make_hierarchical_mesh,
    )

    initialize_distributed()  # no-op single host
    mesh = make_hierarchical_mesh()
    assert mesh.shape["kf"] == len(jax.devices())
    mesh2 = make_hierarchical_mesh(host_axis="host")
    assert mesh2.shape["host"] == 1
    sl = local_batch_slice(16)
    assert sl == slice(0, 16)


def test_ring_allpairs_indices_nondivisible_oracle(rng):
    """Ring sweep v2: arbitrary K (padded internally) + per-pair match
    indices, mutual cross-check — against the dense single-device sweep
    and a per-pair oracle."""
    from niftymatch_tpu.ops.match import mutual_matches
    from niftymatch_tpu.parallel.matching import (
        allpairs_match,
        ring_allpairs_match,
    )

    k, n = 13, 24  # 13 % 8 != 0: exercises the padding path
    desc, valid = _fake_descriptors(rng, 14, n)
    desc, valid = desc[:k], valid[:k]
    mesh = make_keyframe_mesh(8)
    res = ring_allpairs_match(
        jnp.asarray(desc),
        jnp.asarray(valid),
        mesh,
        ambiguity=0.7,
        mutual=True,
        return_indices=True,
    )
    assert res.counts.shape == (k, k)
    assert res.indices.shape == (k, k, n)

    dense = allpairs_match(
        jnp.asarray(desc),
        jnp.asarray(valid),
        ambiguity=0.7,
        mutual=True,
        return_indices=True,
    )
    np.testing.assert_array_equal(np.asarray(res.counts), np.asarray(dense.counts))
    np.testing.assert_array_equal(
        np.asarray(res.indices), np.asarray(dense.indices)
    )

    # Spot-check two pairs against the direct matcher + mutual filter.
    for (i, j) in [(0, 1), (5, 12)]:
        fwd = match_descriptors(
            jnp.asarray(desc[i]), jnp.asarray(desc[j]), ambiguity=0.7,
            a_valid=jnp.asarray(valid[i]), b_valid=jnp.asarray(valid[j]),
        )
        bwd = match_descriptors(
            jnp.asarray(desc[j]), jnp.asarray(desc[i]), ambiguity=0.7,
            a_valid=jnp.asarray(valid[j]), b_valid=jnp.asarray(valid[i]),
        )
        oracle = np.asarray(mutual_matches(fwd, bwd))
        np.testing.assert_array_equal(np.asarray(res.indices[i, j]), oracle)
        assert int(res.counts[i, j]) == int(np.sum(oracle >= 0))


def test_allpairs_pallas_matches_oracle(rng):
    """The Pallas-swept all-pairs counts/indices == the jnp oracle sweep
    (interpret mode on CPU; the TPU tier runs the compiled kernel)."""
    from niftymatch_tpu.parallel.matching import (
        allpairs_match,
        allpairs_match_pallas,
    )

    K, N, D = 6, 64, 32
    desc = rng.normal(size=(K, N, D)).astype(np.float32)
    # plant cross-frame near-duplicates so the ratio test passes
    for k in range(1, K):
        desc[k, : N // 2] = desc[0, : N // 2] + 0.01 * rng.normal(
            size=(N // 2, D)
        ).astype(np.float32)
    valid = np.ones((K, N), bool)
    valid[:, -5:] = False

    for mutual in (False, True):
        ref = allpairs_match(
            jnp.asarray(desc), jnp.asarray(valid),
            ambiguity=0.8, mutual=mutual, return_indices=True,
        )
        got = allpairs_match_pallas(
            jnp.asarray(desc), jnp.asarray(valid),
            ambiguity=0.8, mutual=mutual, return_indices=True,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got.counts), np.asarray(ref.counts)
        )
        np.testing.assert_array_equal(
            np.asarray(got.indices), np.asarray(ref.indices)
        )
