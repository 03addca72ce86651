"""Fused Pallas match kernel vs. the jnp oracle (interpret mode on CPU).

The oracle relationship mirrors the reference's `_naive` kernels
(SURVEY.md §4): ``ops.match`` is the ground truth, the Pallas kernel must
agree exactly (fp32 path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from niftymatch_tpu.ops.match import match_descriptors, pairwise_sq_distances, top2_min
from niftymatch_tpu.pallas.match import fused_match_topk, match_descriptors_pallas


def _descs(rng, m, n, d=128):
    a = rng.normal(size=(m, d)).astype(np.float32)
    b = rng.normal(size=(n, d)).astype(np.float32)
    # Plant exact near-duplicates so some rows pass the ratio test.
    k = min(m, n) // 2
    b[:k] = a[:k] + 0.01 * rng.normal(size=(k, d)).astype(np.float32)
    return a, b


@pytest.mark.parametrize("m,n", [(64, 64), (100, 200), (300, 77), (33, 500)])
def test_fused_topk_matches_oracle(rng, m, n):
    a, b = _descs(rng, m, n)
    min1, idx1, min2 = fused_match_topk(
        jnp.asarray(a), jnp.asarray(b), tm=64, tn=64, interpret=True
    )
    d = pairwise_sq_distances(jnp.asarray(a), jnp.asarray(b))
    o1, oi, o2 = top2_min(d)
    np.testing.assert_allclose(np.asarray(min1), np.asarray(o1), atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(min2), np.asarray(o2), atol=1e-3, rtol=1e-5)
    # Indices must agree wherever the min is unique to fp32 tolerance.
    gap = np.asarray(o2) - np.asarray(o1)
    unique = gap > 1e-3
    np.testing.assert_array_equal(np.asarray(idx1)[unique], np.asarray(oi)[unique])


def test_fused_topk_respects_b_validity(rng):
    a, b = _descs(rng, 48, 96)
    bv = np.ones(96, bool)
    bv[40:] = False
    min1, idx1, min2 = fused_match_topk(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(bv), tm=64, tn=64, interpret=True
    )
    assert np.asarray(idx1).max() < 40
    d = pairwise_sq_distances(jnp.asarray(a), jnp.asarray(b[:40]))
    o1, oi, o2 = top2_min(d)
    np.testing.assert_allclose(np.asarray(min1), np.asarray(o1), atol=1e-3, rtol=1e-5)


def test_match_descriptors_pallas_end_to_end(rng):
    a, b = _descs(rng, 128, 128)
    av = np.ones(128, bool)
    av[-10:] = False
    bv = np.ones(128, bool)
    bv[-7:] = False
    res_p = match_descriptors_pallas(
        jnp.asarray(a), jnp.asarray(b),
        a_valid=jnp.asarray(av), b_valid=jnp.asarray(bv),
        interpret=True,
    )
    res_o = match_descriptors(
        jnp.asarray(a), jnp.asarray(b),
        a_valid=jnp.asarray(av), b_valid=jnp.asarray(bv),
    )
    np.testing.assert_array_equal(np.asarray(res_p.indices), np.asarray(res_o.indices))
    matched = np.asarray(res_o.indices) >= 0
    np.testing.assert_allclose(
        np.asarray(res_p.distances)[matched],
        np.asarray(res_o.distances)[matched],
        atol=1e-3, rtol=1e-5,
    )


def test_fused_topk_single_tile_and_ragged(rng):
    # Sizes far from tile multiples exercise padding.
    a, b = _descs(rng, 5, 3)
    min1, idx1, min2 = fused_match_topk(
        jnp.asarray(a), jnp.asarray(b), tm=8, tn=8, interpret=True
    )
    d = pairwise_sq_distances(jnp.asarray(a), jnp.asarray(b))
    o1, oi, o2 = top2_min(d)
    np.testing.assert_allclose(np.asarray(min1), np.asarray(o1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(min2), np.asarray(o2), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(oi))


# --- TPU-hardware tests (real compiled kernel, not interpret mode) ------
import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs a real TPU (run with NIFTYMATCH_TEST_TPU=1)",
)


@requires_tpu
def test_fused_topk_hardware_fp32_vs_oracle(rng):
    """The compiled kernel with production (shape-adaptive) tiles must
    agree with the jnp oracle on hardware — fp32 path, ragged sizes."""
    a, b = _descs(rng, 3000, 5000)
    min1, idx1, min2 = fused_match_topk(jnp.asarray(a), jnp.asarray(b))
    d = pairwise_sq_distances(jnp.asarray(a), jnp.asarray(b))
    o1, oi, o2 = top2_min(d)
    np.testing.assert_allclose(np.asarray(min1), np.asarray(o1),
                               atol=2e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(min2), np.asarray(o2),
                               atol=2e-3, rtol=1e-5)
    gap = np.asarray(o2) - np.asarray(o1)
    unique = gap > 1e-3
    np.testing.assert_array_equal(np.asarray(idx1)[unique],
                                  np.asarray(oi)[unique])


@requires_tpu
def test_fused_topk_hardware_bf16_index_agreement(rng):
    """bf16 fast path: indices must agree with the oracle wherever the
    top-2 gap clears the bf16 noise floor (relative ~2^-7 of magnitude)."""
    a, b = _descs(rng, 4096, 4096)
    min1, idx1, min2 = fused_match_topk(jnp.asarray(a), jnp.asarray(b),
                                        bf16=True)
    d = pairwise_sq_distances(jnp.asarray(a), jnp.asarray(b))
    o1, oi, o2 = top2_min(d)
    o1n, o2n = np.asarray(o1), np.asarray(o2)
    clear = (o2n - o1n) > 2e-2 * np.maximum(np.abs(o1n), np.abs(o2n))
    agree = np.mean(np.asarray(idx1)[clear] == np.asarray(oi)[clear])
    assert agree > 0.999, f"bf16 index agreement {agree:.4f}"
    np.testing.assert_allclose(np.asarray(min1), o1n,
                               rtol=0.05, atol=0.5)


@requires_tpu
def test_allpairs_pallas_sweep_hardware(rng):
    """The fused-kernel all-pairs sweep (bf16, compiled) agrees with the
    jnp oracle sweep on counts to within ratio-test noise on hardware."""
    from niftymatch_tpu.parallel.matching import (
        allpairs_match,
        allpairs_match_pallas,
    )

    K, N, D = 12, 256, 128
    desc = rng.normal(size=(K, N, D)).astype(np.float32)
    for k in range(1, K):
        desc[k, : N // 2] = desc[0, : N // 2] + 0.01 * rng.normal(
            size=(N // 2, D)
        ).astype(np.float32)
    valid = np.ones((K, N), bool)
    ref = np.asarray(
        allpairs_match(jnp.asarray(desc), jnp.asarray(valid),
                       ambiguity=0.7, mutual=True).counts
    )
    got = np.asarray(
        allpairs_match_pallas(jnp.asarray(desc), jnp.asarray(valid),
                              ambiguity=0.7, mutual=True,
                              precision="bf16").counts
    )
    # bf16 can flip matches whose ratio sits at the threshold; counts must
    # agree closely, not exactly.
    assert np.abs(ref - got).max() <= max(2, int(0.03 * ref.max()))


def test_prepared_path_identical_to_direct(rng):
    """fused_match_topk_prepared(prepare_descriptors(...)) must equal the
    direct fused_match_topk call bit-for-bit (fp32, interpret mode)."""
    from niftymatch_tpu.pallas.match import (
        fused_match_topk_prepared,
        prepare_descriptors,
    )

    a, b = _descs(rng, 100, 200)
    r1 = fused_match_topk(jnp.asarray(a), jnp.asarray(b),
                          tm=64, tn=64, interpret=True)
    pa = prepare_descriptors(jnp.asarray(a), bf16=False)
    pb = prepare_descriptors(jnp.asarray(b), bf16=False)
    r2 = fused_match_topk_prepared(pa, pb, tm=64, tn=64, interpret=True)
    for x, y in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
