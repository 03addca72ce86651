"""Profiling/roofline harness tests (CPU: utilization numbers are
meaningless but the accounting paths must run)."""

import numpy as np
import jax
import jax.numpy as jnp

from niftymatch_tpu.utils import annotate, roofline


def test_roofline_report(rng):
    M = N = K = 256
    a = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    f = jax.jit(lambda a, b: a @ b)
    rep = roofline(
        f,
        [(a, b)],
        flops=2 * M * N * K,
        bytes_accessed=4 * (M * K + K * N + M * N),
        iters=3,
    )
    assert rep.wall_s > 0
    assert rep.achieved_tflops > 0
    assert 0 <= rep.mxu_utilization
    assert isinstance(str(rep), str) and "TFLOP/s" in str(rep)


def test_annotate_context():
    with annotate("test-region"):
        x = jnp.ones((8, 8)) * 2
    assert float(x.sum()) == 128.0
