"""Device timing harness — the ``CudaTimer`` equivalent.

The reference wraps cudaEvent pairs (``src/gpu/utils/cudatimer.cu:3-22``);
on TPU the analogue is wall-clock around ``jax.block_until_ready`` with
warm-up to exclude compilation, plus distinct-input cycling (repeated
identical dispatches can be cached by runtimes and overstate throughput)."""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax


class Timer:
    """Context-manager timer that blocks on a result before stopping.

    >>> with Timer() as t:
    ...     out = fn(x)
    ...     t.block_on(out)
    >>> t.elapsed_ms
    """

    def __enter__(self):
        self._start = time.perf_counter()
        self.elapsed_ms = None
        return self

    def block_on(self, value):
        self._value = value
        return value

    def __exit__(self, *exc):
        if getattr(self, "_value", None) is not None:
            jax.block_until_ready(self._value)
        self.elapsed_ms = (time.perf_counter() - self._start) * 1e3
        return False


def benchmark(
    fn: Callable,
    args_sets: Sequence[tuple],
    warmup: int = 2,
    iters: int = 20,
) -> float:
    """Mean wall time per call (ms), cycling over distinct argument sets."""
    n = len(args_sets)
    outs = [fn(*args_sets[i % n]) for i in range(max(warmup, 1))]
    jax.block_until_ready(outs)
    start = time.perf_counter()
    outs = [fn(*args_sets[i % n]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - start) / iters * 1e3
