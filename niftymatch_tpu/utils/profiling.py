"""Profiling / tracing harness (SURVEY.md §5 "Tracing / profiling").

The reference's only instrumentation is ``CudaTimer`` (cudaEvent pairs,
``src/gpu/utils/cudatimer.cu:3-22``).  Here:

* :func:`trace` — context manager around ``jax.profiler`` producing
  Perfetto/XProf traces viewable in TensorBoard or ui.perfetto.dev.
* :func:`annotate` — named trace region (shows up inside device traces).
* :func:`roofline` — analytic utilization report for a matmul-shaped op:
  measured wall time vs. MXU peak and HBM bandwidth bounds, the per-kernel
  accounting the match GEMM and BA Schur kernels are designed against.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

# TPU v5e per-chip peaks (public spec); used for utilization reporting only.
PEAKS = {
    "tpu v5 lite": {"bf16_flops": 197e12, "hbm_gbps": 819e9},
    "default": {"bf16_flops": 197e12, "hbm_gbps": 819e9},
}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/prof'): run()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for device traces (``jax.profiler.TraceAnnotation``)."""
    return jax.profiler.TraceAnnotation(name)


@dataclasses.dataclass
class RooflineReport:
    wall_s: float
    flops: float
    bytes_accessed: float
    achieved_tflops: float
    mxu_utilization: float      # vs bf16 peak
    achieved_gbps: float
    hbm_utilization: float
    compute_bound: bool         # arithmetic intensity above the ridge

    def __str__(self):
        side = "compute" if self.compute_bound else "memory"
        return (
            f"{self.achieved_tflops:.1f} TFLOP/s ({self.mxu_utilization:.0%} MXU), "
            f"{self.achieved_gbps / 1e9:.0f} GB/s ({self.hbm_utilization:.0%} HBM), "
            f"{side}-bound"
        )


def roofline(
    fn,
    args_sets,
    flops: float,
    bytes_accessed: float,
    iters: int = 20,
    device_kind: str | None = None,
) -> RooflineReport:
    """Measure ``fn`` over distinct arg sets and report roofline utilization.

    ``flops``/``bytes_accessed`` are per-call analytic counts supplied by
    the caller (e.g. 2*M*N*D for the match GEMM)."""
    from .timing import benchmark

    ms = benchmark(fn, args_sets, iters=iters)
    wall = ms / 1e3
    kind = device_kind or jax.devices()[0].device_kind.lower()
    peaks = PEAKS.get(kind, PEAKS["default"])
    achieved_flops = flops / wall
    achieved_bw = bytes_accessed / wall
    intensity = flops / max(bytes_accessed, 1.0)
    ridge = peaks["bf16_flops"] / peaks["hbm_gbps"]
    return RooflineReport(
        wall_s=wall,
        flops=flops,
        bytes_accessed=bytes_accessed,
        achieved_tflops=achieved_flops / 1e12,
        mxu_utilization=achieved_flops / peaks["bf16_flops"],
        achieved_gbps=achieved_bw,
        hbm_utilization=achieved_bw / peaks["hbm_gbps"],
        compute_bound=intensity > ridge,
    )
