"""Test configuration: force an 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4: multi-host tests via
``xla_force_host_platform_device_count`` CPU-mesh simulation)."""

import os

# Must run before jax is imported anywhere.  NIFTYMATCH_TEST_TPU=1 leaves
# the default backend alone so the TPU-gated kernel tests
# (test_pallas_windows.py, test_pallas_match.py TPU paths) can run on a
# real chip: `NIFTYMATCH_TEST_TPU=1 pytest tests/test_pallas_windows.py`.
_USE_TPU = os.environ.get("NIFTYMATCH_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache shared by all workers/runs: the suite is
# compile-bound (XLA:CPU LLVM codegen dominates wall time), and jitted
# graphs are identical across runs, so warm reruns skip the compile storm
# entirely.  Safe under xdist (the cache uses atomic renames).  Disable
# with NIFTYMATCH_TEST_NO_CACHE=1 when hunting compiler issues.
if os.environ.get("NIFTYMATCH_TEST_NO_CACHE") != "1":
    _cache = os.environ.get(
        "NIFTYMATCH_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped so every test draws the same deterministic stream
    # regardless of execution order/selection.
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def test_image():
    """A structured synthetic 128x96 image with blobs at known positions."""
    rng = np.random.default_rng(42)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    blobs = [(24.0, 32.0, 3.0, 200.0), (48.0, 80.0, 5.0, 180.0), (70.0, 40.0, 2.5, 220.0)]
    for (by, bx, bs, amp) in blobs:
        img += amp * np.exp(-((yy - by) ** 2 + (xx - bx) ** 2) / (2 * bs**2))
    img += rng.normal(0.0, 1.0, (h, w)).astype(np.float32)
    return img
