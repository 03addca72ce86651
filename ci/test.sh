#!/usr/bin/env bash
# Fast test tier: everything not marked `slow`, on an 8-device CPU mesh
# (tests/conftest.py forces the mesh).  Budget: < 3 minutes warm (~2:00
# with 4 xdist workers on a 4-core host; ~5:15 on a cold compile cache —
# conftest enables a persistent XLA compile cache at tests/.jax_cache, so
# only the first run on a machine pays the compile storm).
# Mirrors the role of the reference's ci/test-linux.sh (CPU-only smoke run).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "not slow" -n "${PYTEST_WORKERS:-4}" "$@"
