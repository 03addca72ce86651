#!/usr/bin/env bash
# Fast test tier: everything not marked `slow`, on an 8-device CPU mesh
# (tests/conftest.py forces the mesh).  Budget: < 3 minutes (~2:10 with
# 4 xdist workers on a 4-core host; compile time dominates, so worker
# parallelism is near-linear).
# Mirrors the role of the reference's ci/test-linux.sh (CPU-only smoke run).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "not slow" -n "${PYTEST_WORKERS:-4}" "$@"
