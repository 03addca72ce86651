#!/usr/bin/env bash
# Fast test tier: everything not marked `slow`, on an 8-device CPU mesh
# (tests/conftest.py forces the mesh).  Target budget: < 3 minutes.
# Mirrors the role of the reference's ci/test-linux.sh (CPU-only smoke run).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "not slow" "$@"
