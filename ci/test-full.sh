#!/usr/bin/env bash
# Full test tier: fast tests PLUS the slow end-to-end SLAM/dataset runs.
# Budget: ~10-12 minutes on an 8-core host (the three SLAM e2e files
# dominate).  Run nightly / pre-release; ci/test.sh is the per-commit gate.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "slow or not slow" -n "${PYTEST_WORKERS:-4}" "$@"
