#!/usr/bin/env bash
# TPU hardware tier: the Pallas kernels' oracle-equivalence tests on a real
# chip (the compiled kernels, not interpret mode), plus a bench smoke.
# Mirrors the role of the reference's hardware-tagged CI jobs
# (.gitlab-ci.yml: `tags: [cuda]` runners) — the fast/full tiers run on the
# CPU mesh and never execute the Mosaic-compiled kernels, so without this
# tier the flagship detection/matching fast paths would only ever be
# machine-checked in interpret mode.
#
# Writes TPUTESTS_r${GRAFT_ROUND:-0}.json at the repo root with the result.
set -uo pipefail
cd "$(dirname "$0")/.."

ROUND=$(printf "%02d" "${GRAFT_ROUND:-3}")
OUT="TPUTESTS_r${ROUND}.json"
START=$(date +%s)

NIFTYMATCH_TEST_TPU=1 python -m pytest \
    tests/test_pallas_match.py tests/test_pallas_windows.py \
    -q --tb=line 2>&1 | tee /tmp/tpu_tier.log
STATUS=${PIPESTATUS[0]}

SUMMARY=$(grep -E "[0-9]+ (passed|failed)" /tmp/tpu_tier.log | tail -1 | tr -d '\n')
WALL=$(( $(date +%s) - START ))

python - "$STATUS" "$SUMMARY" "$WALL" "$OUT" <<'EOF'
import json, sys
status, summary, wall, out = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), sys.argv[4]
json.dump(
    {"ok": status == 0, "summary": summary.strip(), "wall_s": wall,
     "suite": "NIFTYMATCH_TEST_TPU=1 pytest tests/test_pallas_match.py "
              "tests/test_pallas_windows.py"},
    open(out, "w"), indent=1)
print("wrote", out)
EOF
exit "$STATUS"
