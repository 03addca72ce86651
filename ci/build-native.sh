#!/usr/bin/env bash
# Build + validate the native C++ PNG decode/prefetch library.  The loader
# builds on demand at import, and its tests/artifact consumers silently
# fall back to the pure-Python decoder when the build fails — so CI must
# assert the native path actually works (mirrors the reference's
# build-linux.sh stage preceding its tests).
set -euo pipefail
cd "$(dirname "$0")/.."
make -C native
python - <<'PY'
from niftymatch_tpu.data import native_loader
assert native_loader.available(), "native loader built but not loadable"
print("native loader ok:", native_loader.__name__)
PY
