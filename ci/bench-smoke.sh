#!/usr/bin/env bash
# Benchmark smoke: compile-check the round benchmark's pipeline on CPU with
# a tiny workload (no TPU in CI).  Catches import/trace regressions in
# bench.py without paying TPU compile times.
set -euo pipefail
cd "$(dirname "$0")/.."
JAX_PLATFORMS=cpu python - <<'EOF'
import numpy as np, jax.numpy as jnp
from niftymatch_tpu import PipelineConfig, SiftConfig, make_pair_pipeline
h, w = 96, 128
rng = np.random.default_rng(0)
img = rng.uniform(0, 255, (h, w)).astype(np.float32)
run = make_pair_pipeline(PipelineConfig(sift=SiftConfig(width=w, height=h)))
fa, fb, m = run(jnp.asarray(img), jnp.asarray(img))
assert m.indices.shape[0] == fa.x.shape[0]
print("bench smoke ok:", m.indices.shape)
EOF
