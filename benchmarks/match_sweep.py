"""Descriptor-match kernel sweep: pairs/s + roofline utilisation vs set size.

Measures the fused Pallas match kernel (``pallas/match.py``) at
K x K x 128 for K in {1k, 4k, 16k, 32k} on the real chip and reports, per
point, pairs/s and % of the min(MXU, HBM) speed-of-light roofline
(BASELINE "descriptor match pairs/s"; reference anchor
``/root/reference/src/gpu/kernels/match.cu:13-80``).

Timing methodology (the axon tunnel makes this non-trivial):
- every dispatch gets a DISTINCT input buffer — the runtime memoises
  whole executions keyed on (executable, buffers);
- a lax.scan with a real inter-iteration data dependence repeats the
  kernel in-program so per-kernel time is measured at steady state;
- per-kernel time is the least-squares SLOPE across three rep counts,
  which cancels the fixed ~40-70 ms per-dispatch round-trip exactly;
- results are fetched to host (fetch-forced).

Small K (1k, 4k) is additionally measured in BATCHED form (vmap over
pairs) because that is the real workload shape there: the O(K^2) ring
sweep and SLAM chunk pipeline match many small pairs per dispatch, and a
single small pair cannot amortise per-kernel fixed costs on any backend.

Writes MATCH_r{N}.json at the repo root when run with --write (round
from GRAFT_ROUND or --out-round; rows are flushed to disk per point as
they complete, so a partial run still leaves a valid artifact).

Expected wall time on the tunnelled v5e: ~20-30 min for the default
4-size sweep (each point compiles 3 scan programs through the remote-
compile tunnel; the FIRST dispatch of a large program can stall for
minutes — a 4096^2 first execution was once observed to take 265 s —
before steady-state millisecond dispatches).  Use --quick for a ~3x
faster, slightly noisier sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from niftymatch_tpu.pallas.match import (
    fused_match_topk, fused_match_topk_prepared, prepare_descriptors)

# v5e (v5 lite) per-chip peaks.
MXU_BF16 = 197e12   # FLOP/s
MXU_FP32 = 49e12    # FLOP/s (fp32 emulation ~ 1/4 of bf16)
HBM_BW = 819e9      # B/s


def roofline_s(m: int, n: int, d: int, bf16: bool) -> float:
    """Speed-of-light seconds: each descriptor read once, FLOPs at MXU peak."""
    flops = 2.0 * m * n * d
    in_bytes = (m + n) * d * (2 if bf16 else 4)
    out_bytes = m * 12
    mxu = MXU_BF16 if bf16 else MXU_FP32
    return max(flops / mxu, (in_bytes + out_bytes) / HBM_BW)


def _slope(run_maker, fresh, fetch0, flops_per_rep, calls=5, max_delta=None):
    """Least-squares slope of wall time vs in-program rep count.

    ``max_delta`` caps the rep spacing: the default targets ~0.3 s of
    in-program work per call, which at small K means 100k+-iteration
    scans — fine for the committed sweep artifact, needlessly slow for
    exploratory microbenchmarks."""
    t_est = flops_per_rep / 120e12
    delta = max(12, int(0.3 / t_est))
    if max_delta is not None:
        delta = min(delta, max_delta)
    r0 = max(4, delta // 4)
    rs = [r0, r0 + delta, r0 + 2 * delta]
    runs = [run_maker(r) for r in rs]
    for run in runs:  # compile + warm
        np.asarray(jax.block_until_ready(fetch0(run(fresh()))))
    meds = []
    for run in runs:
        ts = []
        for _ in range(calls):
            a_i = fresh()
            t0 = time.perf_counter()
            out = run(a_i)
            np.asarray(fetch0(out))  # fetch-forced
            ts.append(time.perf_counter() - t0)
        meds.append(np.median(ts))
    return float(np.polyfit(np.asarray(rs, float), np.asarray(meds), 1)[0])


def bench_single(k: int, d: int, bf16: bool, seed: int = 0,
                 tm: int | None = None, tn: int | None = None,
                 mc: int | None = None, max_delta: int | None = None):
    """Steady-state per-pair kernel time on PREPARED descriptors (the K^2
    sweep shape: prepare once per keyframe, match K^2 times).  The scan
    perturbs the B-norm vector with the previous iteration's result —
    an O(N) data dependence that prevents hoisting without re-running
    the O(N*D) preparation passes each iteration."""
    rng = np.random.default_rng(seed)
    b = jnp.asarray(rng.random((k, d), np.float32))
    pb = jax.block_until_ready(prepare_descriptors(b, bf16=bf16))
    kw = {}
    if tm is not None:
        kw["tm"] = tm
    if tn is not None:
        kw["tn"] = tn
    if mc is not None:
        kw["mc"] = mc

    def run_maker(reps):
        @jax.jit
        def run(a):
            pa = prepare_descriptors(a, bf16=bf16)

            def body(c, _):
                pb_i = (pb[0], pb[1], pb[2] + c * 1e-20)
                m1, i1, m2 = fused_match_topk_prepared(pa, pb_i, **kw)
                return m1[:k], (m1[0], i1[0])
            _, outs = jax.lax.scan(body, jnp.zeros((k,), jnp.float32),
                                   None, length=reps)
            return outs
        return run

    def fresh():
        return jax.block_until_ready(
            jnp.asarray(rng.random((k, d), np.float32)))

    t = _slope(run_maker, fresh, lambda o: o[0], 2.0 * k * k * d,
               max_delta=max_delta)
    return _row(k, d, bf16, t, mode="single")


def bench_batched_prepared(k: int, d: int, nb: int, bf16: bool,
                           seed: int = 0):
    """Steady-state per-pair time for a BATCH of prepared pairs — the
    production K^2-sweep regime (prepare once per keyframe, match every
    pair; ``parallel/matching.py`` batches pairs exactly like this).

    ``bench_batched`` measures the unprepared entry path: its per-rep
    cast/norm/perturb passes over the full (nb, K, D) batch are real
    work, but work the sweep pays once per KEYFRAME, not once per PAIR —
    at 1k it was ~25% of the measured time (VERDICT r4 #4's 38.2% row).
    This row isolates what the sweep actually pays per pair."""
    rng = np.random.default_rng(seed)
    pas = [prepare_descriptors(
        jnp.asarray(rng.random((k, d), np.float32)), bf16=bf16)
        for _ in range(nb)]
    pbs = [prepare_descriptors(
        jnp.asarray(rng.random((k, d), np.float32)), bf16=bf16)
        for _ in range(nb)]
    pa = jax.tree.map(lambda *x: jnp.stack(x), *pas)
    pb = jax.tree.map(lambda *x: jnp.stack(x), *pbs)
    vf = jax.vmap(
        lambda a2, am, an, b2, bm, bn: fused_match_topk_prepared(
            (a2, am, an), (b2, bm, bn)
        )
    )

    def run_maker(reps):
        @jax.jit
        def run(bn0):
            def body(c, _):
                m1, i1, m2 = vf(pa[0], pa[1], pa[2],
                                pb[0], pb[1], bn0 + c * 1e-20)
                return m1, m1[0, 0]
            _, outs = jax.lax.scan(body, jnp.zeros((nb, k), jnp.float32),
                                   None, length=reps)
            return outs
        return run

    def fresh():
        return jax.block_until_ready(
            pb[2] + jnp.asarray(rng.random((nb, 1), np.float32) * 1e-9))

    t = _slope(run_maker, fresh, lambda o: o, 2.0 * nb * k * k * d)
    return _row(k, d, bf16, t / nb, mode=f"batched{nb}_prepared")


def bench_batched(k: int, d: int, nb: int, bf16: bool, seed: int = 0):
    rng = np.random.default_rng(seed)
    bs = jnp.asarray(rng.random((nb, k, d), np.float32))
    vf = jax.vmap(lambda a, b: fused_match_topk(a, b, bf16=bf16))

    def run_maker(reps):
        @jax.jit
        def run(a):
            def body(c, _):
                m1, i1, m2 = vf(a + c[:, :, None] * 1e-20, bs)
                return m1, m1[0, 0]
            _, outs = jax.lax.scan(body, jnp.zeros((nb, k), jnp.float32),
                                   None, length=reps)
            return outs
        return run

    def fresh():
        return jax.block_until_ready(
            jnp.asarray(rng.random((nb, k, d), np.float32)))

    t = _slope(run_maker, fresh, lambda o: o, 2.0 * nb * k * k * d)
    return _row(k, d, bf16, t / nb, mode=f"batched{nb}")


def _row(k, d, bf16, t, mode):
    sol = roofline_s(k, k, d, bf16)
    return {
        "k": k,
        "d": d,
        "mode": mode,
        "precision": "bf16" if bf16 else "fp32",
        "time_s": t,
        "pairs_per_s": k * k / t,
        "tflops": 2.0 * k * k * d / t / 1e12,
        "roofline_s": sol,
        "pct_roofline": 100.0 * sol / t,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1024, 4096, 16384, 32768])
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--tm", type=int, default=None)
    ap.add_argument("--tn", type=int, default=None)
    ap.add_argument("--mc", type=int, default=None)
    ap.add_argument("--quick", action="store_true",
                    help="small rep counts for tile tuning")
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--out-round", type=int,
                    default=int(os.environ.get("GRAFT_ROUND", 4)))
    args = ap.parse_args()

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"MATCH_r{args.out_round:02d}.json")
    t_start = time.time()

    def flush(rows):
        if not args.write:
            return
        out = {
            "device": str(jax.devices()[0]),
            "mxu_bf16_flops": MXU_BF16,
            "mxu_fp32_flops": MXU_FP32,
            "hbm_bw": HBM_BW,
            "method": "3-point slope over in-program rep counts; distinct "
                      "buffers per dispatch; fetch-forced",
            "note": "pct_roofline counts GEMM FLOPs only.  batchedN rows "
                    "run the UNPREPARED entry path (per-rep cast/norm over "
                    "the whole batch — paid once per KEYFRAME in the real "
                    "sweep); batchedN_prepared rows measure the production "
                    "K^2-sweep regime (prepare once, match every pair).  "
                    "FOLD_MICRO*.json decomposes the remaining gap against "
                    "a DCE-proof 'rowsum' floor (full-row consume, VERDICT "
                    "r4 #4): the top-2+index fold is the residual cost; 8 "
                    "fold variants measured (argmin lowering, tournament, "
                    "packed-slot, bf16, software-pipelined) all lose to "
                    "the production eq/iota fold — the VPU fold does NOT "
                    "dual-issue with the MXU stream on this chip.",
            "partial_wall_s": round(time.time() - t_start, 1),
            "rows": rows,
        }
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    rows = []
    for k in args.sizes:
        row = bench_single(k, args.d, True, tm=args.tm, tn=args.tn,
                           mc=args.mc,
                           max_delta=1024 if args.quick else None)
        rows.append(row)
        print(json.dumps(row))
        flush(rows)
        if k <= 4096:  # real small-K workloads are batched (ring sweep)
            nb = max(2, 16384 // k)
            row = bench_batched(k, args.d, nb, True)
            rows.append(row)
            print(json.dumps(row))
            flush(rows)
            row = bench_batched_prepared(k, args.d, nb, True)
            rows.append(row)
            print(json.dumps(row))
            flush(rows)
        if args.fp32:
            row = bench_single(k, args.d, False, tm=args.tm, tn=args.tn)
            rows.append(row)
            print(json.dumps(row))
            flush(rows)

    if args.write:
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
