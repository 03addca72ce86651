"""Round-5 done-bar audit: every VERDICT r4 target vs the committed JSONs.

Reads ONLY the committed artifact files (no hardware needed) and exits
non-zero if any bar fails — the same one-number-per-claim discipline the
reference's CI applies to its test log (``ci/test-linux.sh:4-11``).

Usage: python benchmarks/verify_bars.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    def load(name):
        with open(os.path.join(REPO, name)) as f:
            return json.load(f)

    checks = []
    d = load("ATE_r05.json")
    s, p, h, r = d["standard"], d["photo"], d["hard"], d["reloc"]
    c = d["caches"]
    checks += [
        ("VERDICT#1 standard >= 30 fps", s["frames_per_s"] >= 30,
         s["frames_per_s"]),
        ("VERDICT#1 closure <= 5 s", s["loop_closure_s"] <= 5,
         s["loop_closure_s"]),
        ("VERDICT#1 steady-state run self-identifies",
         c["run_index"] >= 3
         and c["aot_entries_at_end"] == c["aot_entries_at_start"],
         (c["run_index"], c["aot_entries_at_start"],
          c["aot_entries_at_end"])),
        ("VERDICT#2 hard final <= post-closure",
         h["ate_rmse_sim3"] <= h["ate_rmse_sim3_post_closure"],
         (h["ate_rmse_sim3"], h["ate_rmse_sim3_post_closure"])),
        ("VERDICT#2 reloc final <= pre-closure",
         r["ate_rmse_sim3"] <= r["ate_rmse_sim3_pre_closure"],
         (r["ate_rmse_sim3"], r["ate_rmse_sim3_pre_closure"])),
        ("VERDICT#3 reloc >= 25 fps", r["frames_per_s"] >= 25,
         r["frames_per_s"]),
        ("VERDICT#3 relocs >= 2", r["relocs"] >= 2, r["relocs"]),
        ("VERDICT#3 closure accepted (edges > 0)", r["loop_edges"] > 0,
         r["loop_edges"]),
        ("VERDICT#8 photo ATE%% <= 1.5x clean",
         p["ate_pct_of_extent"] <= 1.5 * s["ate_pct_of_extent"],
         (p["ate_pct_of_extent"], s["ate_pct_of_extent"])),
    ]

    m = load("MATCH_r05.json")
    rows = {(x["k"], x["mode"]): x["pct_roofline"] for x in m["rows"]}
    checks += [
        ("VERDICT#4 1k-batched (prepared) >= 50%% roofline",
         rows[(1024, "batched16_prepared")] >= 50,
         round(rows[(1024, "batched16_prepared")], 1)),
        ("VERDICT#4 4k (prepared batch) >= 70%% roofline",
         rows[(4096, "batched4_prepared")] >= 70,
         round(rows[(4096, "batched4_prepared")], 1)),
    ]

    g = load("GLOBAL_BA_r05.json")
    checks.append(
        ("VERDICT#5 chip obs/s >= r3 (1.62 M, same conditions)",
         g["tpu_single"]["obs_per_s"] >= 1.62,
         g["tpu_single"]["obs_per_s"]))

    sc = load("SCALING_r05.json")

    def monotone(tbl):
        ks = sorted(
            int(k) for k, v in tbl.items() if not v.get("oversubscribed")
        )
        sp = [tbl[str(k)]["speedup"] for k in ks]
        return all(a <= b for a, b in zip(sp, sp[1:]))

    checks += [
        ("VERDICT#6 dense BA monotone over reported range",
         monotone(sc["distributed_ba"]),
         {k: v["speedup"] for k, v in sc["distributed_ba"].items()}),
        ("VERDICT#6 CG monotone over non-oversubscribed range",
         monotone(sc["distributed_ba_cg"]),
         {k: v["speedup"] for k, v in sc["distributed_ba_cg"].items()}),
    ]

    e = load("EUROC_r05.json")
    checks.append(("config-4 EuRoC ATE < 2%% of extent",
                   e["ate_pct_of_extent"] < 2.0, e["ate_pct_of_extent"]))

    t = load("TPUTESTS_r05.json")
    checks.append(("hardware kernel tier green", t["ok"], t["summary"]))

    # Provenance: the accuracy artifacts carry the package-source hash
    # they were recorded under; recompute it from the tree so "artifact
    # reflects the final source" is machine-checked, not asserted
    # (VERDICT r4 weak #1 — three documents, three stories).
    sys.path.insert(0, REPO)
    from niftymatch_tpu.utils.aot import _package_hash

    tree = _package_hash()
    checks += [
        ("ATE artifact recorded at the tree's package hash",
         c.get("package_hash") == tree,
         (c.get("package_hash"), tree)),
        ("EuRoC artifact recorded at the tree's package hash",
         e.get("package_hash") == tree,
         (e.get("package_hash"), tree)),
    ]

    failed = 0
    for name, ok, val in checks:
        print(("PASS " if ok else "FAIL "), name, "->", val)
        failed += 0 if ok else 1
    print(f"{len(checks) - failed}/{len(checks)} bars met")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
