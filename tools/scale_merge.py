#!/usr/bin/env python3
"""Merge N ScaleProbe run summaries into the round's scale artifact
(the BENCH_r{N}_scale.json protocol, established round 8/9): per-query
min-ratio across runs (each run is already min-of-2 timed after a
warm-up pass), ratios < 0.5 discarded as polluted-denominator
measurements (a host stall inflating the 1x sample reads as a fake
speedup). x1/x10 are taken from the SAME run that produced the
selected min ratio, so x10/x1 reproduces the reported ratio and the
artifact stays internally consistent for auditing (ADVICE r10).

Usage: scale_merge.py OUT.json RUN_SUMMARY.json...
"""
import json
import sys

out, paths = sys.argv[1], sys.argv[2:]
runs = [json.load(open(p)) for p in paths]
queries = {}
for k in sorted({q for r in runs for q in r["queries"]}):
    samples = [r["queries"][k] for r in runs if k in r["queries"]]
    clean = [s for s in samples if s["ratio"] >= 0.5]
    pool = clean if clean else samples  # every sample polluted: raw min
    best = min(pool, key=lambda s: s["ratio"])
    queries[k] = {
        "x1": round(best["x1"], 3),
        "x10": round(best["x10"], 3),
        "ratio": round(best["ratio"], 2),
    }
base = runs[0]
artifact = {
    "metric": "scaleprobe",
    "factor": base["factor"],
    "n": len(queries),
    "sf": base["sf"],
    "protocol": (
        f"per-query min-ratio merge of {len(runs)} same-code full runs "
        "(each run min-of-2 timed after a warm-up pass; ratios <0.5 "
        "discarded as polluted-denominator measurements) — damps the "
        "±40% documented host noise; raw summaries in the probe "
        "logs/BASELINE.md"),
    "worst_ratio": max(v["ratio"] for v in queries.values()),
    "queries": queries,
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"{out}: n={artifact['n']} worst={artifact['worst_ratio']}")
for k, v in sorted(queries.items(), key=lambda kv: -kv[1]["ratio"])[:8]:
    print(f"  {k:28s} {v['ratio']:5.2f}")
