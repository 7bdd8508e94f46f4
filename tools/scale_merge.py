#!/usr/bin/env python3
"""Merge N ScaleProbe run summaries into the round's scale artifact
(the BENCH_r{N}_scale.json protocol, established round 8/9): per-query
min-ratio across runs (each run is already min-of-2 timed after a
warm-up pass). x1/x10 are taken from the SAME run that produced the
selected min ratio, so x10/x1 reproduces the reported ratio and the
artifact stays internally consistent for auditing (ADVICE r10).

Pollution guards, BOTH directions (round 12 — a stall can flatter
either side of the fraction):
  - ratio < 0.5: a host stall inflated the 1x sample so far the 10x
    run "beats" it — fake speedup, discarded;
  - x1 > 2 x median(x1 across runs): a stalled 1x side deflates the
    ratio while still reading ratio >= 0.5 (observed live: a
    pagerank_edges sample read ratio 1.64 off a 17.75 s 1x where every
    other run's 1x was 6.5-8.1 s) — discarded unless it is the only
    sample. The median is per query, so slow queries are not punished.
    The reference median is computed over the RATIO-CLEAN samples only
    (a ratio<0.5-polluted run has a stalled x1 by construction, and
    letting it into the median weakens the guard exactly when it is
    needed), and the guard is marked INACTIVE for queries with <3
    clean samples — with 2 samples max(x1) <= 2*median(x1) always
    holds, so its silence there is vacuous, not a clean bill
    (ADVICE r12).

Usage: scale_merge.py OUT.json RUN_SUMMARY.json...
"""
import json
import statistics
import sys

out, paths = sys.argv[1], sys.argv[2:]
runs = [json.load(open(p)) for p in paths]
queries = {}
dropped = []
guard_inactive = []
for k in sorted({q for r in runs for q in r["queries"]}):
    samples = [r["queries"][k] for r in runs if k in r["queries"]]
    ratio_clean = [s for s in samples if s["ratio"] >= 0.5]
    # the stall guard references the median of the ratio-CLEAN x1s
    # (a ratio<0.5 sample has a stalled x1 by construction); with <3
    # clean samples the max<=2*median inequality is vacuous for n=2
    # and meaningless for n=1, so the guard is marked inactive rather
    # than silently "passing"
    if len(ratio_clean) >= 3:
        med_x1 = statistics.median(s["x1"] for s in ratio_clean)
        clean = [s for s in ratio_clean if s["x1"] <= 2 * med_x1]
    else:
        med_x1 = None
        clean = ratio_clean
        guard_inactive.append(k)
    if not clean:
        clean = samples  # every sample polluted: raw min, flagged
        dropped.append(f"{k}: ALL samples polluted, raw min kept")
    elif len(clean) < len(samples):
        med_note = (f"x1 > 2x clean-median {med_x1:.2f}s"
                    if med_x1 is not None else "stall guard inactive")
        dropped.append(
            f"{k}: {len(samples) - len(clean)} sample(s) discarded "
            f"(ratio<0.5 or {med_note})")
    best = min(clean, key=lambda s: s["ratio"])
    # the big-side key is factor-dependent ("x10", "x30", ...): carry
    # it through verbatim so the artifact stays auditable at any factor
    xbig = next(kk for kk in best if kk.startswith("x") and kk != "x1")
    queries[k] = {
        "x1": round(best["x1"], 3),
        xbig: round(best[xbig], 3),
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
        "(each run min-of-2 timed after a warm-up pass; samples with "
        "ratio <0.5 OR x1 > 2x the per-query median x1 discarded as "
        "polluted — a host stall can flatter either side of the "
        "fraction; the stall guard's median is over ratio-clean "
        "samples and inactive below 3 of them) — damps the documented "
        "host noise; raw summaries in the probe logs/BASELINE.md"),
    "worst_ratio": max(v["ratio"] for v in queries.values()),
    "stall_guard_inactive": sorted(guard_inactive),
    "queries": queries,
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"{out}: n={artifact['n']} worst={artifact['worst_ratio']}")
for note in dropped:
    print(f"  [dropped] {note}")
for k, v in sorted(queries.items(), key=lambda kv: -kv[1]["ratio"])[:8]:
    print(f"  {k:28s} {v['ratio']:5.2f}")
