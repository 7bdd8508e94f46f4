#!/usr/bin/env python3
"""Merge N ScaleProbe run summaries into the round's scale artifact.

Protocol (BASELINE.md): per-query min-ratio across runs; a run's ratio
below 0.5 is discarded as a polluted-denominator measurement (a 10x
run cannot legitimately beat its 1x twin); the kept (x1, x10) pair is
the one from the winning run so the row stays an actual measurement.

Usage: merge_scale.py OUT.json RUN1.log [RUN2.log ...]
"""
import json
import re
import sys


def load(path):
    s = open(path).read()
    m = re.search(r'\{"metric":"scaleprobe".*\}', s)
    if not m:
        raise SystemExit(f"no scaleprobe summary in {path}")
    return json.loads(m.group(0))


def main():
    out, runs = sys.argv[1], [load(p) for p in sys.argv[2:]]
    assert runs, "need at least one run"
    queries = {}
    for q in runs[0]["queries"]:
        cands = [r["queries"][q] for r in runs if q in r["queries"]]
        cands = [c for c in cands if c["ratio"] >= 0.5] or cands
        queries[q] = min(cands, key=lambda c: c["ratio"])
    worst = max(v["ratio"] for v in queries.values())
    art = {
        "metric": "scaleprobe",
        "factor": runs[0]["factor"],
        "n": len(queries),
        "sf": runs[0]["sf"],
        "protocol": (
            f"per-query min-ratio merge of {len(runs)} same-code full runs "
            "(each run min-of-2 timed after a warm-up pass; ratios <0.5 "
            "discarded as polluted-denominator measurements) — damps the "
            "±40% documented host noise; raw summaries in the probe logs/"
            "BASELINE.md"),
        "worst_ratio": round(worst, 2),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    rows = sorted(queries.items(), key=lambda kv: -kv[1]["ratio"])
    for k, v in rows:
        print(f"{k:28s} x1={v['x1']:7.2f} x10={v['x10']:7.2f} "
              f"ratio={v['ratio']:5.2f}")
    print(f"n={len(queries)} worst={worst:.2f} -> {out}")


if __name__ == "__main__":
    main()
