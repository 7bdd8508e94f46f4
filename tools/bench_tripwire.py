#!/usr/bin/env python3
"""Per-query bench regression tripwire (VERDICT r8 task 8): compare a
fresh Bench JSON line against the previous round's and flag movers, so
10-second surprises are caught by the builder at round close, not by
the judge. Usage:

    tools/bench_tripwire.py BENCH_new.json BENCH_prev.json [ratio]

Exit 1 if any query regressed by more than `ratio` (default 2.0) AND
by more than 0.5 s absolute (the host's scheduling floor makes pure
ratios on 0.1 s queries meaningless). New/removed queries are listed
informationally and never fail the gate."""
import json
import re
import sys


def load_queries(path):
    """Accept either a Bench stdout line ({"queries": {...}}) or the
    driver's BENCH_r{N}.json wrapper, whose `tail`/`parsed` fields may
    hold only a truncated fragment — recover whatever "q_x":1.23
    pairs survive. The fragment path is LOSSY: warn loudly with the
    recovered count (ADVICE r9 — a regressed query absent from the
    fragment would otherwise pass the gate silently), and fail
    outright if nothing was recovered."""
    d = json.load(open(path))
    if isinstance(d.get("queries"), dict):
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and \
            isinstance(d["parsed"].get("queries"), dict):
        return d["parsed"]["queries"]
    frag = d.get("tail", "") or ""
    pairs = re.findall(r'"(q_[a-z0-9_]+)":([0-9.]+)', frag)
    m = re.search(r'"n":(\d+)', frag)
    expected = f" of {m.group(1)} benched" if m else ""
    print(f"WARNING: {path} has no full queries dict; regex-recovered "
          f"{len(pairs)} q_* pairs{expected} from the tail fragment — "
          f"comparison is PARTIAL, absent queries are NOT gated")
    if not pairs:
        print(f"FATAL: {path} yielded zero query timings — nothing to "
              f"compare; refusing to report a vacuous pass")
        sys.exit(1)
    return {k: float(v) for k, v in pairs}


new = load_queries(sys.argv[1])
prev = load_queries(sys.argv[2])
common = set(new) & set(prev)
expected_common = min(len(new), len(prev))
if len(common) < max(1, expected_common // 2):
    print(f"WARNING: only {len(common)} queries comparable across the "
          f"two inputs (vs {expected_common} in the smaller set) — "
          f"the gate covers a minority of the suite")
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

nq, pq = new, prev
added = sorted(set(nq) - set(pq))
removed = sorted(set(pq) - set(nq))
if added:
    print(f"new queries ({len(added)}): {', '.join(added)}")
if removed:
    print(f"removed queries ({len(removed)}): {', '.join(removed)}")

regressed = []
improved = []
for name in sorted(set(nq) & set(pq)):
    a, b = pq[name], nq[name]
    if b > a * ratio and b - a > 0.5:
        regressed.append((name, a, b))
    elif a > b * ratio and a - b > 0.5:
        improved.append((name, a, b))
for name, a, b in improved:
    print(f"IMPROVED {name}: {a:.2f}s -> {b:.2f}s ({a / b:.1f}x)")
for name, a, b in regressed:
    print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)")

tot_a = sum(pq[n] for n in set(nq) & set(pq))
tot_b = sum(nq[n] for n in set(nq) & set(pq))
print(f"shared-query total: {tot_a:.1f}s -> {tot_b:.1f}s; "
      f"{len(regressed)} regressed / {len(improved)} improved "
      f"(>{ratio}x and >0.5s)")
sys.exit(1 if regressed else 0)
