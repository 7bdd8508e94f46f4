#!/usr/bin/env bash
# Round-close build gate: refuse to end a round on a tree the driver's
# own entrypoints cannot run. Round 5 shipped a non-compiling snapshot
# (a sink referenced a class whose file didn't exist yet) and the
# entire round's correctness and bench artifacts were zeroed — this
# script is the tripwire that prevents a repeat. Run it before ANY
# end-of-round commit:
#
#   tools/round_gate.sh            # full gate (~2 min warm)
#
# Checks, in order (fail-fast, non-zero exit on any failure):
#   1. `sbt Test/compile`  — main AND test sources compile;
#   2. entry smoke         — SparkEntry.entry(spark) returns rows > 0
#                            on sf0.001 (the driver's t1 gate);
#   3. one Verify query    — graft.Verify writes q1_agg parquet +
#                            oracle_sql.json on sf0.001 (the driver's
#                            t2 plumbing end-to-end, minus DuckDB).
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${ROUND_GATE_SF:-/root/testdata/sf0.001}
OUT=$(mktemp -d /tmp/round_gate.XXXXXX)
trap 'rm -rf "$OUT"' EXIT

echo "[gate] 1/3 sbt Test/compile"
sbt -batch Test/compile >"$OUT/compile.log" 2>&1 || {
  tail -30 "$OUT/compile.log"; echo "[gate] FAIL: compile"; exit 1; }

echo "[gate] 2/3 entry smoke (graft.Smoke, rows>0)"
sbt -batch "runMain graft.Smoke" >"$OUT/smoke.log" 2>&1 || {
  tail -30 "$OUT/smoke.log"; echo "[gate] FAIL: entry smoke"; exit 1; }
grep -q '"smoke":"entry"' "$OUT/smoke.log" || {
  echo "[gate] FAIL: entry smoke produced no summary"; exit 1; }

echo "[gate] 3/3 Verify q1_agg on $SF"
sbt -batch "runMain graft.Verify $SF $OUT/v q1_agg" \
  >"$OUT/verify.log" 2>&1 || {
  tail -30 "$OUT/verify.log"; echo "[gate] FAIL: Verify run"; exit 1; }
if grep -q '\[verify\] .* failed' "$OUT/verify.log"; then
  grep '\[verify\]' "$OUT/verify.log"
  echo "[gate] FAIL: a Verify query threw"; exit 1
fi
[ -f "$OUT/v/oracle_sql.json" ] || {
  echo "[gate] FAIL: oracle_sql.json not written"; exit 1; }
ls "$OUT"/v/q1_agg/*.parquet >/dev/null 2>&1 || {
  echo "[gate] FAIL: q1_agg parquet not written"; exit 1; }

echo "[gate] PASS — tree is safe to commit at round close"
