#!/usr/bin/env bash
# Synthetic failure probes for the round gate (VERDICT r11 task 3, the
# r9 precedent for checks 4-5): a defense that has never been seen to
# fail is not known to work. Each probe doctors an input that MUST make
# the real gate code exit non-zero, then runs the healthy control.
#
#   tools/probe_gates.sh     # exits 0 iff every probe behaves
#
# Probe A — type-parity gate (tools/oracle_check.py): an oracle with an
#   uncast sum(BIGINT) (DuckDB widens to HUGEINT) against a Spark dump
#   declaring BIGINT must FAIL with "type drift" even though every VALUE
#   is identical — the exact q_availability r8-r10 blind spot.
# Probe B — round_gate.sh check 6 waiver expiry: a red row in a NEWER
#   artifact than its waiver's round stamp must FAIL; a current-round
#   stamp must pass; a malformed (unstamped) waiver line must FAIL.
set -uo pipefail
cd "$(dirname "$0")/.."
T=$(mktemp -d /tmp/probe_gates.XXXXXX)
trap 'rm -rf "$T"' EXIT
pass=0; fail=0
expect() { # expect <name> <want_rc> <got_rc>
  if [ "$2" = "$3" ]; then echo "PROBE OK   $1 (exit $3)"; pass=$((pass+1));
  else echo "PROBE FAIL $1 (want exit $2, got $3)"; fail=$((fail+1)); fi
}

echo "== Probe A: oracle_check.py declared-type parity =="
mkdir -p "$T/sf" "$T/out"
python3 - "$T" <<'EOF'
import duckdb, json, sys
t = sys.argv[1]
con = duckdb.connect()
con.execute(f"COPY (SELECT CAST(r%3 AS BIGINT) AS k, CAST(r AS BIGINT) AS v "
            f"FROM range(100) t(r)) TO '{t}/sf/probe.parquet' (FORMAT PARQUET)")
# the "Spark side": BIGINT sums, exactly what SparkEntry dumps
con.execute(f"COPY (SELECT k, CAST(sum(v) AS BIGINT) AS sum_v FROM "
            f"read_parquet('{t}/sf/probe.parquet') GROUP BY k) "
            f"TO '{t}/out/q_probe' (FORMAT PARQUET, PER_THREAD_OUTPUT false)")
EOF
mkdir -p "$T/out/q_probe_dir" && mv "$T/out/q_probe" "$T/out/q_probe_dir/part.parquet" \
  && mv "$T/out/q_probe_dir" "$T/out/q_probe"
# A1: uncast oracle -> HUGEINT -> must fail
echo '{"q_probe": "SELECT k, sum(v) AS sum_v FROM probe GROUP BY k"}' \
  > "$T/out/oracle_sql.json"
python3 tools/oracle_check.py "$T/sf" "$T/out" >"$T/a1.log" 2>&1; rc=$?
expect "A1 uncast sum(BIGINT) oracle rejected" 1 $rc
grep -q "type drift" "$T/a1.log" || { echo "PROBE FAIL A1: no 'type drift' in output"; fail=$((fail+1)); }
# A2: cast oracle -> control must pass
echo '{"q_probe": "SELECT k, CAST(sum(v) AS BIGINT) AS sum_v FROM probe GROUP BY k"}' \
  > "$T/out/oracle_sql.json"
python3 tools/oracle_check.py "$T/sf" "$T/out" >"$T/a2.log" 2>&1; rc=$?
expect "A2 cast control accepted" 0 $rc

echo "== Probe B: round_gate.sh check 6 waiver expiry =="
# run the REAL check-6 python (extracted verbatim from round_gate.sh —
# its import line is unique to that heredoc) in a sandbox repo root
awk '/^import glob, json, os, re, sys/,/^EOF$/' tools/round_gate.sh \
  | grep -v '^EOF$' > "$T/check6.py"
grep -q "art_round" "$T/check6.py" || { echo "PROBE FAIL B: extraction empty/stale"; exit 1; }
mkdir -p "$T/repo/tools"
cat > "$T/repo/CORRECTNESS_r99.json" <<'EOF'
{"q_red": {"rows_match": true, "schema_match": true, "hash_match": false},
 "q_green": {"rows_match": true, "schema_match": true, "hash_match": true}}
EOF
# B1: waiver stamped for an OLDER round -> expired -> must fail
echo "q_red r98  # probe: stale waiver" > "$T/repo/tools/driver_divergence.txt"
(cd "$T/repo" && python3 "$T/check6.py") >"$T/b1.log" 2>&1; rc=$?
expect "B1 expired waiver (r98 vs artifact r99) rejected" 1 $rc
# B2: waiver stamped current round -> must pass
echo "q_red r99  # probe: current waiver" > "$T/repo/tools/driver_divergence.txt"
(cd "$T/repo" && python3 "$T/check6.py") >"$T/b2.log" 2>&1; rc=$?
expect "B2 current-round waiver accepted" 0 $rc
# B3: unstamped (legacy-format) waiver line -> malformed -> must fail
echo "q_red  # probe: no round stamp" > "$T/repo/tools/driver_divergence.txt"
(cd "$T/repo" && python3 "$T/check6.py") >"$T/b3.log" 2>&1; rc=$?
expect "B3 unstamped waiver line rejected" 1 $rc
# B4: red row with NO waiver at all -> must fail
rm "$T/repo/tools/driver_divergence.txt"
(cd "$T/repo" && python3 "$T/check6.py") >"$T/b4.log" 2>&1; rc=$?
expect "B4 unwaived red row rejected" 1 $rc

echo "== $pass passed, $fail failed =="
[ "$fail" -eq 0 ]
