#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each
SparkEntry.oracleSql query in DuckDB over the same parquet tables and
compare against the Spark parquet dump (columns sorted by name, rows
sorted, values hashed). Usage: oracle_check.py <sfDir> <verifyOut>"""
import sys, json, glob, math, struct
import duckdb

sfdir, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    # Floats compare by their exact IEEE-754 bits (VERDICT r9 task 2):
    # the old "%.10g" rendering was WEAKER than the driver's hash —
    # q_availability passed here for two rounds while the driver saw a
    # representation diff. Bit equality is the strongest possible
    # float gate; anything it passes, any downstream hash passes too.
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return struct.pack("<d", v).hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols2 = [cols[i] for i in order]
    rows2 = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return cols2, rows2

# Type parity (VERDICT r10 task 1/2): the driver's hash is computed over
# typed arrow buffers, so an oracle column DuckDB widened to HUGEINT or
# DECIMAL hash-mismatches a Spark BIGINT/DOUBLE even when every VALUE is
# equal — exactly the q_availability r8-r10 red row (uncast sum(BIGINT)).
# Python-side fetchall() erases that width (HUGEINT arrives as int), so
# value comparison alone is blind to it. Gate the declared relation types
# on BOTH sides, sorted by column name, before comparing values.
def types_of(rel):
    return {c: str(t) for c, t in zip(rel.columns, rel.types)}

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_lazy = con.sql(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        stypes = types_of(spark_lazy)
        otypes = types_of(con.sql(sql))
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols, srows = spark_rel.description, spark_rel.fetchall()
        scols = [c[0] for c in scols]
        orel = con.execute(sql)
        ocols = [c[0] for c in orel.description]
        orows = orel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
        continue
    tdiff = {c: (stypes.get(c), otypes.get(c))
             for c in sorted(set(stypes) | set(otypes))
             if stypes.get(c) != otypes.get(c)}
    if tdiff:
        print(f"FAIL {name}: type drift (spark, oracle) = {tdiff}")
        fails += 1
        continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: schema {sc} != {oc}")
        fails += 1
    elif len(sr) != len(orr):
        print(f"FAIL {name}: rows {len(sr)} != {len(orr)}")
        fails += 1
    elif sr != orr:
        diff = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b]
        print(f"FAIL {name}: {len(diff)} differing rows; first: "
              f"spark={sr[diff[0]]} oracle={orr[diff[0]]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(sr)} rows)")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
