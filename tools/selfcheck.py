#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query: load the Spark parquet result, run the oracle SQL in DuckDB
over the same testdata tables, sort both by all columns (columns ordered by
name), and compare values exactly. Reports per-query PASS/FAIL.
"""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        results[name] = "MISSING_SPARK_RESULT"
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf()
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ERROR: {e}"
        continue
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        results[name] = f"SCHEMA_MISMATCH spark={s_cols} oracle={o_cols}"
        continue
    sdf = sdf[s_cols].sort_values(s_cols, ignore_index=True)
    odf = odf[o_cols].sort_values(o_cols, ignore_index=True)
    if len(sdf) != len(odf):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(sdf)} oracle={len(odf)}"
        continue
    # exact compare on stringified values (what a hash compare would see)
    mism = []
    for c in s_cols:
        sv = sdf[c].astype(str).tolist()
        ov = odf[c].astype(str).tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
        if bad:
            mism.append((c, bad[:3], len(bad)))
    if mism:
        results[name] = f"VALUE_MISMATCH {mism[:2]}"
    else:
        results[name] = "PASS"

n_pass = sum(1 for v in results.values() if v == "PASS")
for name, r in results.items():
    mark = "ok " if r == "PASS" else "FAIL"
    print(f"[{mark}] {name}: {r if r != 'PASS' else ''}")
print(f"\n{n_pass}/{len(results)} queries pass")
sys.exit(0 if n_pass == len(results) else 1)
