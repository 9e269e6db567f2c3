#!/usr/bin/env python3
"""Parallelism-invariance sweep: compare two Verify output dirs produced
with different executor-thread counts (SPARK_GRAFT_CPUS). Every query must
produce identical rows (order-insensitive, like the driver's compare).
Usage: check_invariance.py <outDirA> <outDirB> [jsonOut]
With jsonOut, writes a per-query artifact (the round's invariance gate)."""
import glob, json, os, sys
import duckdb

a, b = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()
names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
ok = fail = 0
results = {}
for name in names:
    fa = glob.glob(f"{a}/{name}/*.parquet")
    fb = glob.glob(f"{b}/{name}/*.parquet")
    if not fa or not fb:
        print(f"MISSING {name}"); results[name] = "missing"; fail += 1; continue
    da = con.sql(f"SELECT * FROM '{a}/{name}/*.parquet'").df()
    db = con.sql(f"SELECT * FROM '{b}/{name}/*.parquet'").df()
    da = da.reindex(sorted(da.columns), axis=1).sort_values(by=sorted(da.columns)).reset_index(drop=True)
    db = db.reindex(sorted(db.columns), axis=1).sort_values(by=sorted(db.columns)).reset_index(drop=True)
    if da.equals(db):
        print(f"OK   {name} ({len(da)} rows)"); results[name] = "ok"; ok += 1
    else:
        print(f"FAIL {name}: outputs differ across parallelism layouts")
        results[name] = "fail"; fail += 1

print(f"\n{ok} ok, {fail} fail (of {len(names)})")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"ok": ok, "fail": fail, "total": len(names),
                   "queries": results}, f, indent=1, sort_keys=True)
sys.exit(1 if fail else 0)
