#!/usr/bin/env python3
"""Parallelism-invariance sweep: compare two Verify output dirs produced
with different executor-thread counts (SPARK_GRAFT_CPUS). Every query must
produce identical rows (order-insensitive, like the driver's compare).
Usage: check_invariance.py <outDirA> <outDirB>"""
import glob, os, sys
import duckdb

a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
ok = fail = 0
for name in names:
    fa = glob.glob(f"{a}/{name}/*.parquet")
    fb = glob.glob(f"{b}/{name}/*.parquet")
    if not fa or not fb:
        print(f"MISSING {name}"); fail += 1; continue
    da = con.sql(f"SELECT * FROM '{a}/{name}/*.parquet'").df()
    db = con.sql(f"SELECT * FROM '{b}/{name}/*.parquet'").df()
    da = da.reindex(sorted(da.columns), axis=1).sort_values(by=sorted(da.columns)).reset_index(drop=True)
    db = db.reindex(sorted(db.columns), axis=1).sort_values(by=sorted(db.columns)).reset_index(drop=True)
    if da.equals(db):
        print(f"OK   {name} ({len(da)} rows)"); ok += 1
    else:
        print(f"FAIL {name}: outputs differ across parallelism layouts"); fail += 1

print(f"\n{ok} ok, {fail} fail (of {len(names)})")
sys.exit(1 if fail else 0)
