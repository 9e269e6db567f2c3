#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL, compare values with columns sorted
by name and rows sorted. Usage: check_oracle.py <sfDir> <outDir>."""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
results = {}
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
import glob
ok = fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING {name}: no spark output"); fail += 1
        results[name] = "missing"; continue
    got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    want = con.sql(sql).df()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}"); fail += 1
        results[name] = "fail: columns"; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fail += 1
        results[name] = "fail: rows"; continue
    # The driver's hash is TYPED: DuckDB HUGEINT decays to float64 in .df()
    # and hashes as 957.0 vs Spark's BIGINT 957. Mirror that strictness here:
    # integer-kind vs float-kind on the same column is a failure even when
    # the values compare equal with ==.
    dtype_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                 for c in got.columns
                 if got[c].dtype.kind in "iuf" and want[c].dtype.kind in "iuf"
                 and (got[c].dtype.kind in "iu") != (want[c].dtype.kind in "iu")]
    if dtype_bad:
        print(f"FAIL {name}: dtype mismatch {dtype_bad}"); fail += 1
        results[name] = "fail: dtype"; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    mismatch = None
    for c in got.columns:
        gv, wv = g[c], w[c]
        try:
            import pandas as pd
            if gv.dtype.kind in "fc" or wv.dtype.kind in "fc":
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv))
                       if not (a == b or (isinstance(a, float) and isinstance(b, float)
                               and (math.isnan(a) and math.isnan(b) or a == b)))]
            else:
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv.astype(str), wv.astype(str))) if a != b]
        except Exception as e:
            bad = [("err", str(e), "")]
        if bad:
            mismatch = (c, bad[:3]); break
    if mismatch:
        print(f"FAIL {name}: col {mismatch[0]} first diffs {mismatch[1]}"); fail += 1
        results[name] = f"fail: col {mismatch[0]}"
    else:
        print(f"OK   {name} ({len(got)} rows)"); ok += 1
        results[name] = f"ok ({len(got)} rows)"

# queries without oracle: rows-only
print(f"\n{ok} ok, {fail} fail (of {len(oracle)} oracled)")
if json_out:
    json.dump({"summary": f"{ok} ok, {fail} fail (of {len(oracle)} oracled)",
               "queries": dict(sorted(results.items()))},
              open(json_out, "w"), indent=1)
sys.exit(1 if fail else 0)
