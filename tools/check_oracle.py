#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL, compare values with columns sorted
by name and rows sorted.

Usage: check_oracle.py <sfDir> <outDir> [selfcheck.json] [timing.json] [jobs]

Parallelism: queries fan out over a process pool (default: min(16, cpus)),
each worker holding its own DuckDB connection — the round-11 serial run
spent ~19 min wall on 262 oracles at sf0.01, dominated by a handful of
CTE-unroll oracles; the pool collapses that to roughly the slowest oracle.

selfcheck.json is written in the DRIVER'S CORRECTNESS_r{N}.json shape
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) so the committed self-witness is bitwise comparable with the
driver artifact. timing.json records per-query oracle/read seconds — the
receipt for where the gate's wall goes.
"""
import json, sys, math, os, glob, time
from multiprocessing import Pool

sfdir, outdir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
timing_out = sys.argv[4] if len(sys.argv) > 4 else None
jobs = int(sys.argv[5]) if len(sys.argv) > 5 else min(16, os.cpu_count() or 4)

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

_con = None

def _init():
    global _con
    import duckdb
    _con = duckdb.connect()
    # cap per-worker threads: 16 workers each defaulting to all cores made
    # the round-12 baseline spend 63 CPU-min in the scheduler (sys time)
    threads = max(2, (os.cpu_count() or 4) // jobs)
    _con.execute(f"SET threads={threads}")
    for t in TABLES:
        _con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")


def _compare(arg):
    """One query's gate: returns (name, human_status, driver_record,
    read_secs, oracle_secs)."""
    name, sql = arg
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        rec["err"] = "no spark output"
        return name, "missing", rec, 0.0, 0.0
    try:
        t0 = time.monotonic()
        got = _con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        t1 = time.monotonic()
        want = _con.sql(sql).df()
        t2 = time.monotonic()
    except Exception as e:
        rec["err"] = str(e)[:300]
        return name, f"fail: exec {e}", rec, 0.0, 0.0
    rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        return (name, f"fail: columns {list(got.columns)} != {list(want.columns)}",
                rec, t1 - t0, t2 - t1)
    rec["schema_match"] = True
    if len(got) != len(want):
        return name, f"fail: rows {len(got)} != {len(want)}", rec, t1 - t0, t2 - t1
    rec["rows_match"] = True
    # The driver's hash is TYPED: DuckDB HUGEINT decays to float64 in .df()
    # and hashes as 957.0 vs Spark's BIGINT 957. Mirror that strictness here:
    # integer-kind vs float-kind on the same column is a failure even when
    # the values compare equal with ==.
    dtype_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                 for c in got.columns
                 if got[c].dtype.kind in "iuf" and want[c].dtype.kind in "iuf"
                 and (got[c].dtype.kind in "iu") != (want[c].dtype.kind in "iu")]
    if dtype_bad:
        rec["schema_match"] = False
        return name, f"fail: dtype mismatch {dtype_bad}", rec, t1 - t0, t2 - t1
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    mismatch = None
    for c in got.columns:
        gv, wv = g[c], w[c]
        try:
            if gv.dtype.kind in "fc" or wv.dtype.kind in "fc":
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv))
                       if not (a == b or (isinstance(a, float) and isinstance(b, float)
                               and (math.isnan(a) and math.isnan(b) or a == b)))]
            else:
                bad = [(i, a, b) for i, (a, b) in
                       enumerate(zip(gv.astype(str), wv.astype(str))) if a != b]
        except Exception as e:
            bad = [("err", str(e), "")]
        if bad:
            mismatch = (c, bad[:3]); break
    if mismatch:
        return (name, f"fail: col {mismatch[0]} first diffs {mismatch[1]}",
                rec, t1 - t0, t2 - t1)
    rec["hash_match"] = True
    return name, f"ok ({len(got)} rows)", rec, t1 - t0, t2 - t1


def main():
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    items = sorted(oracle.items())
    wall0 = time.monotonic()
    with Pool(jobs, initializer=_init) as pool:
        out = pool.map(_compare, items, chunksize=1)
    wall = time.monotonic() - wall0
    ok = fail = 0
    results, records, timing = {}, {}, {}
    for name, status, rec, rs, osec in sorted(out):
        results[name], records[name] = status, rec
        timing[name] = {"read_s": round(rs, 3), "oracle_s": round(osec, 3)}
        if status.startswith("ok"):
            ok += 1
            print(f"OK   {name} ({rec['spark_rows']} rows)")
        else:
            fail += 1
            print(f"FAIL {name}: {status}")
    print(f"\n{ok} ok, {fail} fail (of {len(oracle)} oracled) "
          f"[wall {wall:.1f}s, {jobs} jobs]")
    if json_out:
        json.dump(records, open(json_out, "w"), indent=1, sort_keys=True)
    if timing_out:
        slow = sorted(timing.items(), key=lambda kv: -kv[1]["oracle_s"])[:15]
        json.dump({"wall_s": round(wall, 1), "jobs": jobs,
                   "sum_oracle_s": round(sum(v["oracle_s"] for v in timing.values()), 1),
                   "sum_read_s": round(sum(v["read_s"] for v in timing.values()), 1),
                   "slowest": [{"name": k, **v} for k, v in slow],
                   "queries": timing},
                  open(timing_out, "w"), indent=1)
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
