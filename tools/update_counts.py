#!/usr/bin/env python3
"""Regenerate the query/oracle/test counts in SURVEY.md and README.md from
the round artifacts, so the docs cannot drift from reality.

Sources of truth:
  - a graft.Verify output dir: total queries = result subdirs,
    oracled = keys of oracle_sql.json;
  - an `sbt test` log: "Total number of tests run: N".

Usage: update_counts.py <verifyOutDir> <sbtTestLog>
"""
import json, os, re, sys

out_dir, test_log = sys.argv[1], sys.argv[2]

n_total = len([d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d))])
n_oracled = len(json.load(open(os.path.join(out_dir, "oracle_sql.json"))))
m = re.search(r"Total number of tests run: (\d+)",
              open(test_log, errors="replace").read())
if not m:
    sys.exit("no 'Total number of tests run' line in " + test_log)
n_tests = int(m.group(1))

def patch(path, subs):
    s = open(path).read()
    for pat, repl in subs:
        s, n = re.subn(pat, repl, s)
        if n == 0:
            sys.exit(f"pattern not found in {path}: {pat}")
    open(path, "w").write(s)

patch("SURVEY.md", [
    (r"\d+ queries in `SparkEntry`", f"{n_total} queries in `SparkEntry`"),
    (r"\d+ DuckDB-oracled", f"{n_oracled} DuckDB-oracled"),
    (r"\d+ ScalaTest specs", f"{n_tests} ScalaTest specs"),
])
patch("README.md", [
    (r"\d+ of \d+ queries are hash-checked",
     f"{n_oracled} of {n_total} queries are hash-checked"),
    (r"`sbt test`: \d+ tests", f"`sbt test`: {n_tests} tests"),
    (r"all \d+ query results are bit-identical",
     f"all {n_total} query results are bit-identical"),
])
print(f"counts: {n_total} queries, {n_oracled} oracled, {n_tests} tests")
