#!/bin/bash
# Round invariance gate: run Verify under two deliberately-awkward
# parallelism layouts (odd thread counts, different shuffle-partition
# counts) and require every query's output to be identical. Layout
# invariance is a core engine property (deterministic sampling, IVF
# quantizer, salted joins, packing) — this gate stops a future operator
# from silently regressing it.
# Usage: tools/invariance_gate.sh [sfDir] [artifact.json]
set -euo pipefail
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-INVARIANCE.json}"
A=$(mktemp -d /tmp/inv_a.XXXXXX)
B=$(mktemp -d /tmp/inv_b.XXXXXX)
SPARK_GRAFT_CPUS=3 sbt -batch "runMain graft.Verify $SF $A" >/dev/null
SPARK_GRAFT_CPUS=13 sbt -batch "runMain graft.Verify $SF $B" >/dev/null
python3 "$(dirname "$0")/check_invariance.py" "$A" "$B" "$OUT"
