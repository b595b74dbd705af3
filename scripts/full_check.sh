#!/usr/bin/env bash
# One-shot local gate mirroring everything the driver checks:
#   scalatest suite, t2 DuckDB-oracle correctness at sf0.001 + sf0.01,
#   t1 entry smoke, and the sf0.1 steady-state bench.
# Usage: scripts/full_check.sh [testdata-root]   (default /root/testdata)
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT="${1:-/root/testdata}"

sbt -batch test

for sf in sf0.001 sf0.01; do
  out="/tmp/graft_verify_$sf"
  sbt -batch "runMain graft.Verify $ROOT/$sf $out"
  python3 scripts/check_correctness.py "$out" "$ROOT/$sf"
done

sbt -batch "runMain graft.tools.EntrySmoke" | grep ENTRY_ROWS

SPARK_GRAFT_SF_DIR="$ROOT/sf0.1" sbt -batch "runMain graft.Bench" \
  | grep '"metric"' | sed 's/^\[info\] //'
