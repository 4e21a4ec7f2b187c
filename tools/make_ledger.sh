#!/usr/bin/env bash
# One-command BASELINE_PERQUERY.json regeneration: N standalone
# full-pack Bench runs at sf0.1 (default 3 — the committed protocol:
# medians of 3 are robust to one contended sample), then
# tools/make_ledger.py cuts per-query medians and prints a reviewable
# diff against the previous ledger. Run on a GREEN tree only (a run
# with failed queries aborts the cut), ideally on a quiet box — the
# documented noise band is ±10% with readings topping out higher late
# in a long JVM session.
#
# Takes ~10-15 min for 3 runs; from an agent shell launch it detached
# (setsid nohup bash tools/make_ledger.sh > /tmp/ledger_<tag>.log ...).
set -euo pipefail
cd "$(dirname "$0")/.."

runs="${1:-3}"
tmp=$(mktemp -d /tmp/graft_ledger.XXXXXX)
for i in $(seq 1 "$runs"); do
  echo "== ledger bench run $i/$runs"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" | grep -F '"metric"' | tail -1
  cp BENCH_FULL.json "$tmp/bench_$i.json"
done
python3 tools/make_ledger.py "$tmp"/bench_*.json
echo "== done; review the diff above, then commit BASELINE_PERQUERY.json"
