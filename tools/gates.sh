#!/usr/bin/env bash
# All round gates in order: unit tests, oracle compare at every scale
# factor, bench. Exit nonzero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt test"
sbt -batch test

for sf in sf0.001 sf0.01 sf0.1; do
  echo "== verify $sf"
  out="/tmp/graft_gate_$sf"
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out"
  python3 tools/check.py "/root/testdata/$sf" "$out"
done

echo "== bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" | grep -F '"metric"'
