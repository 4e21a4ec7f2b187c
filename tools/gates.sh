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

# Soft ceiling on the full-pack total so a perf regression fails HERE,
# before the driver's official run sees it. Local full-pack samples on
# green trees span ~55-64 s (box noise band); the driver's own runs land
# ~1.0-1.25x local. 70 s local therefore means a real regression, while
# the hard driver gate (2x baseline) sits at 80 s official.
#
# A bench that runs right after the test+verify phases above can read
# hot (measured: 72.1 s in-gates vs 64.5 s standalone on the SAME tree
# — leftover page-cache churn / JIT-compiler threads from the prior
# sbt JVMs), so a single breach re-runs once and the second reading
# decides: a real regression reproduces, a contended reading doesn't.
run_bench() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" | grep -F '"metric"' | tee /tmp/graft_gate_bench.json
}
check_ceiling() {
  python3 - <<'EOF'
import json, re, sys
line = open("/tmp/graft_gate_bench.json").read()
rec = json.loads(re.sub(r"^\[info\] ", "", line.strip().splitlines()[-1]))
if rec.get("failed"):
    print(f"bench FAILED queries: {rec['failed']}")
    sys.exit(2)
total = rec["value"]
ceiling = 70.0
print(f"bench total {total:.1f} s (ceiling {ceiling:.0f} s)")
sys.exit(1 if total > ceiling else 0)
EOF
}

echo "== bench sf0.1"
run_bench
echo "== bench ceiling"
if ! check_ceiling; then
  echo "== bench ceiling breached — re-running once (contention check)"
  sleep 10
  run_bench
  check_ceiling
fi
