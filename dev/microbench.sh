#!/bin/bash
# Micro-bench named queries: dev/microbench.sh q1,q2 [passes] [sfdir]
# Uses the Bench main's SPARK_GRAFT_ONLY dev hook (min-of-N, same noop-sink
# methodology as the official bench). Prints the compact JSON line.
set -e
ONLY="$1"
PASSES="${2:-3}"
SF="${3:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_PASSES="$PASSES" \
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  sbt "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1
python3 - "$ONLY" <<'EOF'
import json, sys
d = json.load(open("BENCH_LAST.json"))
for q in sorted(d["queries"]):
    print(f'{d["queries"][q]:8.3f}  (median {d["queries_median"][q]:8.3f})  {q}')
EOF
