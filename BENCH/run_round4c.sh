#!/bin/bash
# Round-4c: csr 2x8 confirmation on the RDD-gather kernel (the round-4b
# suite was superseded mid-run by that kernel change; its two completed
# old-code repeats are preserved in git history and RUNS.md), then the
# sf0.1 suite bench and BASELINE.md recomposition.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round4c_suite.log
{
  echo "=== 4c start $(date) loadavg $(cat /proc/loadavg)"
  python3 BENCH/scaling.py synth 2 8 3 csr
  echo "=== csr 2x8 repeats=3 done $(date)"
  sleep 120
  PROPAGON_BENCH_REPEATS=2 python3 bench.py > BENCH/bench_r4_local.json
  echo "=== sf0.1 suite bench done $(date)"
  python3 BENCH/report.py
  echo "=== 4c end $(date)"
} >> "$LOG" 2>&1
