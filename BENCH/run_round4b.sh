#!/bin/bash
# Round-4b: re-run the csr 2x8 confirmation with inter-leg cool-downs
# (scaling.py now waits for loadavg < 1 before each leg and writes the
# JSON after every repeat), then the sf0.1 suite in the same calm
# discipline. Run detached: nohup bash BENCH/run_round4b.sh &
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round4b_suite.log
{
  echo "=== 4b start $(date) loadavg $(cat /proc/loadavg)"
  python3 BENCH/scaling.py synth 2 8 3 csr
  echo "=== csr 2x8 repeats=3 done $(date)"
  sleep 120   # let the last leg's load decay before the suite bench
  PROPAGON_BENCH_REPEATS=2 python3 bench.py > BENCH/bench_r4_local.json
  echo "=== sf0.1 suite bench done $(date)"
  python3 BENCH/report.py
  echo "=== 4b end $(date)"
} >> "$LOG" 2>&1
