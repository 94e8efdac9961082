#!/bin/bash
# Round-4 measurement suite (run detached: nohup bash BENCH/run_round4.sh &)
# Assumes the join 2x8 pair on full synth was already recorded separately.
# Order: confirm the csr headline with repeats=3 (median), then the suite
# bench at sf0.1 in the same calm window (bench.py now records loadavg +
# per-query repeats), then recompose BASELINE.md.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round4_suite.log
{
  echo "=== suite start $(date) loadavg $(cat /proc/loadavg)"
  python3 BENCH/scaling.py synth 2 8 3 csr
  echo "=== csr 2x8 repeats=3 done $(date)"
  PROPAGON_BENCH_REPEATS=2 python3 bench.py > BENCH/bench_r4_local.json
  echo "=== sf0.1 suite bench done $(date)"
  python3 BENCH/report.py
  echo "=== suite end $(date)"
} >> "$LOG" 2>&1
