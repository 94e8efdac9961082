#!/bin/bash
# Round-3 scaling evidence suite (run detached: nohup bash BENCH/run_round3.sh &)
# Order: headline csr pair at full synth scale first, then the join-kernel
# pair (the >10M-vertex / 100-TB path), then the wide csr pair.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round3_suite.log
{
  echo "=== suite start $(date) loadavg $(cat /proc/loadavg)"
  python3 BENCH/scaling.py synth 2 8 2 csr
  echo "=== csr 2x8 done $(date)"
  python3 BENCH/scaling.py synth-small 2 8 2 join
  echo "=== join 2x8 (synth-small) done $(date)"
  python3 BENCH/scaling.py synth 8 32 1 csr
  echo "=== csr 8x32 done $(date)"
  python3 BENCH/scaling.py synth 8 32 1 join
  echo "=== join 8x32 (synth) done $(date)"
  python3 BENCH/report.py
  echo "=== suite end $(date)"
} >> "$LOG" 2>&1
