#!/bin/bash
# Round-3 suite tail, relaunched after the binary-buffer gather landed so
# both csr pairs are measured on the same code. repeats=1 (wall budget);
# workers still keep best-of-2 fits per level.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round3_suite.log
{
  echo "=== tail-b start $(date) loadavg $(cat /proc/loadavg)"
  python3 BENCH/scaling.py synth 2 8 1 csr
  echo "=== csr 2x8 (binary gather) done $(date)"
  python3 BENCH/scaling.py synth 8 32 1 csr
  echo "=== csr 8x32 done $(date)"
  python3 BENCH/scaling.py synth-small 2 8 1 join
  echo "=== join 2x8 rerun (timings, idle host) done $(date)"
  python3 BENCH/scaling.py synth 8 32 1 join
  echo "=== join 8x32 done $(date)"
  python3 BENCH/report.py
  echo "=== tail-b end $(date)"
} >> "$LOG" 2>&1
