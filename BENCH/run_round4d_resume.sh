#!/bin/bash
# Round-4d continuation: the original repeats=3 suite was killed mid
# repeat-2 (session interruption); repeat 1 (eff=0.919) is preserved in
# scaling_2x8_join.json and PROPAGON_SCALING_RESUME=1 seeds it, so this
# run adds repeats 2-3 on the same order-alternating parity schedule
# (i starts at resumed=1 -> high-first, then low-first).
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round4d_join.log
{
  echo "=== 4d RESUME start $(date) loadavg $(cat /proc/loadavg)"
  PROPAGON_SCALING_RESUME=1 python3 BENCH/scaling.py synth 2 8 2 join
  echo "=== join 2x8 resume (+2 repeats) done $(date)"
  python3 BENCH/report.py
  echo "=== 4d end $(date)"
} >> "$LOG" 2>&1
