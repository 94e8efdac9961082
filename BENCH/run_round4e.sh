#!/bin/bash
# Round-4e: join-kernel 2x8 pair on the synth-wide input — ~12M file
# vertices, i.e. PAST csr_max_vertices = 10M, at web-link density
# E/V ~ 15. Empirically validates the SCALE_PATH.md claim that the join
# kernel carries the >10M-vertex (10^12-file) regime: the round-3
# verdict asked for either a >cap prototype with a recorded scaling
# pair or the written analysis — this run upgrades the analysis to a
# measurement. repeats=2, order-alternating protocol, cooldown gates.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round4e_wide.log
{
  echo "=== 4e start $(date) loadavg $(cat /proc/loadavg)"
  python3 BENCH/scaling.py synth-wide 2 8 2 join
  echo "=== join synth-wide 2x8 repeats=2 done $(date)"
  python3 BENCH/report.py
  echo "=== 4e end $(date)"
} >> "$LOG" 2>&1
