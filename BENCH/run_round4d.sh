#!/bin/bash
# Round-4d: join-kernel 2x8 confirmation, repeats=3, on the full 222M-edge
# synth input — the csr repeats=3 confirmation (round4c) came back median
# 0.594 with a monotone warm-up drift + one bimodal shard-write stall, so
# the north-rule headline moves to the kernel that actually runs past
# csr_max_vertices (see BENCH/SCALE_PATH.md). This run uses the
# order-alternating protocol (low-first / high-first by repeat parity)
# and per-leg end-of-leg load telemetry added after 4c.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/round4d_join.log
{
  echo "=== 4d start $(date) loadavg $(cat /proc/loadavg)"
  python3 BENCH/scaling.py synth 2 8 3 join
  echo "=== join 2x8 repeats=3 done $(date)"
  python3 BENCH/report.py
  echo "=== 4d end $(date)"
} >> "$LOG" 2>&1
