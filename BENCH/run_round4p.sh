#!/bin/bash
# Round-4p: CSR kernel at the bus-contention FLOOR pair (1 -> 4 cores),
# full synth input (222M dedup'd edges), repeats 3.
# Rationale: BASELINE.md argues the lowest pair is the faithful single-
# host proxy for adding cluster nodes (neither level saturates the
# shared memory bus), and applies that floor-pair treatment to the join
# kernel (1->4 on synth-wide, median 0.845). The CSR kernel has no
# floor pair on record — only 2->8 (median 0.594, bus-dominated dedup +
# tmpfs shard write) and 8->32 — so its scaling story currently rests
# on the per-phase decomposition alone. This run gives the fast path
# the same floor-pair evidence class as the join kernel.
cd "$(dirname "$0")/.."
echo "=== 4p start $(date) loadavg $(cat /proc/loadavg)"
python3 BENCH/scaling.py synth 1 4 3 csr 2>>BENCH/round4p_csr.log
echo "=== 4p end $(date)"
