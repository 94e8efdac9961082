#!/bin/bash
# Round-4j: ADD one repeat to the 1->4 wide-input join pair (run #25,
# repeats=1, eff 1.074) via the harness's resume mode. Same protocol as
# run #25 — shape-pinned loop layout (auto -> repart, loop_nparts=120),
# FITS=1, MAXIT=4 fixed at both levels, materialized input reused —
# but this repeat has index 1 (odd), so the harness runs HIGH-first,
# alternating the leg order against run #25's low-first and making the
# page-cache/JIT warm-up drift hit both levels symmetrically across
# the median (BENCH/scaling.py order-alternation note).
cd "$(dirname "$0")/.."
echo "=== 4j start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=4 \
python3 BENCH/scaling.py synth-wide 1 4 1 join 2>>BENCH/round4j_wide.log
echo "=== 4j end $(date)"
