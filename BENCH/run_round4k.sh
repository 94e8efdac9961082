#!/bin/bash
# Round-4k: THIRD repeat of the 1->4 wide-input join pair (resume).
# Repeat index 2 is even -> low-first leg order, matching repeat 1 and
# bracketing repeat 2's high-first order. With three repeats the
# reported median is the middle value — robust to one contaminated
# window in either direction (the round-3 verdict's prescription;
# repeat 2 measured 0.588 under invisible co-tenant load).
cd "$(dirname "$0")/.."
echo "=== 4k start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=4 \
python3 BENCH/scaling.py synth-wide 1 4 1 join 2>>BENCH/round4k_wide.log
echo "=== 4k end $(date)"
