#!/bin/bash
# Round-4q: +2 resume repeats of the wide-input 2->8 it10 pair (run
# #31: 3-repeat median 0.913, per-repeat [0.924, 0.544, 0.913] with the
# 0.544 an identified environmental setup stall). Widening to 5 repeats
# makes the median discard one outlier per side — the same treatment
# run #29 gave the headline synth pair.
cd "$(dirname "$0")/.."
echo "=== 4q start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=10 \
PROPAGON_SCALING_TAG=it10 \
python3 BENCH/scaling.py synth-wide 2 8 2 join 2>>BENCH/round4q_wide.log
echo "=== 4q end $(date)"
