#!/bin/bash
# Round-4l: FOURTH repeat of the 1->4 wide-input join pair (resume).
# Repeat index 3 is odd -> high-first. Launched in the calmest window
# since repeat 1 (loadavg 0.05). With an even repeat count the harness
# reports the mean of the two middle per-repeat efficiencies.
cd "$(dirname "$0")/.."
echo "=== 4l start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=4 \
python3 BENCH/scaling.py synth-wide 1 4 1 join 2>>BENCH/round4l_wide.log
echo "=== 4l end $(date)"
