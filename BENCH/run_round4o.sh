#!/bin/bash
# Round-4o: wide-input 2->8 join pair at the REFERENCE'S OWN default
# iteration budget (10; BASELINE.md row 9, pagerank.rs:74-83), tagged
# "it10" into its own json so run #30's MAXIT=4 record is untouched.
# Rationale (RUNS.md #30 phase-attribution note): with MAXIT=4 and the
# two rate-calibration turns, 3 of 4 iterations run as single
# delta-carrying steps — the worst-scaling job shape (0.70-0.77) —
# while the chain shape that dominates converged production fits
# scales at 0.86-0.99 on the same runs. At a 10-iteration budget the
# adaptive chain runs 7 of 10 iterations in chain shape: this pair
# measures the production job mix instead of the calibration mix.
cd "$(dirname "$0")/.."
echo "=== 4o start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=10 PROPAGON_SCALING_TAG=it10 \
python3 BENCH/scaling.py synth-wide 2 8 3 join 2>>BENCH/round4o_wide.log
echo "=== 4o end $(date)"
