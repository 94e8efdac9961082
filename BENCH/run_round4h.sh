#!/bin/bash
# Round-4h: join kernel on synth-wide (>csr-cap, 12M vertices) with the
# shape-pinned loop layout (auto -> repart, loop_nparts=120 at BOTH
# levels), sized to the round's REMAINING wall clock: FITS=1,
# MAXIT=4 (identical fixed iteration count at both levels, so the
# throughput ratio the criterion divides is unaffected — it just bounds
# the 2-core leg to ~15 min instead of the 60+ min a tol=1e-6 fit
# takes), repeats=1 low-first (the long calm-sensitive leg runs while
# the freshly-rebooted host is idle). run_round4g.sh remains the full
# tol=1e-6 protocol for a future window with >1.5 h of calm wall.
cd "$(dirname "$0")/.."
echo "=== 4h start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=4 \
python3 BENCH/scaling.py synth-wide 2 8 1 join 2>>BENCH/round4h_wide.log
echo "=== 4h end $(date)"
