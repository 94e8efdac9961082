#!/bin/bash
# Round-4g: join kernel on synth-wide (>csr-cap, 12M vertices), the
# FULL north-rule job (tol=1e-6 convergence — "edges-processed/sec for
# PageRank to 1e-6 convergence" is the metric; 32 iterations on this
# graph) with the shape-pinned loop layout (run #23 sweep: auto ->
# repart, PROPAGON_JOIN_KEYS_PER_TASK default 100k -> loop_nparts=120
# at BOTH levels). No gather/layout env pins: this is the production
# auto path. FITS=1 (a fit is 15-50 min; JIT warm-up negligible,
# best-of-2 doubles stall exposure). Input pre-materialized by
# prepare_input (BENCH/data/synth-wide.parquet) so legs skip the
# generation preamble.
cd "$(dirname "$0")/.."
echo "=== 4g start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_FITS=1 \
python3 BENCH/scaling.py synth-wide 2 8 2 join 2>>BENCH/round4g_wide.log
echo "=== 4g end $(date)"
