#!/bin/bash
# Round-4f: join kernel on synth-wide (>csr-cap, 12M vertices) with the
# repart gather plan (run #22+). Changes vs round-4e (run #21, eff 0.552
# repeats=1):
#   - PROPAGON_JOIN_GATHER=repart pinned at BOTH levels: the map-side
#     partial agg's shuffle volume is nparts-DEPENDENT on sparse graphs
#     (distinct (partition,dst) pairs grow with nparts: modeled 47M rows
#     at nparts=4 vs 115M at nparts=16 on this input), so with
#     shuffle_partitions = 2*cores the 8-core level shuffled ~2.4x the
#     bytes of the 2-core level — a structural anti-scaling term. The
#     repart plan shuffles exactly E rows at every level (level-invariant)
#     and replaces the DRAM-thrashing 12M-key map-side table with
#     partition-local cache-resident aggregation.
#   - PROPAGON_SCALING_FITS=1: a wide fit is ~25 min at 2 cores — JIT
#     warm-up is negligible at that length and best-of-2 doubled exposure
#     to the environmental stall windows documented in RUNS.md.
#   - PROPAGON_SCALING_MAXIT=12: identical iteration count at both
#     levels; bounds wall-clock (tol 1e-6 needs 32 iterations on this
#     graph; per-iteration throughput is homogeneous after iteration 1).
cd "$(dirname "$0")/.."
echo "=== 4f start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_JOIN_GATHER=repart \
PROPAGON_SCALING_FITS=1 \
PROPAGON_SCALING_MAXIT=12 \
python3 BENCH/scaling.py synth-wide 2 8 3 join 2>>BENCH/round4f_wide.log
echo "=== 4f end $(date)"
