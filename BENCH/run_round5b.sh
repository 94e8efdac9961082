#!/bin/bash
# Round-5 item 1b: join kernel 1->4 floor pair on synth-huge (103.8M
# vertices / 591.5M edges) — the first actual beyond-csr-cap scaling
# datapoint (everything past 12M vertices was extrapolation until now).
# FITS=1 (a 1-core fit here runs ~40 min: JIT warm-up negligible,
# best-of-2 doubles stall-window exposure — run_round4t.sh rationale).
# MAXIT=3: identical iteration budget at both levels, so the throughput
# ratio the criterion divides is unaffected; bounds the 1-core leg.
# Disk-backed local dir (see run_round5.sh).
cd "$(dirname "$0")/.."
echo "=== 5b start $(date) loadavg $(cat /proc/loadavg)"
# 96g heap at BOTH levels — same rationale and identical-level rule as
# run_round5.sh (the 48g default OOMed the 32-core fit at this size)
mkdir -p /tmp/propagon_huge_local
PROPAGON_LOCAL_DIR=/tmp/propagon_huge_local \
PROPAGON_DRIVER_MEM=96g PROPAGON_PERIODIC_GC=60s \
PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=3 \
python3 BENCH/scaling.py synth-huge 1 4 2 join 2>>BENCH/round5b_huge.log
echo "=== 5b end $(date)"
