#!/bin/bash
# Round-4t: join kernel at the 1->4 bus-contention floor pair on the
# DENSE synth input (222M edges / 1M vertices) — the one cell of the
# kernel x floor-pair matrix without a number (join has 2->8 on synth
# and 1->4 on synth-wide; csr has 1->4 on synth). FITS=1: a 1-core
# join fit on this input runs ~15 min, so JIT warm-up is a negligible
# fraction and best-of-2 would double exposure to stall windows
# (same rationale as the synth-wide pairs, scaling.py:87-93).
cd "$(dirname "$0")/.."
echo "=== 4t start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_FITS=1 \
python3 BENCH/scaling.py synth 1 4 2 join 2>>BENCH/round4t_join.log
echo "=== 4t end $(date)"
