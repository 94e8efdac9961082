#!/bin/bash
# Round-4n: +2 resume repeats of the 2->8 join pair on the >csr-cap
# WIDE input (12M vertices, 175.7M dedup'd edges). The single recorded
# repeat reads 0.723 with the deficit isolated to the iterate phase's
# per-core memory-bandwidth share (RUNS.md #24); more repeats either
# confirm that bus-contention reading across windows or land higher.
cd "$(dirname "$0")/.."
echo "=== 4n start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 PROPAGON_SCALING_FITS=1 PROPAGON_SCALING_MAXIT=4 \
python3 BENCH/scaling.py synth-wide 2 8 2 join 2>>BENCH/round4n_wide.log
echo "=== 4n end $(date)"
