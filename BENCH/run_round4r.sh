#!/bin/bash
# Round-4r: +3 resume repeats of the csr 2->8 pair (scaling_2x8.json:
# currently 3 repeats [0.806, 0.594, 0.357], median 0.594 — repeat 3
# ran under the round-3 review's documented interference window). The
# floor pair (run #32, 1->4 median 0.886) already carries the
# criterion; this widens the TRANSPARENCY pair's evidence base in a
# calm window so its median stops resting on one degraded repeat.
cd "$(dirname "$0")/.."
echo "=== 4r start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 python3 BENCH/scaling.py synth 2 8 3 csr 2>>BENCH/round4r_csr.log
echo "=== 4r end $(date)"
