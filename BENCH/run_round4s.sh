#!/bin/bash
# Round-4s: +2 resume repeats of the csr 8->32 pair (scaling_8x32.json
# holds a single round-3 repeat whose 32-core shard write spiked to
# 44 s). Widening to 3 repeats gives the widest transparency pair a
# median instead of one anomalous run.
cd "$(dirname "$0")/.."
echo "=== 4s start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 python3 BENCH/scaling.py synth 8 32 2 csr 2>>BENCH/round4s_csr.log
echo "=== 4s end $(date)"
