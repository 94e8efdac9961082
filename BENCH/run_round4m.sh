#!/bin/bash
# Round-4m: +2 resume repeats of the HEADLINE 2->8 join pair (synth,
# 222M edges) to widen the 3-repeat median (0.919/0.899/0.447) to 5.
cd "$(dirname "$0")/.."
echo "=== 4m start $(date) loadavg $(cat /proc/loadavg)"
PROPAGON_SCALING_RESUME=1 python3 BENCH/scaling.py synth 2 8 2 join 2>>BENCH/round4m_synth.log
echo "=== 4m end $(date)"
