#!/bin/bash
# Round-5 chain, take 2: the first chain's 5a leg started at loadavg 25
# (prep JVM decay + the concurrent full pytest run) — contaminated
# phase timings, killed at iteration ~1 and restarted here on a calm
# machine. Data prep already done (BENCH/data/synth-huge.*).
cd "$(dirname "$0")/.."
set -e
# cool-down gate (same rationale as scaling.py::_cooldown): legs must
# start calm or phase timings measure the neighbor, not the kernel
for i in $(seq 1 60); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$L" 'BEGIN{exit !(l < 1.0)}' && break
  sleep 15
done
echo "=== chain2 start $(date) loadavg $(cat /proc/loadavg)"
bash BENCH/run_round5.sh
echo "=== 5a done $(date)"
bash BENCH/run_round5b.sh
echo "=== 5b done $(date)"
