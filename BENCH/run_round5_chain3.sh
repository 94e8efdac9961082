#!/bin/bash
# Round-5 chain, take 3. Changes from take 2 (both after measured
# failures on the 103.8M-vertex input):
#  - 5b (the 1->4 floor pair, MAXIT=3, the north-rule datapoint) runs
#    FIRST — bounded disk footprint, banks the critical evidence;
#    5a (full convergence fit) follows and bears the accumulation risk.
#  - pagerank join kernel now releases the dedup'd edge cache after
#    scatter/vstat materialize (pagerank.py) and the session reaps
#    orphaned state every 60 s (PROPAGON_PERIODIC_GC).
#  - disk monitor attributes blockmgr bytes to shuffle vs rdd blocks
#    every 30 s -> round5_diskmon.log, so a failure names its cause.
cd "$(dirname "$0")/.."
set -e
( while true; do
    B=/tmp/propagon_huge_local
    SH=$(find $B -name 'shuffle_*' -o -name 'temp_shuffle_*' 2>/dev/null | xargs -r du -cb 2>/dev/null | tail -1 | cut -f1)
    RD=$(find $B -name 'rdd_*' 2>/dev/null | xargs -r du -cb 2>/dev/null | tail -1 | cut -f1)
    echo "$(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1 | tr -d ' ') shuffle=${SH:-0} rdd=${RD:-0} load=$(cut -d' ' -f1 /proc/loadavg)"
    sleep 30
  done ) >> BENCH/round5_diskmon.log 2>/dev/null &
MON=$!
trap "kill $MON 2>/dev/null" EXIT
for i in $(seq 1 60); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$L" 'BEGIN{exit !(l < 1.0)}' && break
  sleep 15
done
echo "=== chain3 start $(date) loadavg $(cat /proc/loadavg)"
bash BENCH/run_round5b.sh
echo "=== 5b done $(date)"
bash BENCH/run_round5.sh
echo "=== 5a done $(date)"
