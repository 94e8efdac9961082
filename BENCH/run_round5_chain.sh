#!/bin/bash
# Round-5 chain: materialize synth-huge once, then 5a (32-core
# phase-timed convergence fit) and 5b (1->4 floor pair). Data prep is
# re-run because BENCH/data/ is gitignored scratch that did not survive
# the session boundary; generation is deterministic so the input is
# bit-identical to the round-5-start prep (prep_huge2.log).
cd "$(dirname "$0")/.."
set -e
echo "=== chain start $(date) loadavg $(cat /proc/loadavg)"
mkdir -p /tmp/propagon_huge_local
PROPAGON_LOCAL_DIR=/tmp/propagon_huge_local \
python3 - <<'PYEOF' 2>>BENCH/round5_prep.log
import sys, os
sys.path.insert(0, os.getcwd() + "/BENCH")
import scaling
scaling.prepare_input("synth-huge")
PYEOF
echo "=== prep done $(date)"
bash BENCH/run_round5.sh
echo "=== 5a done $(date)"
bash BENCH/run_round5b.sh
echo "=== 5b done $(date)"
