#!/bin/bash
# Round-5 item 1a: ONE full-width phase-timed convergence fit at the
# first beyond-extrapolation size — synth-huge, 103.8M vertices / 591.5M
# directed edges (10x past csr_max_vertices; join kernel only).
# PROPAGON_JOIN_PHASES=1 forces single power steps so per-turn seconds
# are per-iteration seconds and the gather/update split is recorded.
# PROPAGON_LOCAL_DIR on DISK: /dev/shm spill at this size is spill to
# RAM and OOMed the 48g-heap prep JVM (also the honest model of a
# cluster node's local SSD).
cd "$(dirname "$0")/.."
echo "=== 5a start $(date) loadavg $(cat /proc/loadavg)"
# PROPAGON_DRIVER_MEM=96g: the default 48g heap OOMed at this size
# (UnifiedMemoryManager could not grow the execution pool while the
# 591M-row deserialized cache was unrolling under 32 concurrent
# hash-aggs — round5a_huge.log, first attempt). On a real cluster the
# 4N level brings 4N executors' memory; on this one-JVM proxy the
# honest equivalent is a heap the workload actually fits, identical at
# every parallelism level. 96g leaves ~25 GiB for JVM overhead + OS.
mkdir -p /tmp/propagon_huge_local
# PERIODIC_GC=60s: at ~5 GB of checkpoint+shuffle per iteration the
# 75 GB scratch volume holds ~12 iterations of orphaned state; a 60 s
# cleaner cadence bounds it to ~2 iterations (session.py rationale).
PROPAGON_LOCAL_DIR=/tmp/propagon_huge_local \
PROPAGON_DRIVER_MEM=96g PROPAGON_PERIODIC_GC=60s \
PROPAGON_JOIN_PHASES=1 PROPAGON_CSR_NBLOCKS=32 \
python3 - <<'EOF' 2>>BENCH/round5a_huge.log
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from propagon_spark.session import get_spark
from propagon_spark.graph.core import Graph
from propagon_spark.graph.pagerank import pagerank

spark = get_spark(app_name="huge-conv", master="local[32]",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
with open("BENCH/data/synth-huge.json") as f:
    meta = json.load(f)
g = Graph.from_dense_ids(spark.read.parquet("BENCH/data/synth-huge.parquet"),
                         weight="weight", num_vertices=meta["num_vertices"])
t0 = time.monotonic()
# max_iterations=20, not run-to-1e-6: at ~3.5 min/iter (1-core floor
# measurements scaled) a full ~85-iteration convergence would outlive
# the session; 20 phase-timed single steps pin the per-iteration
# gather/update split and the L1 decay rate (recorded per iteration),
# from which iterations-to-1e-6 follows geometrically.
res = pagerank(g, damping=0.85, sink="uniform", tol=1e-6,
               max_iterations=20, impl="join")
res.ranks.count()
secs = time.monotonic() - t0
out = {
    "input": "synth-huge", "cores": 32,
    "vertices": g.num_vertices,
    "dedup_edges": res.timings.get("edge_rows"),
    "seconds": round(secs, 1), "iterations": res.iterations,
    "converged": res.converged,
    "edges_per_sec": round(res.timings.get("edge_rows", 0)
                           * res.iterations / secs),
    "timings": {k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in res.timings.items()},
    "per_iter_s": [round(m["seconds"], 3) for m in res.metrics],
    "l1_first_last": [res.metrics[0]["l1_delta"],
                      res.metrics[-1]["l1_delta"]],
}
print("RESULT " + json.dumps(out))
with open("BENCH/huge_conv32.json", "w") as f:
    json.dump(out, f, indent=1)
spark.stop()
EOF
echo "=== 5a end $(date)"
