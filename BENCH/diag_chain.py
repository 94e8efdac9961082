"""One-off chain-length experiment for the join kernel (round 4).

For each PROPAGON_JOIN_CHAIN value, run one production (non-diag)
convergence fit in a fresh JVM and report setup/iterate split.

Usage: python3 BENCH/diag_chain.py [cores] [chain ...]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from propagon_spark.session import get_spark
from propagon_spark.graph.core import Graph
from propagon_spark.graph.pagerank import pagerank
from propagon_spark.sources.repo_table import synth_repo_table, derive_edges

cores = int(sys.argv[1])
spark = get_spark(app_name=f"chain-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
repo = synth_repo_table(spark, n_repos=100, n_files_per_repo=1000,
                        n_commits_per_repo=150, touch_prob_mod=25)
edges = derive_edges(repo, max_commit_files=100, symmetric=True)
g = Graph.from_edges(edges, weight="weight")
best = None
for _fit in range(1):
    t0 = time.monotonic()
    res = pagerank(g, damping=0.85, sink=sys.argv[2], tol=1e-6,
                   max_iterations=100, impl="join")
    res.ranks.count()
    secs = time.monotonic() - t0
    if best is None or secs < best[0]:
        best = (secs, res)
secs, res = best
print("RESULT " + json.dumps({{
    "cores": cores, "seconds": round(secs, 3), "iterations": res.iterations,
    "timings": {{k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in res.timings.items()}},
    "turns": [(m["steps"], round(m["seconds"], 3)) for m in res.metrics],
}}))
spark.stop()
"""


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sink = sys.argv[2] if len(sys.argv) > 2 else "uniform"
    chains = [int(a) for a in sys.argv[3:]] or [1, 4, 8]
    script = _WORKER.format(repo=REPO)
    for chain in chains:
        env = dict(os.environ, PROPAGON_CSR_NBLOCKS="32",
                   PROPAGON_JOIN_CHAIN=str(chain))
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
        out = subprocess.run(
            [sys.executable, "-c", script, str(cores), sink],
            capture_output=True, text=True, timeout=7200, env=env,
        )
        hit = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not hit:
            print(f"FAILED chain={chain}\n{out.stderr[-2000:]}")
            continue
        r = json.loads(hit[0][len("RESULT "):])
        r["chain"] = chain; r["sink"] = sink
        r["loadavg_at_start"] = load
        print(json.dumps(r))


if __name__ == "__main__":
    main()
