"""One-off join-kernel phase diagnostic (round-4 verdict item 1).

Runs the join kernel once per parallelism level with
PROPAGON_JOIN_PHASES=1 (single steps, gather materialized separately)
so the per-iteration wall splits into gather (edge-heavy scatter join +
agg) vs update (vstat join + sink term + lineage truncation) plus a
trivial-job sample of the per-job fixed cost. Prints one JSON line per
level. Not part of the recorded evidence — scaling.py is.

Usage: python3 BENCH/diag_join.py [sf_dir] [cores ...]
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
sf_dir = sys.argv[2]
spark = get_spark(app_name=f"diag-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
n_repos = 100 if sf_dir == "synth-small" else 1000
repo = synth_repo_table(spark, n_repos=n_repos, n_files_per_repo=1000,
                        n_commits_per_repo=150, touch_prob_mod=25)
edges = derive_edges(repo, max_commit_files=100, symmetric=True)
g = Graph.from_edges(edges, weight="weight")
t0 = time.monotonic()
res = pagerank(g, damping=0.85, sink="uniform", tol=1e-6,
               max_iterations=100, impl="join")
res.ranks.count()
secs = time.monotonic() - t0
print("RESULT " + json.dumps({{
    "cores": cores, "seconds": round(secs, 3), "iterations": res.iterations,
    "timings": {{k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in res.timings.items()}},
    "per_iter": [round(m["seconds"], 3) for m in res.metrics],
}}))
spark.stop()
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "synth-small"
    levels = [int(a) for a in sys.argv[2:]] or [2, 8]
    script = _WORKER.format(repo=REPO)
    env = dict(os.environ, PROPAGON_CSR_NBLOCKS="32",
               PROPAGON_JOIN_PHASES="1")
    for cores in levels:
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
        out = subprocess.run(
            [sys.executable, "-c", script, str(cores), sf_dir],
            capture_output=True, text=True, timeout=7200, env=env,
        )
        hit = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not hit:
            print(f"FAILED cores={cores}\n{out.stderr[-2000:]}")
            continue
        r = json.loads(hit[0][len("RESULT "):])
        r["loadavg_at_start"] = load
        print(json.dumps(r))


if __name__ == "__main__":
    main()
