"""A/B diagnostic for the join-kernel gather plan on wide (high-vertex)
graphs — run #22 evidence (BENCH/RUNS.md).

Runs the join kernel on a mid-size synth-wide-shaped input (same
generator and density as the scaling harness's `synth-wide`, scaled
down by the repo count) at one core count with one gather mode, and
prints the fit timings. Usage:

    python3 BENCH/diag_wide.py <cores> <agg|repart|auto> [n_repos=15000]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
mode = sys.argv[2]
n_repos = int(sys.argv[3]) if len(sys.argv) > 3 else 15_000
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8

os.environ["PROPAGON_JOIN_GATHER"] = mode

from propagon_spark.session import get_spark  # noqa: E402
from propagon_spark.graph.core import Graph  # noqa: E402
from propagon_spark.graph.pagerank import pagerank  # noqa: E402
from propagon_spark.sources.repo_table import (  # noqa: E402
    synth_repo_table_sparse,
    derive_edges,
)

spark = get_spark(app_name=f"diag-wide-{cores}-{mode}",
                  master=f"local[{cores}]", shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")

_data = os.path.join(REPO, "BENCH", "data", "synth-wide")
if n_repos == 60_000 and os.path.exists(_data + ".json"):
    # materialized interned input (BENCH/scaling.py prepare_input)
    with open(_data + ".json") as f:
        meta = json.load(f)
    g = Graph.from_dense_ids(spark.read.parquet(_data + ".parquet"),
                             weight="weight",
                             num_vertices=meta["num_vertices"])
else:
    repo = synth_repo_table_sparse(spark, n_repos=n_repos,
                                   n_files_per_repo=400,
                                   n_commits_per_repo=23,
                                   files_per_commit=12)
    edges = derive_edges(repo, max_commit_files=100, symmetric=True)
    g = Graph.from_edges(edges, weight="weight")

t0 = time.monotonic()
res = pagerank(g, damping=0.85, sink="uniform", tol=None, iterations=iters,
               impl="join")
res.ranks.count()
secs = time.monotonic() - t0
print("RESULT " + json.dumps({
    "cores": cores, "mode": mode, "n_repos": n_repos,
    "vertices": g.num_vertices, "seconds": round(secs, 3),
    "timings": {k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in res.timings.items()},
}))
spark.stop()
