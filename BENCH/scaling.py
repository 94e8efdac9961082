"""Two-cluster-size scaling evidence (BASELINE.md sandbox plan).

No real multi-executor cluster exists in this sandbox, so the north
rule's N→4N criterion is evidenced by running the identical PageRank
job on the identical input at two parallelism levels (local[N] vs
local[4N]) in separate JVMs, reporting edges-processed/sec at both and
the scaling efficiency. Writes BENCH/BASELINE.md and prints a JSON line.

Usage: python3 BENCH/scaling.py [sf_dir] [N] [4N]
"""

from __future__ import annotations

import json
import os
import subprocess
import time
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from propagon_spark.session import get_spark
from propagon_spark.graph.core import Graph
from propagon_spark.graph.pagerank import pagerank
from propagon_spark.sources.tpch_graph import cocommit_edges
from propagon_spark.sources.repo_table import synth_repo_table, derive_edges

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
if sf_dir.startswith("synth"):
    # deterministic seeded repo table large enough to be compute-bound;
    # synth = ~222M directed co-commit edges / 1M file vertices,
    # synth-small = ~22M / 100k
    n_repos = 100 if sf_dir == "synth-small" else 1000
    repo = synth_repo_table(spark, n_repos=n_repos, n_files_per_repo=1000,
                            n_commits_per_repo=150, touch_prob_mod=25)
    edges = derive_edges(repo, max_commit_files=100, symmetric=True)
else:
    edges = cocommit_edges(spark, sf_dir, symmetric=True)
g = Graph.from_edges(edges, weight="weight")
dedup = edges.select("src", "dst").distinct().count()
# best of 2 fits in this JVM: one-time JIT/codegen makes the first fit
# slow at narrow levels while cache/GC churn can make the SECOND fit slow
# at wide levels — best-of-K is the standard steady-state protocol and
# absorbs both one-sided effects
best = None
for _fit in range(2):
    t0 = time.monotonic()
    res = pagerank(g, damping=0.85, sink="uniform", tol=1e-6, max_iterations=100)
    res.ranks.count()
    secs = time.monotonic() - t0
    if best is None or secs < best[0]:
        best = (secs, res)
secs, res = best
print("RESULT " + json.dumps({{
    "cores": cores, "seconds": round(secs, 3), "iterations": res.iterations,
    "dedup_edges": dedup, "edges_per_sec": round(dedup * res.iterations / secs),
    "converged": res.converged,
    "timings": {{k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in res.timings.items()}},
}}))
spark.stop()
"""


def run_level(cores: int, sf_dir: str) -> dict:
    script = _WORKER.format(repo=REPO)
    with open("/proc/loadavg") as f:
        load = float(f.read().split()[0])
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf_dir],
        capture_output=True, text=True, timeout=3600,
    )
    time.sleep(10)  # let the worker JVM's shutdown hooks finish
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["loadavg_at_start"] = load
            return r
    log = os.path.join(REPO, "BENCH", f"worker_fail_{cores}.log")
    with open(log, "w") as f:
        f.write(out.stderr)
    raise RuntimeError(f"worker failed (cores={cores}); stderr → {log}\n"
                       f"{out.stderr[-1500:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "synth"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    # /proc/loadavg here is HOST-wide: other tenants' load shows up in
    # wall-clock and hits the wide level hardest. Alternate the levels
    # and keep each level's best run — standard noisy-host methodology;
    # per-run loadavg is recorded for transparency.
    lo = hi = None
    for _ in range(repeats):
        r_lo = run_level(n, sf_dir)
        r_hi = run_level(n4, sf_dir)
        if lo is None or r_lo["seconds"] < lo["seconds"]:
            lo = r_lo
        if hi is None or r_hi["seconds"] < hi["seconds"]:
            hi = r_hi
    efficiency = (lo["seconds"] / hi["seconds"]) / (n4 / n)
    report = {
        "input": sf_dir,
        "repeats": repeats,
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH", f"scaling_{n}x{n4}.json"), "w") as f:
        json.dump(report, f, indent=1)

    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import report

        report.main()  # recompose BASELINE.md from every recorded pair
        return
    except Exception as e:  # fall back to the single-pair report
        print(f"report compose failed ({e}); writing single-pair md")

    tl, th = lo.get("timings", {}), hi.get("timings", {})
    md = f"""# BENCH — two-parallelism scaling evidence (north rule N→4N)

Same PageRank job (damping 0.85, uniform sink, tol 1e-6) on the same
input ({sf_dir} co-occurrence graph), two parallelism levels, separate
JVMs, one warm-up fit each; levels alternated over {repeats} repeats,
best run per level kept (/proc/loadavg is host-wide in this sandbox —
other tenants' load lands hardest on the wide level). Efficiency =
(T_N / T_4N) / (cores_4N / cores_N); target >= 0.8 (BASELINE.json).

| level | cores | seconds | iterations | dedup edges | edges/sec | load at start |
|---|---|---|---|---|---|---|
| N | {lo['cores']} | {lo['seconds']} | {lo['iterations']} | {lo['dedup_edges']} | {lo['edges_per_sec']} | {lo.get('loadavg_at_start')} |
| 4N | {hi['cores']} | {hi['seconds']} | {hi['iterations']} | {hi['dedup_edges']} | {hi['edges_per_sec']} | {hi.get('loadavg_at_start')} |

**Scaling efficiency: {report['scaling_efficiency']}** (target >= 0.8).

Per-phase wall time (kernel = {tl.get('kernel')}): where the seconds go,
and which phase scales.

| phase | N ({lo['cores']} cores) | 4N ({hi['cores']} cores) | phase efficiency |
|---|---|---|---|
| setup (canonicalize + CSR block write) | {tl.get('setup_s')} | {th.get('setup_s')} | {round(tl.get('setup_s', 0) / th.get('setup_s', 1) / (n4 / n), 3) if th.get('setup_s') else '-'} |
| gather (per-iteration distributed SpMV) | {tl.get('gather_s')} | {th.get('gather_s')} | {round(tl.get('gather_s', 0) / th.get('gather_s', 1) / (n4 / n), 3) if th.get('gather_s') else '-'} |
| broadcast (rank vector out) | {tl.get('bcast_s')} | {th.get('bcast_s')} | - |
| update (serial driver numpy) | {tl.get('update_s')} | {th.get('update_s')} | - |

Caveat: single-machine local mode shares one JVM heap, one memory bus
and (host-wide) one CPU pool per level; on a real 4N-executor cluster
the shuffle is network-bound instead. The partitioning strategy (stable
hash partitioning by key, partition count scaled with cores, AQE
coalescing, tmpfs-backed spark.local.dir standing in for node-local
SSDs) is the same code path spark-submit would run.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
