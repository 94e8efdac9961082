"""spark-submit entry point: PageRank over a repo-shaped edge graph.

The north rule runs the engine "via spark-submit --py-files on
multi-executor clusters" — this is that driver program. It imports
propagon_spark ONLY from the ``--py-files`` archive (no repo-path
sys.path hack), derives the co-occurrence edge graph, fits PageRank to
convergence, and prints one JSON line. Package + submit:

    cd /root/repo && zip -qr /tmp/propagon_spark.zip propagon_spark
    spark-submit --master local[4] --py-files /tmp/propagon_spark.zip \
        scripts/submit_pagerank.py /root/testdata/sf0.001 uniform

On a real cluster only ``--master`` changes (yarn / k8s / spark://…);
the job inherits the session's checkpoint dir + shuffle settings from
``propagon_spark.session.get_spark`` defaults, all cluster-safe.

Usage: submit_pagerank.py [sf_dir|synth-small] [sink] [tol]
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sink = sys.argv[2] if len(sys.argv) > 2 else "uniform"
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-6

    # spark-submit owns the session: build it from the submit conf, not
    # get_spark (which is the in-process/library path). The engine is a
    # library — it runs on whatever session the cluster hands it.
    spark = SparkSession.builder.appName("propagon-submit-pagerank").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from propagon_spark.graph.core import Graph
    from propagon_spark.graph.pagerank import pagerank
    from propagon_spark.sources.repo_table import derive_edges, synth_repo_table
    from propagon_spark.sources.tpch_graph import cocommit_edges

    if src.startswith("synth"):
        repo = synth_repo_table(spark, n_repos=10, n_files_per_repo=200,
                                n_commits_per_repo=50, touch_prob_mod=25)
        edges = derive_edges(repo, max_commit_files=100, symmetric=True)
    else:
        edges = cocommit_edges(spark, src, symmetric=True)

    g = Graph.from_edges(edges, weight="weight")
    res = pagerank(g, damping=0.85, sink=sink, tol=tol, max_iterations=100)
    top = [
        {"name": r["name"], "score": round(r["score"], 9)}
        for r in res.scores.limit(5).collect()
    ]
    print(json.dumps({
        "packaged_via": "--py-files",
        "master": spark.sparkContext.master,
        "vertices": g.num_vertices,
        "dedup_edges": res.timings.get("edge_rows"),
        "iterations": res.iterations,
        "converged": res.converged,
        "kernel": res.timings.get("kernel"),
        "top5": top,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
