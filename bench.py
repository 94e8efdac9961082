"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "edges_per_sec_pagerank_1e-6", "value": N, "unit": "sec",
"queries": {...}, "sf": ...}``

The headline metric mirrors BASELINE.json: edges-processed/sec for
PageRank iterated to 1e-6 L1 convergence on the co-occurrence graph
derived from lineitem (= |dedup'd directed edges| × iterations / seconds).
Per-query wall times cover the other north-rule operators. Run directly:
``python3 bench.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from propagon_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="propagon-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from propagon_spark.graph.core import Graph
    from propagon_spark.graph.components import connected_components
    from propagon_spark.graph.degree import degree
    from propagon_spark.graph.lpa import label_propagation
    from propagon_spark.graph.pagerank import pagerank
    from propagon_spark.graph.triangles import triangle_total
    from propagon_spark.sources.tpch_graph import cocommit_edges
    from propagon_spark.functions.dedup import exact_duplicates, minhash_near_duplicates
    from propagon_spark.functions.similarity import lsh_cosine_topk
    from pyspark.sql import functions as F

    queries: dict[str, float] = {}
    t_all = time.monotonic()

    # ---- graph construction (shared) ----------------------------------
    t0 = time.monotonic()
    edges = cocommit_edges(spark, sf_dir, symmetric=True)
    g = Graph.from_edges(edges, weight="weight")
    queries["graph_build"] = time.monotonic() - t0
    n_edges = g.num_edge_rows

    # ---- headline: pagerank to 1e-6 -----------------------------------
    t0 = time.monotonic()
    res = pagerank(g, damping=0.85, sink="uniform", tol=1e-6, max_iterations=100)
    res.scores.count()
    pr_secs = time.monotonic() - t0
    queries["pagerank_1e6"] = pr_secs
    # dedup'd directed edge count actually processed per iteration
    dedup_edges = edges.select("src", "dst").distinct().count()
    edges_per_sec = dedup_edges * res.iterations / pr_secs

    t0 = time.monotonic()
    degree(g, "in").count()
    queries["degree_in"] = time.monotonic() - t0

    t0 = time.monotonic()
    connected_components(g).count()
    queries["connected_components"] = time.monotonic() - t0

    t0 = time.monotonic()
    label_propagation(g, max_rounds=5).count()
    queries["lpa_5rounds"] = time.monotonic() - t0

    t0 = time.monotonic()
    triangle_total(g)
    queries["triangle_total"] = time.monotonic() - t0

    # ---- documents / embeddings ---------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.monotonic()
    exact_duplicates(docs).count()
    queries["dedup_exact"] = time.monotonic() - t0

    t0 = time.monotonic()
    minhash_near_duplicates(docs, threshold=0.5).count()
    queries["minhash_neardup"] = time.monotonic() - t0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.monotonic()
    lsh_cosine_topk(emb, k=10).count()
    queries["lsh_ann_topk"] = time.monotonic() - t0

    # comparable-suite total STOPS here: the recall harness below runs an
    # O(n²) brute-force oracle by design and would otherwise read as a
    # regression in round-over-round totals (round-2 verdict)
    total = time.monotonic() - t_all

    # recall@10 of the LSH path vs the brute-force oracle on a bounded
    # sample (the oracle is O(n²)); 4 planes × 32 tables is the
    # near-uniform-corpus config (see similarity.lsh_cosine_topk notes)
    from propagon_spark.functions.similarity import ann_recall_at_k

    t0 = time.monotonic()
    recall = ann_recall_at_k(
        emb.limit(1000), k=10, num_planes=4, num_tables=32
    )
    eval_queries = {"ann_recall_eval": time.monotonic() - t0}
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                # headline (metric, value, unit) IS the throughput metric;
                # suite wall-clock lives under total_seconds
                "metric": "edges_per_sec_pagerank_1e-6",
                "value": round(edges_per_sec),
                "unit": "edges/sec",
                "total_seconds": round(total, 3),
                "queries": {k: round(v, 3) for k, v in queries.items()},
                # measurement harnesses (run their own oracles) — kept out
                # of queries/total_seconds so rounds compare like-for-like
                "eval_queries": {
                    k: round(v, 3) for k, v in eval_queries.items()
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "edges_per_sec": round(edges_per_sec),
                "pagerank_timings": {
                    k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in res.timings.items()
                },
                "pagerank_iterations": res.iterations,
                "pagerank_converged": res.converged,
                "graph_edges": n_edges,
                "dedup_directed_edges": dedup_edges,
                "ann_recall_at_10": round(recall["recall_at_k"], 4),
                "ann_rescore_mismatches": recall["rescore_mismatches"],
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
