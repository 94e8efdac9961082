"""Harmonic centrality (exact or sampled-source estimator).

Reference: ``/root/reference/crates/propagon/src/algos/harmonic.rs:46-117``.
Semantics:
- ``direction``: ``in`` sums ``1/d(j→i)`` over reachers j (forward-edge
  SSSP from each source), ``out`` reversed, ``total`` undirected;
- ``cost``: unit hops (BFS) here — weighted Dijkstra distances are not
  practical as a dataflow recurrence at scale (each relaxation round is a
  full shuffle; the reference itself flags SourceBudget::All as the only
  exact mode and sampling as the scale path);
- source budget: all vertices, or ``count`` seeded sampled distinct
  sources with scores scaled by n/count (Boldi-Vigna estimator; canonical
  seed 2014, ``harmonic.rs:108``).

Spark shape: all sampled sources advance one BFS **together** — the
frontier frame is keyed ``(source, node)`` so each round is one join +
anti-join over the whole batch; rounds = eccentricity bound, not
#sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propagon_spark.canon import dedup_edges, symmetrize
from propagon_spark.errors import InvalidParameterError
from propagon_spark.graph.core import Graph, sorted_scores
from propagon_spark.plans.iterate import truncate_lineage

DEFAULT_SAMPLE_SEED = 2014


def harmonic(
    g: Graph,
    direction: str = "in",
    sample: int | None = None,
    seed: int = DEFAULT_SAMPLE_SEED,
    max_depth: int = 64,
) -> DataFrame:
    """Return ``(name, score)``; ``sample=None`` = exact (one BFS per
    vertex — feasible for small/medium graphs), else the n/count-scaled
    sampled estimator."""
    if direction not in ("in", "out", "total"):
        raise InvalidParameterError(f"bad direction {direction!r}")
    n = g.num_vertices
    nparts = g.edges.rdd.getNumPartitions()

    e = dedup_edges(g.edges)
    if direction == "in":
        adj = e  # forward: source j reaches i ⇒ contributes 1/d to i
    elif direction == "out":
        adj = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    else:
        adj = symmetrize(e).distinct()
    adj = truncate_lineage(adj.repartition(nparts, "src"))

    vids = g.vocab.select("id")
    if sample is None or sample >= n:
        sources = vids.select(F.col("id").alias("source"))
        scale = 1.0
    else:
        # deterministic seeded distinct-source draw: the `sample` smallest
        # hash(id, seed) values (order-statistics sampling, no RNG stream)
        sources = (
            vids.select(
                F.col("id").alias("source"),
                F.xxhash64(F.col("id"), F.lit(seed)).alias("_h"),
            )
            .orderBy("_h")
            .limit(sample)
            .select("source")
        )
        scale = n / float(sample)

    # frontier BFS over all sources at once; visited = (source, node, dist)
    frontier = truncate_lineage(
        sources.select("source", F.col("source").alias("node"))
    )
    visited = frontier.withColumn("dist", F.lit(0))
    contrib = None  # accumulated (node, h) partial harmonic sums

    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            frontier.join(adj.withColumnRenamed("src", "node"), "node")
            .select("source", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("source", "node"), ["source", "node"], "left_anti")
        )
        nxt = truncate_lineage(nxt.repartition(nparts, "node"))
        cnt = nxt.count()
        if cnt == 0:
            break
        step_contrib = nxt.groupBy("node").agg(
            (F.count("*") / F.lit(float(depth))).alias("h")
        )
        contrib = (
            step_contrib
            if contrib is None
            else truncate_lineage(
                contrib.unionAll(step_contrib)
                .groupBy("node")
                .agg(F.sum("h").alias("h"))
            )
        )
        visited = truncate_lineage(
            visited.unionAll(nxt.withColumn("dist", F.lit(depth)))
        )
        frontier = nxt

    if contrib is None:
        scored = g.vocab.select("name", F.lit(0.0).alias("score"))
        return sorted_scores(scored)
    out = (
        g.vocab.join(contrib.withColumnRenamed("node", "id"), "id", "left")
        .select(
            "name",
            (F.coalesce("h", F.lit(0.0)) * F.lit(scale)).alias("score"),
        )
    )
    return sorted_scores(out)
