"""Synchronous label propagation (community detection).

North-rule required; absent from the v2 reference (LPA was dropped as
non-goal N1, ``/root/reference/docs/PRD.md:42``), so standard published
semantics (Raghavan et al. 2007) with deterministic tie-breaks
(SURVEY.md §2.4):

- undirected, dedup'd, self-loop-free reading of the edge list;
- init ``label[v] = v``;
- each round every vertex simultaneously adopts the most frequent label
  among its neighbors, ties broken by **min label** (integer ordinal
  reduction → identical assignments at any parallelism);
- stop when no label changes or after ``max_rounds``.

Spark shape per round: one scatter join (labels onto symmetric edges),
``groupBy(dst, label).count()`` for neighborhood histograms, then a
``max_by``-style struct-max to pick (count desc, label asc) — two shuffles
per round, all integer reductions, no floats and no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from propagon_spark.canon import canonical_undirected, symmetrize
from propagon_spark.graph.core import Graph
from propagon_spark.plans.iterate import truncate_lineage, truncate_lineage_lazy

# deserialized columnar cache: the serialized level costs ~1.5x to build
# and ~3.5x per re-read at 2e8 rows (measured; see BENCH/BASELINE.md) -
# iterative kernels re-read their persisted frames every pass
_STORAGE = StorageLevel.MEMORY_AND_DISK_DESER


def label_propagation(g: Graph, max_rounds: int = 20) -> DataFrame:
    """Return ``(name, id, label)`` community assignments.

    ``label`` is the vertex id of the community's representative (min-id
    tie-breaking makes it deterministic). Isolated-after-canonicalization
    vertices (only self-loops) keep their own label.
    """
    nparts = g.edges.rdd.getNumPartitions()
    sym = (
        symmetrize(canonical_undirected(g.edges))
        .repartition(nparts, "src")
        .persist(_STORAGE)
    )
    sym.count()

    labels = (
        g.vocab.select("id", F.col("id").alias("label"))
        .repartition(nparts, "id")
        .transform(truncate_lineage)
    )

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # neighborhood label histogram: for each dst, count labels of its
        # neighbors (src side carries the labels)
        hist = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        # pick (cnt desc, label asc): max over struct (cnt, -label) — a
        # pure integer reduction, deterministic at any parallelism
        best = hist.groupBy("id").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("b")
        ).select("id", (-F.col("b.nl")).alias("nlabel"))

        obs = Observation()
        updated = (
            labels.withColumnRenamed("label", "old")
            .join(best, "id", "left")
            .select("id", "old", F.coalesce("nlabel", F.col("old")).alias("label"))
            .repartition(nparts, "id")
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .drop("old")
            # labels appears twice in this plan → truncate lineage each
            # round; the changed-count is an observed metric of the same job
            .transform(truncate_lineage)
        )
        changed = obs.get["changed"]
        labels = updated
        if changed == 0:
            break

    sym.unpersist()
    out = g.with_names(labels).select("name", "id", "label")
    return out.orderBy("label", "id")
