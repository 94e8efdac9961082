"""k-core decomposition (coreness per vertex).

Reference: ``/root/reference/crates/propagon/src/algos/kcore.rs:40-100``
(Batagelj & Zaversnik peel). Undirected, unweighted, dedup'd, self-loops
dropped. Peel: starting at k=0, repeatedly remove every vertex of degree
≤ k (cascading) before moving to k+1; a vertex's coreness is the k it
fell at. Isolated vertices (only self-loops) get coreness 0.

Spark shape: driver-controlled cascade — per inner round one degree
aggregation + an anti-join removal; labels accumulate in a running
(id, coreness) frame, lineage truncated every round. The same loop driver
as ``filter_min_count`` (``dataset/pairwise.rs:213-256``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from propagon_spark.canon import canonical_undirected, symmetrize
from propagon_spark.graph.core import Graph
from propagon_spark.plans.iterate import truncate_lineage

# deserialized columnar cache: the serialized level costs ~1.5x to build
# and ~3.5x per re-read at 2e8 rows (measured; see BENCH/BASELINE.md) -
# iterative kernels re-read their persisted frames every pass
_STORAGE = StorageLevel.MEMORY_AND_DISK_DESER


def kcore(g: Graph) -> DataFrame:
    """Return ``(name, id, coreness)`` ordered (coreness desc, id asc)."""
    nparts = g.edges.rdd.getNumPartitions()
    sym = (
        symmetrize(canonical_undirected(g.edges))
        .repartition(nparts, "src")
        .transform(truncate_lineage)
    )

    # state: (id, deg) of still-alive vertices; (id, coreness) accumulator
    alive = (
        g.vocab.select("id")
        .join(
            sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg")),
            "id",
            "left",
        )
        .select("id", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
        .transform(truncate_lineage)
    )
    assigned = g.spark.createDataFrame([], "id long, coreness long")

    k = 0
    remaining = alive.count()
    while remaining > 0:
        while True:
            peel = alive.where(F.col("deg") <= k).select("id")
            n_peel = peel.count()
            if n_peel == 0:
                break
            assigned = truncate_lineage(assigned.unionAll(
                peel.select("id", F.lit(k).cast("long").alias("coreness"))
            ))
            # remove peeled vertices and their edges; recompute degrees of
            # survivors from the surviving edge set
            sym = (
                sym.join(peel.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(peel.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .transform(truncate_lineage)
            )
            alive = (
                alive.join(peel, "id", "left_anti")
                .select("id")
                .join(
                    sym.groupBy(F.col("src").alias("id")).agg(
                        F.count("*").alias("deg")
                    ),
                    "id",
                    "left",
                )
                .select("id", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
                .transform(truncate_lineage)
            )
            remaining -= n_peel
        k += 1

    out = g.with_names(assigned).select("name", "id", "coreness")
    return out.orderBy(F.desc("coreness"), F.asc("id"))
