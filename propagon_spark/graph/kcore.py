"""k-core decomposition (coreness per vertex).

Reference: ``/root/reference/crates/propagon/src/algos/kcore.rs:40-100``
(Batagelj & Zaversnik peel). Undirected, unweighted, dedup'd, self-loops
dropped. Peel: starting at k=0, repeatedly remove every vertex of degree
≤ k (cascading) before moving to k+1; a vertex's coreness is the k it
fell at. Isolated vertices (only self-loops) get coreness 0.

Spark shape (round-5 delta-degree rewrite): the symmetrized edge frame is
materialized ONCE and never rewritten. Each inner round joins only the
just-peeled frontier against it — ``sym ⋈ peel(dst) → groupBy(src)`` —
and SUBTRACTS those neighbor counts from the survivors' running degrees,
so per-round shuffle volume is proportional to the frontier's adjacency,
not the graph (the previous shape re-aggregated full degrees over a
twice-anti-joined, re-materialized edge set every round — thousands of
full-edge-scan jobs on a high-degeneracy 100×-scale graph). Each edge
(x, u) is subtracted from x exactly once — at the round u peels — and
contributions from already-dead x are dropped by the survivor join, so
the running degree equals the recomputed one at every step. Empty k
levels are skipped by jumping k to the minimum surviving degree instead
of incrementing by 1 (the reference's dense ladder is free in-core; on a
cluster each empty level would be a wasted job).
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
    # immutable for the whole peel: persisted blocks, read once per round
    # by the frontier join (never anti-joined down, never re-checkpointed)
    sym = (
        symmetrize(canonical_undirected(g.edges))
        .repartition(nparts, "src")
        .persist(_STORAGE)
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
            peel = truncate_lineage(alive.where(F.col("deg") <= k).select("id"))
            n_peel = peel.count()
            if n_peel == 0:
                break
            assigned = truncate_lineage(assigned.unionAll(
                peel.select("id", F.lit(k).cast("long").alias("coreness"))
            ))
            remaining -= n_peel
            if remaining == 0:
                break
            # delta-degree: count each survivor's edges INTO the peeled
            # frontier (sym is symmetric, so dst-side matching sees every
            # incident edge) and subtract. Contributions land once per
            # edge; dead src rows fall out of the survivor left-join.
            delta = (
                sym.join(peel.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.count("*").alias("_removed"))
            )
            alive = truncate_lineage(
                alive.join(peel, "id", "left_anti")
                .join(delta, "id", "left")
                .select(
                    "id",
                    (
                        F.col("deg") - F.coalesce("_removed", F.lit(0))
                    ).cast("long").alias("deg"),
                )
            )
        if remaining == 0:
            break
        # jump the ladder to the next populated level (min surviving
        # degree is > k here, else the inner loop would have peeled it)
        k = alive.agg(F.min("deg")).first()[0]

    sym.unpersist()
    out = g.with_names(assigned).select("name", "id", "coreness")
    return out.orderBy(F.desc("coreness"), F.asc("id"))
