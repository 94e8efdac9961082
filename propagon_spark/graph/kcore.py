"""k-core decomposition (coreness per vertex).

Reference: ``/root/reference/crates/propagon/src/algos/kcore.rs:40-100``
(Batagelj & Zaversnik peel). Undirected, unweighted, dedup'd, self-loops
dropped. Peel: starting at k=0, repeatedly remove every vertex of degree
≤ k (cascading) before moving to k+1; a vertex's coreness is the k it
fell at. Isolated vertices (only self-loops) get coreness 0.

Spark shape (round-5 delta-degree rewrite): per inner round, only the
just-peeled frontier joins the edge frame — ``sym ⋈ peel(dst) →
groupBy(src)`` — and those neighbor counts are SUBTRACTED from the
survivors' running degrees; no per-round full-degree re-aggregation and
no per-round edge-set anti-join rewrite (the round-4 shape did both —
two materialized edge rewrites plus a full re-agg every round). Each
edge (x, u) is subtracted from x exactly once — at the round u peels —
and contributions from already-dead x are dropped by the survivor join,
so the running degree equals the recomputed one at every step.

The persisted edge frame is compacted GEOMETRICALLY, not per round: when
half the vertices alive at the last build have peeled, ``sym`` is
semi-joined down to the survivors and re-persisted. Delta-only with an
immutable edge set makes every round scan all E original rows (measured
2056→1810 driver jobs but 83→125 s on the sf0.1 full graph — the
always-full probe beat the job savings); per-round rewriting makes early
rounds pay thousands of full materializations. Geometric compaction
amortizes to O(E) total rewrite work (each edge is rewritten O(1) times
in expectation under halving) while keeping every round's aggregation
frontier-proportional. Empty k levels are skipped by jumping k to the
minimum surviving degree (the reference's dense ladder is free in-core;
on a cluster each empty level would be a wasted job).
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


def kcore(g: Graph, method: str = "hindex") -> DataFrame:
    """Return ``(name, id, coreness)`` ordered (coreness desc, id asc).

    ``method="hindex"`` (default): iterated H-index (Lü, Chen, Ren,
    Zhang, Zhang & Zhou, *Nature Physics* 2016) — h₀ = degree,
    h_{n+1}[v] = H-index of {h_n[u] : u ∈ N(v)}; the fixpoint is exactly
    the coreness. Converges in tens of rounds on real graphs, each round
    one vertex-parallel join+window over the edge set — versus the
    peel cascade's HUNDREDS of driver rounds (the sf0.1 full graph
    cascades ~450 rounds; measured 86-125 s peel vs ~20 s hindex, same
    output). Bounded round count × all-parallel rounds is the shape that
    survives a 1000-executor scale-up.

    ``method="peel"``: the reference-shaped Batagelj-Zaversnik cascade
    (``kcore.rs:40-100``), delta-degree + geometric compaction — kept as
    the semantics mirror and equivalence oracle (see module docstring).
    """
    if method not in ("hindex", "peel"):
        raise ValueError(f"method must be hindex|peel, got {method!r}")
    if method == "hindex":
        return _kcore_hindex(g)
    return _kcore_peel(g)


def _kcore_hindex(g: Graph) -> DataFrame:
    """Iterated-H-index coreness: per round, every vertex's h becomes
    the H-index of its neighbors' h values (max t s.t. ≥ t neighbors
    have h ≥ t), computed as ``max(least(h_nbr, rank))`` over the
    per-vertex descending sort — one shuffle join + one window sort per
    round, all vertices in parallel, lineage truncated per round. The
    sequence is monotonically non-increasing and lower-bounded by the
    coreness, so the changed-count Observation hitting zero IS the
    fixpoint."""
    from pyspark.sql import Observation, Window

    nparts = g.edges.rdd.getNumPartitions()
    sym = (
        symmetrize(canonical_undirected(g.edges))
        .repartition(nparts, "src")
        .persist(_STORAGE)
    )
    sym.count()

    h = truncate_lineage(
        g.vocab.select("id")
        .join(
            sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("h")),
            "id",
            "left",
        )
        .select("id", F.coalesce("h", F.lit(0)).cast("long").alias("h"))
    )

    while True:
        nbr = sym.join(
            h.select(F.col("id").alias("dst"), F.col("h").alias("_hn")), "dst"
        ).select("src", "_hn")
        w = Window.partitionBy("src").orderBy(F.desc("_hn"))
        hidx = (
            nbr.withColumn("_rk", F.row_number().over(w))
            .groupBy(F.col("src").alias("id"))
            .agg(F.max(F.least(F.col("_hn"), F.col("_rk"))).alias("_hi"))
        )
        obs = Observation()
        nxt = (
            h.withColumnRenamed("h", "_old")
            .join(hidx, "id", "left")
            .select(
                "id",
                F.coalesce("_hi", F.lit(0)).cast("long").alias("h"),
                "_old",
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("h") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .drop("_old")
            .transform(truncate_lineage)
        )
        changed = obs.get["changed"]
        h = nxt
        if changed == 0:
            break

    sym.unpersist()
    out = g.with_names(h.select("id", F.col("h").alias("coreness")))
    return out.select("name", "id", "coreness").orderBy(
        F.desc("coreness"), F.asc("id")
    )


def _kcore_peel(g: Graph) -> DataFrame:
    """Reference-shaped peel cascade (see :func:`kcore`)."""
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
    alive_at_build = remaining
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
            # geometric compaction: once half the vertices alive at the
            # last build have peeled, shrink the probe side to survivors
            # (dead edges only waste scan time — degrees stay exact
            # either way, each edge still deltas exactly once)
            if remaining <= alive_at_build // 2:
                ids = alive.select("id")
                nxt = (
                    sym.join(ids.withColumnRenamed("id", "src"), "src",
                             "left_semi")
                    .join(ids.withColumnRenamed("id", "dst"), "dst",
                          "left_semi")
                    .persist(_STORAGE)
                )
                nxt.count()
                sym.unpersist()
                sym = nxt
                alive_at_build = remaining
        if remaining == 0:
            break
        # jump the ladder to the next populated level (min surviving
        # degree is > k here, else the inner loop would have peeled it)
        k = alive.agg(F.min("deg")).first()[0]

    sym.unpersist()
    out = g.with_names(assigned).select("name", "id", "coreness")
    return out.orderBy(F.desc("coreness"), F.asc("id"))
