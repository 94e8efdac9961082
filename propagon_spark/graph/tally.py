"""Pairwise-dataset operations (the graph-adjacent subset).

Reference: ``/root/reference/crates/propagon/src/dataset/pairwise.rs`` —
``tally`` (195-208), ``filter_min_count`` (213-256), ``as_graph``
(258-268). A pairwise frame has columns
``(winner, loser, weight, period)`` (FIXTURES.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propagon_spark.plans.iterate import truncate_lineage


def as_graph(pairwise: DataFrame) -> DataFrame:
    """Reinterpret comparisons as endorsement edges ``loser → winner``
    (``pairwise.rs:258-268``); weight carried through."""
    return pairwise.select(
        F.col("loser").alias("src"),
        F.col("winner").alias("dst"),
        F.col("weight"),
    )


def tally(pairwise: DataFrame) -> DataFrame:
    """Per-entity win/loss counts and weights (``pairwise.rs:195-208``).

    Returns ``(name, wins, losses, win_weight, loss_weight)`` — every
    entity that appears on either side, zeros where absent — ordered
    (wins desc, name asc).
    """
    w = pairwise.groupBy(F.col("winner").alias("name")).agg(
        F.count("*").alias("wins"), F.sum("weight").alias("win_weight")
    )
    l = pairwise.groupBy(F.col("loser").alias("name")).agg(
        F.count("*").alias("losses"), F.sum("weight").alias("loss_weight")
    )
    return (
        w.join(l, "name", "full_outer")
        .select(
            "name",
            F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
            F.coalesce("losses", F.lit(0)).cast("long").alias("losses"),
            F.coalesce("win_weight", F.lit(0.0)).alias("win_weight"),
            F.coalesce("loss_weight", F.lit(0.0)).alias("loss_weight"),
        )
        .orderBy(F.desc("wins"), F.asc("name"))
    )


def filter_min_count(pairwise: DataFrame, min_count: int) -> DataFrame:
    """Iteratively drop rows whose endpoints appear in fewer than
    ``min_count`` rows — cascading until a fixpoint
    (``pairwise.rs:213-256``). Same driver loop as k-core peeling."""
    if min_count <= 1:
        return pairwise
    cur = truncate_lineage(pairwise)
    while True:
        appearances = (
            cur.select(F.col("winner").alias("name"))
            .unionAll(cur.select(F.col("loser").alias("name")))
            .groupBy("name")
            .agg(F.count("*").alias("cnt"))
        )
        keep = appearances.where(F.col("cnt") >= min_count).select("name")
        nxt = (
            cur.join(keep.withColumnRenamed("name", "winner"), "winner", "left_semi")
            .join(keep.withColumnRenamed("name", "loser"), "loser", "left_semi")
            .transform(truncate_lineage)
        )
        before, after = cur.count(), nxt.count()
        cur = nxt
        if after == before or after == 0:
            return cur.select("winner", "loser", "weight", "period")
