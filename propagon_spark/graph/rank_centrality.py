"""Rank Centrality (Negahban-Oh-Shah) over pairwise comparisons.

Reference: ``/root/reference/crates/propagon/src/algos/rank_centrality.rs:52-140``.
Semantics:
- aggregate wins per ordered pair; for each unordered pair {a,b} with
  total weight t > 0, transition ``a → b = w_ba / (t · d_max)`` (walk
  toward the winner proportional to its win fraction);
- d_max = max number of distinct opponents over all entities;
- power-iterate with implicit self-loops (``π_i·(1−Σ leaving)``),
  defaults iterations=200, tolerance=1e-10 (L1 change);
- stationary distribution sums to 1.

Spark shape: one pair-aggregation pass builds the transition edge frame,
then the shared scatter-gather power iteration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propagon_spark.errors import EmptyDatasetError, NumericError
from propagon_spark.graph.core import sorted_scores
from propagon_spark.ids import build_vocab
from propagon_spark.plans.iterate import truncate_lineage


def rank_centrality(
    pairwise: DataFrame, iterations: int = 200, tolerance: float = 1e-10
) -> DataFrame:
    """Fit on a ``(winner, loser, weight[, period])`` frame; returns
    ``(name, score)`` (scores sum to 1)."""
    raw = pairwise.select(
        F.col("winner").cast("string").alias("w"),
        F.col("loser").cast("string").alias("l"),
        F.col("weight").cast("double").alias("x"),
    )
    if raw.rdd.isEmpty():
        raise EmptyDatasetError("empty pairwise dataset")

    vocab = build_vocab(
        raw.select(F.col("w").alias("name")).unionAll(
            raw.select(F.col("l").alias("name"))
        )
    )
    n = vocab.count()

    ids_w = vocab.select(F.col("name").alias("w"), F.col("id").alias("wi"))
    ids_l = vocab.select(F.col("name").alias("l"), F.col("id").alias("li"))
    wins = (
        raw.join(ids_w, "w")
        .join(ids_l, "l")
        .groupBy(F.col("wi").alias("a"), F.col("li").alias("b"))
        .agg(F.sum("x").alias("wab"))
    )

    # unordered pair stats: (lo, hi, w_lo_beats_hi, w_hi_beats_lo)
    upair = (
        wins.select(
            F.least("a", "b").alias("lo"),
            F.greatest("a", "b").alias("hi"),
            F.when(F.col("a") < F.col("b"), F.col("wab")).otherwise(0.0).alias("wlh"),
            F.when(F.col("a") > F.col("b"), F.col("wab")).otherwise(0.0).alias("whl"),
        )
        .groupBy("lo", "hi")
        .agg(F.sum("wlh").alias("wlh"), F.sum("whl").alias("whl"))
        .withColumn("t", F.col("wlh") + F.col("whl"))
    )
    upair = truncate_lineage(upair)

    deg = (
        upair.select(F.col("lo").alias("id"))
        .unionAll(upair.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    d_max = float(deg.agg(F.max("deg")).first()[0] or 1)

    # transitions: lo→hi with p = whl/(t·d_max); hi→lo with p = wlh/(t·d_max)
    pos = upair.where(F.col("t") > 0)
    trans = truncate_lineage(
        pos.select(
            F.col("lo").alias("src"),
            F.col("hi").alias("dst"),
            (F.col("whl") / (F.col("t") * F.lit(d_max))).alias("p"),
        ).unionAll(
            pos.select(
                F.col("hi").alias("src"),
                F.col("lo").alias("dst"),
                (F.col("wlh") / (F.col("t") * F.lit(d_max))).alias("p"),
            )
        )
    )
    leaving = trans.groupBy(F.col("src").alias("id")).agg(
        F.sum("p").alias("leave")
    )
    stay = truncate_lineage(
        vocab.select("id")
        .join(leaving, "id", "left")
        .select("id", (1.0 - F.coalesce("leave", F.lit(0.0))).alias("stay"))
    )

    pi = truncate_lineage(
        vocab.select("id", F.lit(1.0 / n).alias("pi"))
    )
    it = 0
    while it < iterations:
        it += 1
        gathered = (
            trans.join(pi.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("p") * F.col("pi")).alias("m"))
        )
        nxt = (
            stay.join(pi, "id")
            .join(gathered, "id", "left")
            .select(
                "id",
                F.col("pi").alias("old"),
                (
                    F.col("pi") * F.col("stay")
                    + F.coalesce("m", F.lit(0.0))
                ).alias("pi"),
            )
            .transform(truncate_lineage)
        )
        change = nxt.agg(F.sum(F.abs(F.col("pi") - F.col("old")))).first()[0]
        if change is None or not math.isfinite(change):
            raise NumericError(f"rank-centrality diverged at iteration {it}")
        pi = nxt.select("id", "pi")
        if change < tolerance:
            break

    return sorted_scores(
        vocab.join(pi, "id").select("name", F.col("pi").alias("score"))
    )
