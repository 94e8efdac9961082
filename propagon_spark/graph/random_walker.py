"""Random-walker ranking over pairwise comparisons.

Reference: ``/root/reference/crates/propagon/src/algos/random_walker.rs:34-140``.
Semantics:
- bias ``p`` strictly in (1/2, 1) — 1/2 carries no information, 1 makes
  undefeated entities absorbing (typed error otherwise);
- ``g_i`` = total game weight entity i played;
- per unordered pair {i, j}: transition
  ``i → j = (p·w_ji + (1−p)·w_ij) / g_i`` (walkers drift toward winners);
- implicit self-loop remainder, rows sum to exactly 1;
- power iteration from uniform; defaults iterations=1000, tol=1e-12.

Spark shape: one pair-aggregation to build the transition frame, then the
shared scatter-gather power iteration (same kernel family as
rank-centrality / leader-rank).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propagon_spark.errors import EmptyDatasetError, InvalidParameterError, NumericError
from propagon_spark.graph.core import sorted_scores
from propagon_spark.ids import build_vocab
from propagon_spark.plans.iterate import truncate_lineage


def random_walker(
    pairwise: DataFrame,
    p: float = 0.75,
    iterations: int = 1000,
    tolerance: float = 1e-12,
) -> DataFrame:
    """Fit on a ``(winner, loser, weight[, period])`` frame; returns
    ``(name, score)`` (stationary distribution, sums to 1)."""
    if not (0.5 < p < 1.0):
        raise InvalidParameterError(
            f"random-walker bias p must lie strictly in (0.5, 1), got {p}"
        )
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
    rows = raw.join(ids_w, "w").join(ids_l, "l").select("wi", "li", "x")

    games = (
        rows.select(F.col("wi").alias("id"), "x")
        .unionAll(rows.select(F.col("li").alias("id"), "x"))
        .groupBy("id")
        .agg(F.sum("x").alias("g"))
    )

    upair = (
        rows.select(
            F.least("wi", "li").alias("lo"),
            F.greatest("wi", "li").alias("hi"),
            F.when(F.col("wi") < F.col("li"), F.col("x")).otherwise(0.0).alias("wlh"),
            F.when(F.col("wi") > F.col("li"), F.col("x")).otherwise(0.0).alias("whl"),
        )
        .groupBy("lo", "hi")
        .agg(F.sum("wlh").alias("wlh"), F.sum("whl").alias("whl"))
    )

    # i→j = (p·w_ji + (1−p)·w_ij)/g_i for both orientations of each pair
    gl = games.select(F.col("id").alias("lo"), F.col("g").alias("glo"))
    gh = games.select(F.col("id").alias("hi"), F.col("g").alias("ghi"))
    up = upair.join(gl, "lo").join(gh, "hi")
    trans = truncate_lineage(
        up.select(
            F.col("lo").alias("src"),
            F.col("hi").alias("dst"),
            (
                (F.lit(p) * F.col("whl") + F.lit(1.0 - p) * F.col("wlh"))
                / F.col("glo")
            ).alias("p"),
        ).unionAll(
            up.select(
                F.col("hi").alias("src"),
                F.col("lo").alias("dst"),
                (
                    (F.lit(p) * F.col("wlh") + F.lit(1.0 - p) * F.col("whl"))
                    / F.col("ghi")
                ).alias("p"),
            )
        )
    )
    stay = truncate_lineage(
        vocab.select("id")
        .join(
            trans.groupBy(F.col("src").alias("id")).agg(
                F.sum("p").alias("leave")
            ),
            "id",
            "left",
        )
        .select("id", (1.0 - F.coalesce("leave", F.lit(0.0))).alias("stay"))
    )

    pi = truncate_lineage(vocab.select("id", F.lit(1.0 / n).alias("pi")))
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
                (F.col("pi") * F.col("stay") + F.coalesce("m", F.lit(0.0))).alias(
                    "pi"
                ),
            )
            .transform(truncate_lineage)
        )
        delta = nxt.agg(F.sum(F.abs(F.col("pi") - F.col("old")))).first()[0]
        if delta is None or not math.isfinite(delta):
            raise NumericError(f"random-walker diverged at iteration {it}")
        pi = nxt.select("id", "pi")
        if delta < tolerance:
            break

    return sorted_scores(
        vocab.join(pi, "id").select("name", F.col("pi").alias("score"))
    )
