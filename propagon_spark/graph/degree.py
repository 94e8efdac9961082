"""Weighted degree / strength centrality.

Reference: ``/root/reference/crates/propagon/src/algos/degree.rs:20-77`` —
per-``Direction`` (in/out/total) weighted strength, weights **summed**, no
dedup, self-loops kept, every interned vertex present (zero if isolated).
Default direction is ``in`` (endorsements received).

Spark shape: one ``groupBy(...).agg(sum(weight))`` per direction — the
minimum-e2e-slice operator (SURVEY.md §7.1 step 3). Fully
Catalyst-expressible: partial+final hash agg, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propagon_spark.graph.core import Graph, sorted_scores


_DIRECTIONS = ("in", "out", "total")


def degree(g: Graph, direction: str = "in") -> DataFrame:
    """Return ``(name, score)`` weighted degree, sorted score desc / name asc."""
    from propagon_spark.errors import InvalidParameterError

    if direction not in _DIRECTIONS:
        raise InvalidParameterError(
            f"direction must be one of {_DIRECTIONS}, got {direction!r}"
        )

    parts = []
    if direction in ("in", "total"):
        parts.append(
            g.edges.groupBy(F.col("dst").alias("id")).agg(
                F.sum("weight").alias("score")
            )
        )
    if direction in ("out", "total"):
        parts.append(
            g.edges.groupBy(F.col("src").alias("id")).agg(
                F.sum("weight").alias("score")
            )
        )
    agg = parts[0]
    if len(parts) == 2:
        agg = (
            parts[0]
            .unionAll(parts[1])
            .groupBy("id")
            .agg(F.sum("score").alias("score"))
        )

    out = (
        g.vocab.join(agg, "id", "left")
        .select("name", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    return sorted_scores(out)
