"""Whitespace edge-list reader (the reference CLI's input format).

Reference: ``/root/reference/crates/propagon-cli/src/io.rs:107-125`` —
rows ``src dst [weight]`` separated by arbitrary whitespace; blank lines
delimit "periods" for pairwise data (``io.rs:22-43``); ``--matches`` swaps
each row to ``loser → winner`` orientation before graph algorithms
(``main.rs:2529-2531``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_text(
    spark: SparkSession, path: str, matches: bool = False
) -> DataFrame:
    """Read ``src dst [weight]`` text rows into (src, dst, weight).

    ``matches=True`` applies the reference's winner/loser swap: a row
    ``winner loser w`` becomes edge ``loser → winner`` (endorsement flows
    from the defeated to the victor).
    """
    lines = spark.read.text(path)
    toks = lines.select(
        F.split(F.trim(F.col("value")), r"\s+").alias("t")
    ).where((F.trim(F.col("value")) != "") & ~F.col("value").startswith("#"))
    df = toks.select(
        F.col("t").getItem(0).alias("a"),
        F.col("t").getItem(1).alias("b"),
        F.coalesce(F.col("t").getItem(2).cast("double"), F.lit(1.0)).alias(
            "weight"
        ),
    )
    if matches:
        return df.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), "weight"
        )
    return df.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "weight"
    )


def read_pairwise_text(spark: SparkSession, path: str) -> DataFrame:
    """Read whitespace ``winner loser [weight]`` rows (single period).

    Multi-period blank-line parsing is file-order-dependent; at scale,
    periods arrive as an explicit column instead
    (``dataset/pairwise.rs:110-174`` → period column, SURVEY §2.1).
    """
    df = read_edge_text(spark, path, matches=False)
    return df.select(
        F.col("src").alias("winner"),
        F.col("dst").alias("loser"),
        "weight",
        F.lit(0).cast("long").alias("period"),
    )
