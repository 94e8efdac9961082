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
        F.coalesce(F.get("t", 2).cast("double"), F.lit(1.0)).alias(
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


def read_seeds(path: str) -> dict[str, float]:
    """Teleport seeds for personalized PageRank: ``name [weight]`` per
    line, weight defaulting to 1 (``propagon-cli/src/io.rs:244-262``).
    Returns the dict :func:`propagon_spark.graph.pagerank.pagerank`
    accepts as ``seeds=`` (driver-side small file, like the reference)."""
    seeds: dict[str, float] = {}
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            toks = line.split()
            if not toks:
                continue
            w = 1.0
            if len(toks) > 1:
                try:
                    w = float(toks[1])
                except ValueError as exc:
                    raise ValueError(
                        f"bad seed weight {toks[1]!r} on line {lineno}"
                    ) from exc
            seeds[toks[0]] = seeds.get(toks[0], 0.0) + w
    return seeds


def read_pairwise_text(
    spark: SparkSession, path: str, periods: bool = False
) -> DataFrame:
    """Read whitespace ``winner loser [weight]`` rows.

    ``periods=True`` honors blank-line batch boundaries
    (``io.rs:22-43``): consecutive/leading blanks collapse (empty periods
    are no-ops, ``dataset/pairwise.rs:110-123``) and each group gets a
    dense 0-based ``period``. Line order comes from the file offset
    (``zipWithIndex`` over a single text file), and the running
    blank-count window is a single-task pass — this is the CLI-interop
    small-file path; at scale periods arrive as an explicit column
    instead (SURVEY §2.1).
    """
    if not periods:
        df = read_edge_text(spark, path, matches=False)
        return df.select(
            F.col("src").alias("winner"),
            F.col("dst").alias("loser"),
            "weight",
            F.lit(0).cast("long").alias("period"),
        )

    from pyspark.sql import Window

    lines = spark.createDataFrame(
        spark.sparkContext.textFile(path).zipWithIndex(),
        "value string, idx long",
    )
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    grouped = lines.select(
        "value",
        "idx",
        F.sum(
            F.when(F.trim("value") == "", F.lit(1)).otherwise(F.lit(0))
        ).over(w).alias("grp"),
    ).where((F.trim("value") != "") & ~F.col("value").startswith("#"))
    # dense-rank the groups that actually contain rows → empty periods
    # collapse exactly like the reference's new_period() no-op
    ranked = grouped.select(
        "value",
        (F.dense_rank().over(Window.orderBy("grp")) - 1).alias("period"),
    )
    toks = ranked.select(F.split(F.trim("value"), r"\s+").alias("t"), "period")
    return toks.select(
        F.col("t").getItem(0).alias("winner"),
        F.col("t").getItem(1).alias("loser"),
        F.coalesce(F.get("t", 2).cast("double"), F.lit(1.0)).alias(
            "weight"
        ),
        F.col("period").cast("long").alias("period"),
    )
