"""Vocab service: external string names → dense long ids.

Spark replacement for the reference's interner
(``/root/reference/crates/propagon/src/interner.rs:14-46``): an append-only
name↔u32 map with a dense id space. Here the vocab is a DataFrame
``(name: string, id: long)`` built once per graph and broadcast-joined
wherever the reference would do a hash lookup. No u32 cap — the reference
accepts a 2^32 entity ceiling (``docs/PRD.md:421``); at 10^12-file scale we
need longs.

Ids are dense ``0..n-1`` and **order-preserving**: ``id(a) < id(b) iff
name(a) < name(b)``. That makes every integer min/tie-break reduction in
the engine (connected components representative, LPA tie-breaks)
equivalent to a *name*-ordered tie-break — a total order any independent
implementation (or SQL oracle) can reproduce, and one that is independent
of partitioning, parallelism, and hash seeds.

Scalable rank assignment without a global sort bottleneck: range-partition
the distinct names into B ordered buckets, count per bucket, broadcast the
cumulative offsets, then ``offset[bucket] + row_number() within bucket``.
The global rank is boundary-independent (it's just "number of names before
mine"), so sampling jitter in the range partitioner cannot change ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_vocab(names: DataFrame, num_buckets: int = 256) -> DataFrame:
    """Build ``(name, id)`` with dense, deterministic, order-preserving
    long ids. ``names`` must have a single column ``name``."""
    d = names.select("name").where(F.col("name").isNotNull()).distinct()
    d = d.repartitionByRange(num_buckets, "name").withColumn(
        "_b", F.spark_partition_id()
    )

    counts = {
        r["_b"]: r["cnt"]
        for r in d.groupBy("_b").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    spark = names.sparkSession
    if not offsets:
        return spark.createDataFrame([], "name string, id long")
    offsets_df = spark.createDataFrame(
        [(b, off) for b, off in offsets.items()], "_b int, _off long"
    )
    w = Window.partitionBy("_b").orderBy("name")
    return (
        d.withColumn("_rn", F.row_number().over(w) - F.lit(1))
        .join(F.broadcast(offsets_df), "_b")
        .select("name", (F.col("_off") + F.col("_rn")).cast("long").alias("id"))
    )


def vocab_size(vocab: DataFrame) -> int:
    return vocab.count()
