"""Vocab service: external string names → dense long ids.

Spark replacement for the reference's interner
(``/root/reference/crates/propagon/src/interner.rs:14-46``): an append-only
name↔u32 map with a dense id space. Here the vocab is a DataFrame
``(name: string, id: long)`` built once per graph and broadcast-joined
wherever the reference would do a hash lookup. Ids are dense ``0..n-1`` and
**deterministic** (assigned in name order), with no u32 cap — the reference
accepts a 2^32 entity ceiling (``docs/PRD.md:421``); at 10^12-file scale we
need longs.

Scalable dense-id assignment: a single global ``row_number`` window is a
one-partition bottleneck, so ids are assigned bucket-locally — hash names
into B buckets, count per bucket, broadcast the cumulative offsets, then
``offset[bucket] + row_number() within bucket`` — two small jobs, no global
sort, deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_vocab(names: DataFrame, num_buckets: int = 256) -> DataFrame:
    """Build ``(name, id)`` with dense deterministic long ids.

    ``names`` must have a single column ``name`` (any orderable type; it is
    kept as-is). Ids run 0..n-1, assigned in (bucket, name) order where
    bucket = pmod(hash(name), B) — deterministic for a fixed B.
    """
    d = names.select("name").where(F.col("name").isNotNull()).distinct()
    d = d.withColumn("_b", F.pmod(F.hash("name"), F.lit(num_buckets)))

    counts = {
        r["_b"]: r["cnt"]
        for r in d.groupBy("_b").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)

    spark = names.sparkSession
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
