"""Streaming tally (applyInPandasWithState) parity with batch tally.

After each micro-batch, the latest emitted row per entity must equal the
batch ``tally`` over every comparison seen so far — the streaming
operator is the reference's ``tally`` (``pairwise.rs:195-208``)
maintained incrementally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propagon_spark.graph.tally import tally
from propagon_spark.streaming.incremental import streaming_tally

BATCH1 = [("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 1.0)]
BATCH2 = [("c", "a", 4.0), ("a", "b", 1.0), ("d", "a", 0.5)]
SCHEMA = "winner string, loser string, weight double"


def _latest_per_name(rows):
    """Memory sink in update mode accumulates one row per (batch, key);
    counts are monotone, so the latest row per key maximizes wins+losses."""
    best = {}
    for r in rows:
        k = r["name"]
        if k not in best or (r["wins"] + r["losses"]) > (
            best[k]["wins"] + best[k]["losses"]
        ):
            best[k] = r
    return {
        k: (r["wins"], r["losses"], r["win_weight"], r["loss_weight"])
        for k, r in best.items()
    }


def _batch_tally_dict(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA).withColumn("period", F.lit(0))
    return {
        r["name"]: (r["wins"], r["losses"], r["win_weight"], r["loss_weight"])
        for r in tally(df).collect()
    }


def test_streaming_tally_matches_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_tally(stream)
        .writeStream.format("memory")
        .queryName("tally_sink")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        got = _latest_per_name(spark.sql("select * from tally_sink").collect())
        assert got == _batch_tally_dict(spark, BATCH1)

        spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = _latest_per_name(spark.sql("select * from tally_sink").collect())
        assert got == _batch_tally_dict(spark, BATCH1 + BATCH2)
        # weighted spot check: a won 3 comparisons (w 1+2+1) lost 2 (4+0.5)
        assert got["a"] == (3, 2, pytest.approx(4.0), pytest.approx(4.5))
    finally:
        q.stop()
