"""Streaming / incremental surface.

The reference has no true streaming: its ``OnlineRanker`` notion is
per-period batch refits (``/root/reference/crates/propagon/src/traits.rs:127-148``),
and the PRD's FR-5 matrix maps graph algorithms to **warm-start batch
refit** only (``docs/PRD.md:233`` — "PageRank/BiRank: ❌ update, ✅
fit_warm"). The Spark equivalents:

- :func:`streaming_degree` — Structured Streaming weighted-degree
  aggregation over an edge stream (the one operator with true streaming
  semantics: an incremental ``groupBy().sum()``).
- :func:`pagerank_warm` — warm-start batch refit: re-fit PageRank on an
  updated edge table starting from a previous run's ranks instead of the
  teleport vector (contract: never worse than a cold fit,
  ``traits.rs:107-118``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propagon_spark.graph.core import Graph


def streaming_degree(
    edge_stream: DataFrame, direction: str = "in", watermark: str | None = None
) -> DataFrame:
    """Continuous weighted degree over a streaming edge frame
    ``(src, dst, weight[, ts])``. Returns a streaming aggregate suitable
    for ``writeStream.outputMode("update")``; pass ``watermark`` (e.g.
    "10 minutes") with a ``ts`` column to bound state for late data."""
    key = {"in": "dst", "out": "src"}[direction]
    s = edge_stream
    if watermark is not None:
        s = s.withWatermark("ts", watermark)
    return s.groupBy(F.col(key).alias("name")).agg(
        F.sum("weight").alias("score")
    )


def pagerank_warm(
    g: Graph, prev_ranks: DataFrame, normalize: bool = True, **kwargs
):
    """Warm-start PageRank refit: continue power iteration from
    ``prev_ranks`` (id, rank) — e.g. the previous period's result with new
    vertices absent (they start at 0 after the left join, then receive
    teleport mass on the first step). Mass is re-normalized so the warm
    vector is a distribution."""
    from propagon_spark.graph.pagerank import pagerank

    spark = g.spark
    import uuid

    ckdir = kwargs.pop("checkpoint_dir", None)
    run_id = kwargs.pop("run_id", uuid.uuid4().hex)
    if ckdir is None:
        import tempfile

        ckdir = tempfile.mkdtemp(prefix="propagon_warm_")

    warm = g.vocab.select("id").join(prev_ranks, "id", "left").select(
        "id", F.coalesce("rank", F.lit(0.0)).alias("rank")
    )
    if normalize:
        total = warm.agg(F.sum("rank")).first()[0] or 1.0
        warm = warm.select("id", (F.col("rank") / F.lit(float(total))).alias("rank"))

    # seed the checkpoint machinery with the warm state as "iteration 0"
    from propagon_spark.plans.checkpoint import CheckpointManager

    ckpt = CheckpointManager(spark, ckdir, run_id)
    ckpt.save(0, warm, [])
    return pagerank(
        g,
        checkpoint_dir=ckdir,
        run_id=run_id,
        resume=True,
        **kwargs,
    )
