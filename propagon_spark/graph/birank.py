"""BiRank (bipartite ranking).

Reference: ``/root/reference/crates/propagon/src/algos/birank.rs:140-235``.
Key semantics:
- **side-local id spaces**: the same name on the src side and the dst side
  is two different entities (``birank.rs:3-6,147-173``);
- sqrt-degree normalization: ``d[i] = sqrt(Σ w)`` per side;
- alternating sweeps ``p ← f(u)`` then ``u ← f(p)`` with the *refreshed*
  other side; with no priors configured the prior term collapses so α/β
  scaling cancels (``next = α·s + (1−α)·s = s``, ``birank.rs:196-199``);
- seeded random init (v2 RNG, default seed 2019), fixed 10 iterations.

Spark mapping: two vocab spaces; the sweep is a join-agg with
``w/(d_l·d_r)`` folded into the edge frame once; random init derived from
``xxhash64(id, seed)`` — truly deterministic at any parallelism (unlike
``F.rand``, whose stream is seeded per-partition). The stream still
differs from the reference's Xoshiro, so parity with golden files is
rank-correlation, not numeric — same tier-S contract as the reference's
own golden tests (``crates/propagon-cli/tests/golden.rs:176-212``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from propagon_spark.errors import EmptyDatasetError
from propagon_spark.graph.core import sorted_scores
from propagon_spark.ids import build_vocab
from propagon_spark.plans.iterate import truncate_lineage


@dataclass
class BiRankResult:
    src_scores: DataFrame  # (name, score)
    dst_scores: DataFrame  # (name, score)
    iterations: int


def birank(
    edges: DataFrame,
    iterations: int = 10,
    alpha: float = 1.0,
    beta: float = 1.0,
    seed: int = 2019,
    init: str = "random",
) -> BiRankResult:
    """Fit BiRank on a raw (src, dst[, weight]) frame (NOT a Graph — the
    two sides get independent id spaces).

    ``init="random"`` is the reference's seeded random start
    (``birank.rs:189-194``; deterministic here via xxhash64, but not
    SQL-reproducible). ``init="uniform"`` starts both sides at 1.0 —
    with no priors the sweep is pure propagation (``birank.rs:196-199``),
    so the trajectory is a plain linear recurrence that an unrolled SQL
    twin can reproduce exactly; this is the oracle-checkable parity mode.
    """
    if init not in ("random", "uniform"):
        raise ValueError(f"init must be random|uniform, got {init!r}")
    cols = edges.columns
    w = F.col("weight").cast("double") if "weight" in cols else F.lit(1.0)
    raw = edges.select(
        F.col("src").cast("string").alias("sname"),
        F.col("dst").cast("string").alias("dname"),
        w.alias("w"),
    )
    if raw.rdd.isEmpty():
        raise EmptyDatasetError("empty edge dataset")

    sv = build_vocab(raw.select(F.col("sname").alias("name")))
    dv = build_vocab(raw.select(F.col("dname").alias("name")))

    e = (
        raw.join(sv.select(F.col("name").alias("sname"), F.col("id").alias("si")), "sname")
        .join(dv.select(F.col("name").alias("dname"), F.col("id").alias("di")), "dname")
        .select("si", "di", "w")
    )
    d_src = e.groupBy("si").agg(F.sqrt(F.sum("w")).alias("ds"))
    d_dst = e.groupBy("di").agg(F.sqrt(F.sum("w")).alias("dd"))
    # normalized edge weight w/(d_src·d_dst), computed once
    en = truncate_lineage(
        e.join(d_src, "si")
        .join(d_dst, "di")
        .select("si", "di", (F.col("w") / (F.col("ds") * F.col("dd"))).alias("nw"))
    )

    # seeded pseudo-random init per side: hash(id, seed) → uniform [0,1).
    # Partition-count-independent, unlike F.rand(seed) whose substream is
    # assigned per partition.
    def hash01(col, s: int):
        return F.xxhash64(col, F.lit(s)) / F.lit(float(2**64)) + F.lit(0.5)

    if init == "uniform":
        u0 = F.lit(1.0)
        p0 = F.lit(1.0)
    else:
        u0 = hash01(F.col("id"), seed)
        p0 = hash01(F.col("id"), seed + 1)
    u = truncate_lineage(sv.select(F.col("id").alias("si"), u0.alias("u")))
    p = truncate_lineage(dv.select(F.col("id").alias("di"), p0.alias("p")))

    for _ in range(iterations):
        # p ← normalized gather of u (alpha cancels with no priors)
        p = truncate_lineage(
            en.join(u, "si")
            .groupBy("di")
            .agg(F.sum(F.col("nw") * F.col("u")).alias("p"))
        )
        u = truncate_lineage(
            en.join(p, "di")
            .groupBy("si")
            .agg(F.sum(F.col("nw") * F.col("p")).alias("u"))
        )

    src_scores = sorted_scores(
        sv.join(u, sv["id"] == u["si"], "left").select(
            "name", F.coalesce("u", F.lit(0.0)).alias("score")
        )
    )
    dst_scores = sorted_scores(
        dv.join(p, dv["id"] == p["di"], "left").select(
            "name", F.coalesce("p", F.lit(0.0)).alias("score")
        )
    )
    return BiRankResult(src_scores, dst_scores, iterations)
