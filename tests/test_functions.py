"""Training-data pipeline functions: text, dedup, similarity, multimodal."""

import math

import pytest
from pyspark.sql import functions as F

from propagon_spark.functions.dedup import (
    exact_duplicates,
    drop_exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from propagon_spark.functions.similarity import cosine_topk, lsh_cosine_topk
from propagon_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)
from propagon_spark.functions.multimodal import (
    extract_features,
    frame_sample,
    synth_assets,
)


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_token_count(spark):
    d = docs(spark, ["a b  c", "", "   ", "one"])
    out = d.select("doc_id", token_count("text").alias("n")).collect()
    assert {r["doc_id"]: r["n"] for r in out} == {0: 3, 1: 0, 2: 0, 3: 1}


def test_quality_features(spark):
    d = docs(spark, ["the cat and the dog of the house.", "!!!???..."])
    rows = {r["doc_id"]: r for r in quality_features(d).collect()}
    assert rows[0]["quality_score"] > rows[1]["quality_score"]
    assert rows[1]["punct_ratio"] == 1.0
    assert rows[0]["n_tokens"] == 8


def test_lang_id(spark):
    d = docs(
        spark,
        [
            "the quick fox and the dog of the farm",
            "der Hund und die Katze und der Vogel",
            "12345",
        ],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id(d).collect()}
    assert out == {0: "en", 1: "de", 2: "und"}


def test_fingerprint_deterministic(spark):
    d = docs(spark, ["hello world document", "hello world document", "zzz"])
    out = [r["fingerprint"] for r in fingerprint(d).orderBy("doc_id").collect()]
    assert out[0] == out[1]
    assert out[0] != out[2]  # "zzz" is < 8 bytes → 0


def test_exact_dedup(spark):
    d = docs(spark, ["same", "same", "other"])
    groups = {r["keep_id"]: r["copies"] for r in exact_duplicates(d).collect()}
    assert groups == {0: 2, 2: 1}
    kept = sorted(r["doc_id"] for r in drop_exact_duplicates(d).collect())
    assert kept == [0, 2]


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest where nobody ever goes at night"
)


def test_minhash_near_duplicates(spark):
    d = docs(spark, [BASE, BASE + " extra tail words", "completely different "
                     "content about spark dataframes and shuffle partitions"])
    pairs = {(r["a"], r["b"]) for r in
             minhash_near_duplicates(d, threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_near_duplicates(spark):
    d = docs(spark, [BASE, BASE.replace("lazy", "hazy"), "unrelated text "
                     "entirely about graphs and pagerank iterations"])
    pairs = {(r["a"], r["b"]) for r in
             simhash_near_duplicates(d, max_hamming=8).collect()}
    assert (0, 1) in pairs


def test_ngram_jaccard(spark):
    d = docs(spark, [BASE, BASE + " tail", "other words entirely here now"])
    rows = {(r["a"], r["b"]): r["jaccard"] for r in
            ngram_jaccard_pairs(d, n=3, threshold=0.3).collect()}
    assert (0, 1) in rows and rows[(0, 1)] > 0.8


def embeddings(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(vecs, "vec_id long, embedding array<double>")


def test_cosine_topk(spark):
    out = cosine_topk(embeddings(spark), k=1).collect()
    top = {r["query_id"]: r["neighbor_id"] for r in out}
    assert top[0] == 1 and top[1] == 0
    c01 = [r["cosine"] for r in out if r["query_id"] == 0][0]
    assert abs(c01 - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-9


def test_lsh_cosine_topk_recovers_close_pair(spark):
    out = lsh_cosine_topk(
        embeddings(spark), k=1, num_planes=8, num_tables=8, dim=3
    ).collect()
    top = {r["query_id"]: r["neighbor_id"] for r in out}
    assert top.get(0) == 1


def test_multimodal_stub(spark):
    assets = synth_assets(spark, n=12)
    feats = extract_features(assets, num_features=4, fake=True)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r["features"]) == 4 for r in rows)
    # synth payloads aren't valid WAV/PPM/BMP — real decode rejects them
    with pytest.raises(Exception):
        extract_features(assets, fake=False).collect()
    frames = frame_sample(assets.where(F.col("media_type") == "video"),
                          every_ms=1000, fake=True)
    assert frames.count() > 0


def test_ann_recall_harness(spark):
    # planted clusters: 8 tight bundles of 6 vectors each; the LSH path
    # with the clustered-corpus default must recover nearly all exact
    # top-3 neighbors, and its rescoring must agree with the oracle
    from propagon_spark.functions.similarity import ann_recall_at_k

    df = spark.createDataFrame(
        _clustered_vectors(), "vec_id string, embedding array<double>"
    )
    r = ann_recall_at_k(df, k=3, num_planes=8, num_tables=8)
    assert r["rescore_mismatches"] == 0
    assert r["recall_at_k"] >= 0.9


def _clustered_vectors(n_clusters=8, per_cluster=6, dim=32, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    i = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.05 * rng.standard_normal(dim)
            rows.append((f"v{i:03d}", [float(x) for x in v]))
            i += 1
    return rows


def test_ivf_full_probe_equals_bruteforce(spark):
    # nprobe = n_cells makes candidate generation exhaustive: the IVF
    # path must reproduce the exact brute-force top-k bit-for-bit
    # (same rescore expressions, same tie-break) — this is the
    # invariant the driver's ann_ivf_topk oracle checks at sf0.01
    from propagon_spark.functions.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )

    df = spark.createDataFrame(
        _clustered_vectors(), "vec_id string, embedding array<double>"
    )
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_topk(df, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_cosine_topk(
            df, k=3, n_cells=8, nprobe=8, sample_rows=100
        ).collect()
    }
    assert ivf == exact


def test_ivf_recall_on_clustered_corpus(spark):
    # cells adapt to the planted clusters, so probing 2 of 8 cells must
    # still recover nearly all true neighbors (they share the query's
    # own cell), and rescoring is exact on every returned pair
    from propagon_spark.functions.similarity import ann_recall_at_k

    df = spark.createDataFrame(
        _clustered_vectors(), "vec_id string, embedding array<double>"
    )
    r = ann_recall_at_k(
        df, k=3, method="ivf", n_cells=8, nprobe=2, sample_rows=100
    )
    assert r["rescore_mismatches"] == 0
    assert r["recall_at_k"] >= 0.9


def test_ivf_training_deterministic_and_bounded(spark):
    import numpy as np

    from propagon_spark.functions.similarity import train_ivf_centroids

    df = spark.createDataFrame(
        _clustered_vectors(), "vec_id string, embedding array<double>"
    )
    c1 = train_ivf_centroids(df, n_cells=8, sample_rows=100, seed=3)
    c2 = train_ivf_centroids(df, n_cells=8, sample_rows=100, seed=3)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 32)
    # spherical k-means keeps centroids unit-norm
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-5)
    with pytest.raises(ValueError, match="n_cells"):
        train_ivf_centroids(df.limit(4), n_cells=8, sample_rows=100)


def test_embedding_near_duplicates_planted(spark):
    # exact copies always share every LSH bucket (angle 0 ⇒ per-plane
    # collision probability 1), so planted duplicates are guaranteed
    # candidates regardless of the hyperplane draw
    import numpy as np

    from propagon_spark.functions.similarity import embedding_near_duplicates

    rng = np.random.RandomState(11)
    base = rng.standard_normal((40, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    planted = {(0, 40), (1, 41), (2, 42)}
    for a, b in sorted(planted):
        rows.append((b, rows[a][1]))  # exact duplicate of vector a
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_duplicates(
        df, threshold=0.95, num_planes=8, num_tables=4
    ).collect()
    found = {(r["a"], r["b"]) for r in out}
    assert planted <= found
    assert all(r["cosine"] >= 0.95 for r in out)
    # random 16-dim gaussians sit near 90 deg — no spurious pairs
    assert found == planted


def test_embedding_near_duplicates_exact_mode(spark):
    # method="exact" scores every a<b pair: no candidate generation, no
    # k cap — it must (1) find the planted duplicates, (2) be a superset
    # of whatever the LSH path returns at the same threshold, and (3)
    # recover a full clique that a small k truncates on the LSH path
    import numpy as np
    import pytest

    from propagon_spark.functions.similarity import embedding_near_duplicates

    rng = np.random.RandomState(11)
    base = rng.standard_normal((40, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    planted = {(0, 40), (1, 41), (2, 42)}
    for a, b in sorted(planted):
        rows.append((b, rows[a][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = embedding_near_duplicates(df, threshold=0.95, method="exact").collect()
    assert {(r["a"], r["b"]) for r in exact} == planted
    assert all(r["cosine"] >= 0.95 for r in exact)
    lsh = embedding_near_duplicates(
        df, threshold=0.95, num_planes=8, num_tables=4
    ).collect()
    assert {(r["a"], r["b"]) for r in lsh} <= {(r["a"], r["b"]) for r in exact}

    v = rng.standard_normal(16)
    clique = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    assert (
        embedding_near_duplicates(clique, threshold=0.95, method="exact").count()
        == 28  # C(8,2): exact mode has no k truncation
    )
    with pytest.raises(ValueError, match="method"):
        embedding_near_duplicates(df, method="simhash")


def test_embedding_near_duplicates_k_cap_exposed(spark, caplog):
    # a duplicate cluster LARGER than k loses pairs — the cap is exposed
    # and saturation triggers a warning (no-silent-caps rule); a big
    # enough k recovers the full clique
    import logging as _logging

    import numpy as np

    from propagon_spark.functions.similarity import embedding_near_duplicates

    rng = np.random.RandomState(5)
    v = rng.standard_normal(16)
    rows = [(i, [float(x) for x in v]) for i in range(8)]  # 8-clique
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with caplog.at_level(_logging.WARNING, logger="propagon_spark.similarity"):
        capped = embedding_near_duplicates(
            df, threshold=0.95, k=3, num_planes=4, num_tables=4
        ).collect()
    assert any("TRUNCATED" in r.message for r in caplog.records)
    assert len(capped) < 28  # full 8-clique has C(8,2)=28 pairs
    full = embedding_near_duplicates(
        df, threshold=0.95, k=10, num_planes=4, num_tables=4
    ).collect()
    assert len(full) == 28
