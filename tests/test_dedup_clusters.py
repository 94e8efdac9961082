"""Near-dup clusters (MinHash pairs → connected components) and the
n-gram inverted-index frequency cap."""

from propagon_spark.functions.dedup import (
    near_duplicate_clusters,
    ngram_jaccard_pairs,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays on "
    "and the crowd cheers loudly in the warm evening air by the river"
)


def test_planted_duplicate_clusters(spark):
    # d1/d2/d3 are a near-dup chain (1~2 and 2~3 heavily overlap); d4 is
    # unrelated → expect one 3-cluster with rep d1 and a singleton d4
    d = docs(
        spark,
        [
            ("d1", BASE),
            ("d2", BASE + " tonight"),
            ("d3", BASE + " tonight again"),
            ("d4", "completely different content about spark shuffles " * 4),
        ],
    )
    out = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in near_duplicate_clusters(d, threshold=0.6).collect()
    }
    assert out["d1"] == ("d1", 3)
    assert out["d2"] == ("d1", 3)
    assert out["d3"] == ("d1", 3)
    assert out["d4"] == ("d4", 1)


def test_all_singletons(spark):
    d = docs(
        spark,
        [
            ("a", "alpha beta gamma delta epsilon zeta eta theta " * 3),
            ("b", "one two three four five six seven eight nine ten " * 3),
        ],
    )
    out = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in near_duplicate_clusters(d, threshold=0.5).collect()
    }
    assert out == {"a": ("a", 1), "b": ("b", 1)}


def test_ngram_cap_prunes_pathological_gram(spark):
    # every doc shares the same 3-gram ("aa bb cc"): uncapped this is
    # O(n²) candidate pairs; with the cap the shared gram is dropped and
    # only the genuinely-similar pair (x1, x2) survives via other grams
    common = "aa bb cc"
    rows = [(f"f{i}", f"{common} unique{i} mark{i} tail{i}") for i in range(20)]
    rows += [
        ("x1", f"{common} same same same same tail"),
        ("x2", f"{common} same same same same tailz"),
    ]
    d = docs(spark, rows)
    capped = ngram_jaccard_pairs(d, n=3, threshold=0.3, max_docs_per_gram=5)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    assert ("x1", "x2") in got
    # no pair that ONLY shared the capped gram appears
    assert all(a.startswith("x") and b.startswith("x") for a, b in got)
    # exact variant still available
    exact = ngram_jaccard_pairs(d, n=3, threshold=0.05, max_docs_per_gram=None)
    assert exact.count() > len(got)
