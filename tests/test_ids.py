"""Vocab invariants: dense, deterministic, order-preserving ids."""

from propagon_spark.ids import build_vocab


def test_dense_order_preserving(spark):
    names = ["zeta", "alpha", "mid", "alpha", "00009", "00010"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    v = sorted(
        ((r["name"], r["id"]) for r in build_vocab(df, num_buckets=3).collect()),
        key=lambda t: t[1],
    )
    got_names = [n for n, _ in v]
    got_ids = [i for _, i in v]
    assert got_ids == list(range(5))  # dense 0..n-1
    assert got_names == sorted(set(names))  # id order == name order


def test_stable_across_partitioning(spark):
    names = [f"n{i:04d}" for i in range(200)]
    df2 = spark.createDataFrame([(n,) for n in names], "name string").repartition(2)
    df9 = spark.createDataFrame([(n,) for n in names], "name string").repartition(9)
    v2 = {(r["name"], r["id"]) for r in build_vocab(df2, num_buckets=7).collect()}
    v9 = {(r["name"], r["id"]) for r in build_vocab(df9, num_buckets=13).collect()}
    assert v2 == v9
