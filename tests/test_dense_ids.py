"""Graph.from_dense_ids must be fit-equivalent to Graph.from_edges.

The scaling harness (BENCH/scaling.py) materializes the interned edge
frame to Parquet once and reloads it per leg via ``from_dense_ids`` —
the validity of every recorded pair rests on the reloaded graph fitting
IDENTICALLY to the one ``from_edges`` interns in-JVM. Pin that
equivalence: same vertex/edge counts, same per-vertex PageRank scores,
same components, and the identity vocab maps names correctly.
"""

from __future__ import annotations

import pytest

from propagon_spark.graph.core import Graph
from propagon_spark.graph.pagerank import pagerank
from propagon_spark.graph.components import connected_components
from propagon_spark.errors import EmptyDatasetError


def _dense_frame(spark):
    # dense ids 0..6, parallel edge + weights, one isolated-from-src sink
    rows = [
        (0, 1, 1.0), (0, 1, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (3, 4, 1.0), (4, 3, 0.5), (5, 6, 1.0), (0, 2, 1.0),
    ]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _ranks(g):
    res = pagerank(g, damping=0.85, sink="uniform", iterations=10)
    return {r["name"]: r["score"] for r in res.scores.collect()}


def test_dense_ids_fit_equivalent(spark):
    df = _dense_frame(spark)
    g_interned = Graph.from_edges(df, weight="weight")
    g_dense = Graph.from_dense_ids(df, weight="weight")

    assert g_dense.num_vertices == g_interned.num_vertices == 7
    assert g_dense.num_edge_rows == g_interned.num_edge_rows == 8

    r_i = _ranks(g_interned)
    r_d = _ranks(g_dense)
    assert set(r_i) == set(r_d)
    for name in r_i:
        assert r_d[name] == pytest.approx(r_i[name], abs=1e-12)


def test_dense_ids_components_match(spark):
    df = _dense_frame(spark)
    comp_i = connected_components(Graph.from_edges(df))
    comp_d = connected_components(Graph.from_dense_ids(df))
    by_id = lambda c: {r["id"]: r["component"] for r in c.collect()}  # noqa: E731
    assert by_id(comp_i) == by_id(comp_d)


def test_dense_ids_vocab_is_identity(spark):
    g = Graph.from_dense_ids(_dense_frame(spark))
    vocab = {r["id"]: r["name"] for r in g.vocab.collect()}
    assert vocab == {i: str(i) for i in range(7)}


def test_dense_ids_recovers_num_vertices(spark):
    # num_vertices omitted -> max(src, dst) + 1
    g = Graph.from_dense_ids(_dense_frame(spark))
    assert g.num_vertices == 7
    # explicit num_vertices (the harness path: vocab size from the
    # prep metadata) wins even when larger than max id + 1
    g9 = Graph.from_dense_ids(_dense_frame(spark), num_vertices=9)
    assert g9.num_vertices == 9


def test_dense_ids_empty_raises(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    with pytest.raises(EmptyDatasetError):
        Graph.from_dense_ids(empty)
