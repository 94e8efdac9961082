"""Degree fixture F11 — /root/reference/crates/propagon/src/algos/degree.rs:85-107."""

import pytest

from conftest import make_edges, scores_dict

from propagon_spark.errors import EmptyDatasetError, InvalidParameterError
from propagon_spark.graph import Graph
from propagon_spark.graph.degree import degree


ROWS = [("a", "b", 2.0), ("c", "b", 1.0), ("b", "a", 0.5)]


@pytest.fixture(scope="module")
def g(spark):
    gr = Graph.from_edges(make_edges(spark, ROWS, weights=True), weight="weight")
    yield gr
    gr.unpersist()


def test_in_degree(g):
    assert scores_dict(degree(g, "in")) == {"a": 0.5, "b": 3.0, "c": 0.0}


def test_out_degree(g):
    assert scores_dict(degree(g, "out")) == {"a": 2.0, "b": 0.5, "c": 1.0}


def test_total_degree(g):
    assert scores_dict(degree(g, "total")) == {"a": 2.5, "b": 3.5, "c": 1.0}


def test_sorted_output(g):
    # traits.rs:63-67 — score desc, ties by name asc
    names = [r["name"] for r in degree(g, "in").collect()]
    assert names == ["b", "a", "c"]


def test_bad_direction(g):
    with pytest.raises(InvalidParameterError):
        degree(g, "sideways")


def test_empty_dataset(spark):
    with pytest.raises(EmptyDatasetError):
        Graph.from_edges(make_edges(spark, []))


def test_default_weight_one(spark):
    g = Graph.from_edges(make_edges(spark, [("a", "b"), ("a", "b")]))
    # no dedup for degree: two parallel edges both count
    assert scores_dict(degree(g, "in")) == {"a": 0.0, "b": 2.0}
    g.unpersist()
