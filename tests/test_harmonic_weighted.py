"""Weighted (Dijkstra-cost) harmonic centrality, pinned to the
reference's own weighted unit tests (harmonic.rs:412-436,477-489) plus
the exact-mode size guard and explicit-source parity path."""

import pytest

from conftest import make_edges, scores_dict

from propagon_spark.errors import InvalidParameterError
from propagon_spark.graph import Graph
from propagon_spark.graph.harmonic import harmonic


def test_weighted_shortcut_loses_to_two_hop_route(spark):
    # harmonic.rs:412-431 — 1→2 (w=2), 2→3 (w=3), 1→3 (w=10):
    # d(1→3) = min(10, 2+3) = 5 ⇒ H(3) = 1/3 + 1/5, H(2) = 1/2, H(1) = 0
    g = Graph.from_edges(
        make_edges(spark, [("1", "2", 2.0), ("2", "3", 3.0), ("1", "3", 10.0)],
                   weights=True),
        weight="weight",
    )
    s = scores_dict(harmonic(g, "in", cost="weight"))
    assert s["3"] == pytest.approx(1.0 / 3.0 + 1.0 / 5.0, abs=1e-12)
    assert s["2"] == pytest.approx(0.5, abs=1e-12)
    assert s["1"] == 0.0
    g.unpersist()


def test_weighted_total_direction(spark):
    # a—b (w=2), b—c (w=4) undirected: d(a,c)=6
    # H(a) = 1/2 + 1/6; H(b) = 1/2 + 1/4; H(c) = 1/4 + 1/6
    g = Graph.from_edges(
        make_edges(spark, [("a", "b", 2.0), ("b", "c", 4.0)], weights=True),
        weight="weight",
    )
    s = scores_dict(harmonic(g, "total", cost="weight"))
    assert s["a"] == pytest.approx(1 / 2 + 1 / 6, abs=1e-12)
    assert s["b"] == pytest.approx(1 / 2 + 1 / 4, abs=1e-12)
    assert s["c"] == pytest.approx(1 / 4 + 1 / 6, abs=1e-12)
    g.unpersist()


def test_weighted_parallel_edges_take_min(spark):
    # duplicate a→b with lengths 5 and 2: Dijkstra uses the shorter
    g = Graph.from_edges(
        make_edges(spark, [("a", "b", 5.0), ("a", "b", 2.0)], weights=True),
        weight="weight",
    )
    s = scores_dict(harmonic(g, "in", cost="weight"))
    assert s["b"] == pytest.approx(0.5, abs=1e-12)
    g.unpersist()


@pytest.mark.parametrize(
    "bad", [0.0, -1.0, float("nan"), float("inf"), None]
)
def test_non_positive_weight_is_invalid(spark, bad):
    # harmonic.rs:477-489 — typed error naming the edge. NULL and +inf
    # need explicit predicates (NULL <= 0 is NULL; inf passes <= 0) —
    # without them the edge silently drops from the min-weight agg.
    rows = [("a", "b", bad)]
    e = spark.createDataFrame(rows, "src string, dst string, weight double")
    g = Graph.from_edges(e, weight="weight")
    with pytest.raises(InvalidParameterError, match="a → b"):
        harmonic(g, "in", cost="weight")
    g.unpersist()


def test_exact_mode_size_guard(spark):
    g = Graph.from_edges(make_edges(spark, [("a", "b"), ("b", "c")]))
    with pytest.raises(InvalidParameterError, match="sample"):
        harmonic(g, "in", exact_max_vertices=2)
    # override restores the old behavior
    s = scores_dict(harmonic(g, "in", exact_max_vertices=None))
    assert s["c"] == 1.5
    g.unpersist()


def test_explicit_sources_parity_path(spark):
    # sources=[every vertex] must equal the exact run (scale n/n = 1)
    g = Graph.from_edges(
        make_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
                           ("b", "e")])
    )
    exact = scores_dict(harmonic(g, "in"))
    listed = scores_dict(harmonic(g, "in", sources=["a", "b", "c", "d", "e"]))
    assert listed == exact
    with pytest.raises(InvalidParameterError, match="unknown source"):
        harmonic(g, "in", sources=["nope"])
    g.unpersist()


def test_weighted_unit_agreement_on_unit_weights(spark):
    # with all weights = 1 the weighted mode must equal unit BFS
    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("b", "d", 1.0)]
    g = Graph.from_edges(make_edges(spark, rows, weights=True), weight="weight")
    unit = scores_dict(harmonic(g, "in"))
    weighted = scores_dict(harmonic(g, "in", cost="weight"))
    for k in unit:
        assert weighted[k] == pytest.approx(unit[k], abs=1e-12)
    g.unpersist()
