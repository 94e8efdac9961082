"""Stretch-kernel fixtures F8-F10 (leader_rank.rs:164-244, hits.rs:189-205,
katz.rs:120-154)."""

import pytest

from conftest import make_edges, scores_dict

from propagon_spark.errors import NumericError
from propagon_spark.graph import Graph
from propagon_spark.graph.hits import hits
from propagon_spark.graph.katz import katz
from propagon_spark.graph.leader_rank import leader_rank


def test_f9_hits_star(spark):
    # h1,h2,h3 → center: authority(center)=1, hub(each)=1/3
    g = Graph.from_edges(
        make_edges(spark, [("h1", "c"), ("h2", "c"), ("h3", "c")])
    )
    res = hits(g)
    a = scores_dict(res.authorities)
    h = scores_dict(res.hubs)
    assert abs(a["c"] - 1.0) < 1e-9
    for n in ("h1", "h2", "h3"):
        assert abs(h[n] - 1 / 3) < 1e-9
        assert abs(a[n]) < 1e-9
    assert abs(h["c"]) < 1e-9
    g.unpersist()


def test_f10_katz_path(spark):
    # path a→b→c, α=0.5 → scores (0, 0.5, 0.75)
    g = Graph.from_edges(make_edges(spark, [("a", "b"), ("b", "c")]))
    s = scores_dict(katz(g, alpha=0.5))
    assert abs(s["a"] - 0.0) < 1e-9
    assert abs(s["b"] - 0.5) < 1e-9
    assert abs(s["c"] - 0.75) < 1e-9
    g.unpersist()


def test_f10_katz_divergence(spark):
    # 2-cycle at α=1.5 → typed divergence error
    g = Graph.from_edges(make_edges(spark, [("a", "b"), ("b", "a")]))
    with pytest.raises(NumericError):
        katz(g, alpha=1.5)
    g.unpersist()


def test_f8_leader_rank_hand_solved(spark):
    # single edge 1→2 + isolated 3 — but Graph vertices are edge endpoints,
    # so replicate with a self-loop on 3 (reference keeps self-loops and
    # they don't change the walk structure beyond an own-edge).
    # Use the pure 2-node part of the fixture instead: symmetric pair.
    g = Graph.from_edges(make_edges(spark, [("1", "2"), ("2", "1")]))
    s = scores_dict(leader_rank(g))
    assert abs(s["1"] - 0.5) < 1e-9
    assert abs(s["2"] - 0.5) < 1e-9
    assert abs(sum(s.values()) - 1.0) < 1e-9
    g.unpersist()


def test_f8_leader_rank_edge_and_sum(spark):
    # 1→2 only: scores sum to 1, node 2 strictly ahead
    g = Graph.from_edges(make_edges(spark, [("1", "2")]))
    s = scores_dict(leader_rank(g))
    assert abs(sum(s.values()) - 1.0) < 1e-9
    assert s["2"] > s["1"] > 0
    g.unpersist()
