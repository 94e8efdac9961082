"""Determinism across parallelism (SURVEY §5 adopted contract; analogue of
clients/python/tests/test_determinism.py): scores allclose, component and
label assignments identical, at different partition counts."""

from conftest import make_edges, scores_dict

from propagon_spark.graph import Graph
from propagon_spark.graph.components import connected_components
from propagon_spark.graph.pagerank import pagerank
from propagon_spark.state import save_scores_tsv


ROWS = [("2", "1"), ("2", "3"), ("3", "1"), ("4", "1"), ("4", "2"),
        ("4", "3"), ("1", "5"), ("5", "2"), ("x", "y"), ("y", "x")]


def test_pagerank_allclose_across_parallelism(spark):
    g2 = Graph.from_edges(make_edges(spark, ROWS), num_partitions=2)
    g7 = Graph.from_edges(make_edges(spark, ROWS), num_partitions=7)
    s2 = scores_dict(pagerank(g2, sink="uniform", iterations=20).scores)
    s7 = scores_dict(pagerank(g7, sink="uniform", iterations=20).scores)
    for k in s2:
        assert abs(s2[k] - s7[k]) < 1e-12, k
    g2.unpersist()
    g7.unpersist()


def test_components_exact_across_parallelism(spark):
    g2 = Graph.from_edges(make_edges(spark, ROWS), num_partitions=2)
    g7 = Graph.from_edges(make_edges(spark, ROWS), num_partitions=7)
    c2 = {(r["name"], r["component"]) for r in connected_components(g2).collect()}
    c7 = {(r["name"], r["component"]) for r in connected_components(g7).collect()}
    assert c2 == c7
    g2.unpersist()
    g7.unpersist()


def test_tsv_emitter(spark, tmp_path):
    g = Graph.from_edges(make_edges(spark, ROWS))
    res = pagerank(g, sink="uniform", iterations=5)
    p = str(tmp_path / "scores.tsv")
    save_scores_tsv(res.scores, p)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == g.num_vertices
    assert all(": " in ln for ln in lines)
    # sorted desc by score
    vals = [float(ln.split(": ")[1]) for ln in lines]
    assert vals == sorted(vals, reverse=True)
    g.unpersist()
