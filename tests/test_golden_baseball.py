"""Golden e2e corpus F13: baseball.2018.edges vs the reference's captured
v1 output (crates/propagon-cli/tests/golden.rs:169-173, tier T = 1e-5
per-entity tolerance)."""

import os

import pytest

from conftest import scores_dict

from propagon_spark.graph import Graph
from propagon_spark.graph.pagerank import pagerank
from propagon_spark.sources.edge_text import read_edge_text

EDGES = "/root/reference/examples/tournament/baseball.2018.edges"
GOLDEN = "/root/reference/crates/propagon-cli/tests/golden/page-rank.out"


@pytest.mark.skipif(
    not (os.path.exists(EDGES) and os.path.exists(GOLDEN)),
    reason="reference corpus not available",
)
def test_pagerank_golden_baseball(spark):
    # CLI: propagon graph page-rank --matches (defaults: d=0.85, 10 iters,
    # sink=reverse, uniform teleport)
    expected = {}
    with open(GOLDEN) as f:
        for line in f:
            if ":" in line:
                name, score = line.split(":")
                expected[name.strip()] = float(score)

    g = Graph.from_edges(read_edge_text(spark, EDGES, matches=True), weight="weight")
    res = pagerank(g, damping=0.85, iterations=10, sink="reverse")
    got = scores_dict(res.scores)

    assert set(got) == set(expected)
    for name, exp in expected.items():
        assert abs(got[name] - exp) < 1e-5, (name, got[name], exp)
    g.unpersist()
