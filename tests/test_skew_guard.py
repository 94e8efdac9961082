"""Skew guard for the folded dedup plan (ADVICE round-3, medium).

The join kernel normally folds edge dedup into the scatter repartition
(repartition by src, then distinct — one exchange). On a power-law graph
a single hub's entire raw edge set then lands in one dedup task, so
pagerank() probes the cached frame's partition sizes and falls back to
dedup-then-repartition when one partition dominates. The thresholds are
module constants so this test can exercise the fallback on a small graph;
production values (5M-row floor, 4x ratio) are asserted unchanged.
"""

import pytest

from conftest import make_edges, scores_dict

from propagon_spark.graph import Graph
from propagon_spark.graph import pagerank as pr_mod
from propagon_spark.graph.pagerank import pagerank


def _hub_rows():
    # hub "h" points at 400 distinct dsts, each raw edge duplicated 3x
    # (duplicates are what the dedup aggregate must collapse); plus a
    # sparse balanced tail so the mean partition size stays small.
    rows = []
    for i in range(400):
        rows.extend([("h", f"d{i}")] * 3)
    for i in range(40):
        rows.append((f"t{i}", f"t{(i + 1) % 40}"))
    return rows


@pytest.fixture(scope="module")
def hub_graph(spark):
    # 32 partitions, not the conftest default of 4: with P partitions
    # pmax <= total = P*mean, so the 4x-mean ratio is unreachable at P=4
    # (a production layout has dozens+ partitions and the hub's partition
    # clears the ratio easily, as here: 1200 rows vs mean ~39).
    g = Graph.from_edges(make_edges(spark, _hub_rows()), num_partitions=32)
    yield g
    g.unpersist()


def test_production_thresholds_unchanged():
    assert pr_mod._SKEW_PROBE_MIN_ROWS == 5_000_000
    assert pr_mod._SKEW_MAX_RATIO == 4


def test_skew_guard_falls_back_and_matches(hub_graph, monkeypatch):
    # balanced/default path: folded dedup plan
    res_folded = pagerank(hub_graph, iterations=3, sink="uniform", impl="join")
    assert res_folded.timings["dedup_plan"] == "folded"

    # lower the probe floor so the 1240-row hub graph trips the guard:
    # hash(src) clustering puts the hub's 1200 raw rows in one partition,
    # far above 4x the mean.
    monkeypatch.setattr(pr_mod, "_SKEW_PROBE_MIN_ROWS", 100)
    res_sep = pagerank(hub_graph, iterations=3, sink="uniform", impl="join")
    assert res_sep.timings["dedup_plan"] == "separate"

    # the fallback is a plan change only — scores must be identical
    a, b = scores_dict(res_folded.scores), scores_dict(res_sep.scores)
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12, (k, a[k], b[k])


def test_balanced_graph_stays_folded(spark, monkeypatch):
    # even with the probe floor lowered, a balanced graph keeps the
    # one-exchange folded plan
    monkeypatch.setattr(pr_mod, "_SKEW_PROBE_MIN_ROWS", 10)
    rows = [(f"v{i}", f"v{(i * 7 + 1) % 200}") for i in range(200)]
    g = Graph.from_edges(make_edges(spark, rows))
    try:
        res = pagerank(g, iterations=2, sink="uniform", impl="join")
        assert res.timings["dedup_plan"] == "folded"
    finally:
        g.unpersist()
