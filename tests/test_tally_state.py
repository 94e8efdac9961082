"""Pairwise ops (pairwise.rs:195-268) + JSONL state round-trip
(state.rs:42-119, tests/state.rs:1-7)."""

import os

import pytest

from conftest import make_edges

from propagon_spark.errors import InvalidParameterError
from propagon_spark.graph import Graph
from propagon_spark.graph.degree import degree
from propagon_spark.graph.tally import as_graph, filter_min_count, tally
from propagon_spark.state import load_model_jsonl, save_model_jsonl


def pairwise_df(spark, rows):
    return spark.createDataFrame(
        [(w, l, 1.0, 0) for w, l in rows],
        "winner string, loser string, weight double, period long",
    )


def test_tally(spark):
    pw = pairwise_df(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    t = {r["name"]: (r["wins"], r["losses"]) for r in tally(pw).collect()}
    assert t == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_as_graph_orientation(spark):
    pw = pairwise_df(spark, [("w", "l")])
    e = as_graph(pw).collect()
    assert (e[0]["src"], e[0]["dst"]) == ("l", "w")


def test_filter_min_count_cascades(spark):
    # c appears once; dropping (b,c) drops b below 2 → cascade drops (a,b)
    pw = pairwise_df(spark, [("a", "b"), ("b", "c"), ("a", "d"), ("d", "a")])
    out = filter_min_count(pw, 2)
    rows = {(r["winner"], r["loser"]) for r in out.collect()}
    assert rows == {("a", "d"), ("d", "a")}


def test_state_roundtrip(spark, tmp_path):
    g = Graph.from_edges(
        make_edges(spark, [("a", "b", 2.0), ("c", "b", 1.0)], weights=True),
        weight="weight",
    )
    scores = degree(g, "in")
    p1 = str(tmp_path / "m1.jsonl")
    p2 = str(tmp_path / "m2.jsonl")
    save_model_jsonl(scores, p1, algorithm="degree", params={"direction": "in"})
    header, loaded = load_model_jsonl(spark, p1, algorithm="degree")
    assert header["entities"] == 3
    save_model_jsonl(loaded, p2, algorithm="degree", params={"direction": "in"})
    # byte-identical save→load→save (PRD.md:201 FR-4.3)
    assert open(p1).read() == open(p2).read()
    g.unpersist()


def test_state_validation(spark, tmp_path):
    p = str(tmp_path / "m.jsonl")
    df = spark.createDataFrame([("a", 1.0)], "name string, score double")
    save_model_jsonl(df, p, algorithm="page-rank")
    with pytest.raises(InvalidParameterError):
        load_model_jsonl(spark, p, algorithm="degree")
    # newer version rejected
    bad = str(tmp_path / "bad.jsonl")
    with open(bad, "w") as f:
        f.write('{"propagon":99,"kind":"model","algorithm":"x","entities":0}\n')
    with pytest.raises(InvalidParameterError):
        load_model_jsonl(spark, bad)
