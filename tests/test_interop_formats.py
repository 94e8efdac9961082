"""Dataset-interchange JSONL round trips + two-section emitters
(io.rs:1-60,372-420; emit.rs:88-100,157-169)."""

import pytest

from conftest import make_edges

from propagon_spark.errors import InvalidParameterError
from propagon_spark.sources.dataset_jsonl import (
    load_graph_jsonl,
    load_pairwise_jsonl,
    save_graph_jsonl,
    save_pairwise_jsonl,
)
from propagon_spark.state import save_two_section_tsv


def test_graph_jsonl_round_trip_bytes(spark, tmp_path):
    e = make_edges(
        spark, [("b", "a", 2.0), ("a", "c", 1.0), ("c", "b", 1.5)], weights=True
    )
    p1, p2 = str(tmp_path / "g1.jsonl"), str(tmp_path / "g2.jsonl")
    save_graph_jsonl(e, p1)
    header, vocab, loaded = load_graph_jsonl(spark, p1)
    assert header["algorithm"] == "graph"
    assert header["entities"] == 3
    assert vocab == ["b", "a", "c"]  # first-appearance order preserved
    save_graph_jsonl(loaded, p2, vocab=vocab)
    assert open(p1).read() == open(p2).read()


def test_graph_jsonl_header_and_layout(spark, tmp_path):
    e = make_edges(spark, [("x", "y", 1.0)], weights=True)
    p = str(tmp_path / "g.jsonl")
    save_graph_jsonl(e, p)
    lines = open(p).read().splitlines()
    assert lines[0].startswith('{"propagon":1,"kind":"dataset","algorithm":"graph"')
    assert lines[1] == '{"vocab":["x","y"]}'
    assert lines[2] == '{"s":[0],"d":[1],"x":[1.0]}'


def test_graph_jsonl_rejects_bad_files(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"propagon":99,"kind":"dataset","algorithm":"graph","params":null,"entities":0}\n')
    with pytest.raises(InvalidParameterError, match="newer"):
        load_graph_jsonl(spark, p)
    with open(p, "w") as f:
        f.write('{"propagon":1,"kind":"model","algorithm":"graph","params":null,"entities":0}\n')
    with pytest.raises(InvalidParameterError, match="kind"):
        load_graph_jsonl(spark, p)
    with open(p, "w") as f:
        f.write('{"propagon":1,"kind":"dataset","algorithm":"graph","params":null,"entities":1}\n')
        f.write('{"vocab":["a"]}\n')
        f.write('{"s":[0],"d":[5],"x":[1.0]}\n')
    with pytest.raises(InvalidParameterError, match="out-of-range"):
        load_graph_jsonl(spark, p)


def test_pairwise_jsonl_periods_round_trip(spark, tmp_path):
    pw = spark.createDataFrame(
        [("a", "b", 1.0, 0), ("c", "b", 1.0, 0), ("b", "a", 2.0, 1)],
        "winner string, loser string, weight double, period long",
    )
    p1, p2 = str(tmp_path / "p1.jsonl"), str(tmp_path / "p2.jsonl")
    save_pairwise_jsonl(pw, p1)
    header, vocab, loaded = load_pairwise_jsonl(spark, p1)
    assert header["params"] == {"periods": [2]}
    got = {(r["winner"], r["loser"]): r["period"] for r in loaded.collect()}
    assert got == {("a", "b"): 0, ("c", "b"): 0, ("b", "a"): 1}
    save_pairwise_jsonl(loaded, p2, vocab=vocab)
    assert open(p1).read() == open(p2).read()


def test_two_section_emitter(spark, tmp_path):
    top = spark.createDataFrame(
        [("a", 0.7), ("b", 0.3)], "name string, score double"
    )
    bottom = spark.createDataFrame(
        [("x", 0.2), ("y", 0.8)], "name string, score double"
    )
    p = str(tmp_path / "two.txt")
    save_two_section_tsv(top, bottom, p)
    assert open(p).read() == "a: 0.7\nb: 0.3\n\ny: 0.8\nx: 0.2\n"


def test_read_seeds(tmp_path):
    from propagon_spark.sources.edge_text import read_seeds

    p = tmp_path / "seeds.txt"
    p.write_text("a 2.5\nb\n\nc 1\na 0.5\n")
    assert read_seeds(str(p)) == {"a": 3.0, "b": 1.0, "c": 1.0}
    bad = tmp_path / "bad.txt"
    bad.write_text("a xyz\n")
    import pytest

    with pytest.raises(ValueError, match="line 1"):
        read_seeds(str(bad))
