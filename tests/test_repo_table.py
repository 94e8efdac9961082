"""Repo-table synthesis, co-commit edge derivation, sha256 invariant
(SURVEY.md §7.2, BASELINE.json input_hint)."""

import pytest
from pyspark.sql import functions as F

from propagon_spark.graph import Graph
from propagon_spark.graph.pagerank import pagerank
from propagon_spark.sources.repo_table import (
    derive_edges,
    load_repo_table,
    synth_repo_table,
    verify_content_sha,
)


@pytest.fixture(scope="module")
def repo_df(spark):
    df = synth_repo_table(spark, n_repos=3, n_files_per_repo=10, n_commits_per_repo=8)
    df = df.localCheckpoint(eager=True)
    return df


def test_schema_and_determinism(spark, repo_df):
    assert set(repo_df.columns) == {"repo", "path", "commit", "lang", "content"}
    assert repo_df.count() > 0
    again = synth_repo_table(
        spark, n_repos=3, n_files_per_repo=10, n_commits_per_repo=8
    )
    sym_diff = repo_df.exceptAll(again).count() + again.exceptAll(repo_df).count()
    assert sym_diff == 0


def test_derive_edges_matches_manual(spark):
    rows = [
        ("r", "a.py", "c1", "py", "x"),
        ("r", "b.py", "c1", "py", "y"),
        ("r", "a.py", "c2", "py", "x"),
        ("r", "b.py", "c2", "py", "y"),
        ("r", "c.py", "c2", "py", "z"),
        ("s", "a.py", "c1", "py", "w"),  # same commit id, different repo
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    e = {(r["src"], r["dst"]): r["weight"] for r in derive_edges(df, symmetric=False).collect()}
    assert e == {
        ("r:a.py", "r:b.py"): 2.0,
        ("r:a.py", "r:c.py"): 1.0,
        ("r:b.py", "r:c.py"): 1.0,
    }
    sym = derive_edges(df, symmetric=True)
    assert sym.count() == 6


def test_commit_cap(spark):
    rows = [("r", f"f{i}.py", "big", "py", "x") for i in range(5)]
    rows += [("r", "a.py", "ok", "py", "x"), ("r", "b.py", "ok", "py", "y")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    e = derive_edges(df, max_commit_files=4, symmetric=False).collect()
    assert {(r["src"], r["dst"]) for r in e} == {("r:a.py", "r:b.py")}


def test_sha_invariant_holds_and_detects(spark, repo_df):
    assert verify_content_sha(repo_df, repo_df) == 0
    tampered = repo_df.withColumn(
        "content",
        F.when(F.col("path") == "src/f0.py", F.lit("EVIL")).otherwise(
            F.col("content")
        ),
    )
    assert verify_content_sha(tampered, repo_df) > 0


def test_end_to_end_pagerank_over_derived_graph(spark, repo_df):
    edges = derive_edges(repo_df)
    g = Graph.from_edges(edges, weight="weight")
    res = pagerank(g, iterations=5, sink="uniform")
    rows = res.scores.collect()
    assert len(rows) == g.num_vertices
    total = sum(r["score"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    g.unpersist()


def test_load_repo_table_paths_and_catalog(spark, repo_df, tmp_path):
    from propagon_spark.errors import InvalidParameterError

    # parquet path round-trip, contract columns only, extra cols pruned
    p = str(tmp_path / "repo.parquet")
    repo_df.withColumn("extra", F.lit(1)).write.parquet(p)
    loaded = load_repo_table(spark, p)
    assert loaded.columns == ["repo", "path", "commit", "lang", "content"]
    assert loaded.count() == repo_df.count()

    # narrow-column projection keeps the scan at the asked-for columns
    narrow = load_repo_table(spark, p, columns=("repo", "path", "commit"))
    assert narrow.columns == ["repo", "path", "commit"]

    # catalog-name resolution path (Iceberg tables address the same way
    # once the catalog is configured; in-sandbox a temp view stands in)
    repo_df.createOrReplaceTempView("repo_files_v")
    via_table = load_repo_table(spark, "repo_files_v")
    assert via_table.count() == repo_df.count()

    # contract violations are typed errors
    repo_df.drop("lang").write.parquet(str(tmp_path / "missing.parquet"))
    with pytest.raises(InvalidParameterError, match="missing"):
        load_repo_table(spark, str(tmp_path / "missing.parquet"))
    repo_df.withColumn("commit", F.lit(1)).write.parquet(
        str(tmp_path / "badtype.parquet")
    )
    with pytest.raises(InvalidParameterError, match="string"):
        load_repo_table(spark, str(tmp_path / "badtype.parquet"))


def test_sparse_generator_contract(spark):
    from propagon_spark.sources.repo_table import synth_repo_table_sparse

    df = synth_repo_table_sparse(
        spark, n_repos=5, n_files_per_repo=40,
        n_commits_per_repo=6, files_per_commit=4,
    )
    assert set(df.columns) == {"repo", "path", "commit", "lang", "content"}
    again = synth_repo_table_sparse(
        spark, n_repos=5, n_files_per_repo=40,
        n_commits_per_repo=6, files_per_commit=4,
    )
    assert df.exceptAll(again).count() + again.exceptAll(df).count() == 0
    # a commit touches at most files_per_commit distinct files
    per_commit = (
        df.groupBy("repo", "commit").agg(F.count("*").alias("k")).collect()
    )
    assert per_commit and all(r["k"] <= 4 for r in per_commit)
    # no duplicate (repo, commit, path) rows (distinct collapsed draws)
    assert df.count() == df.select("repo", "commit", "path").distinct().count()
    # feeds the standard derivation
    e = derive_edges(df, max_commit_files=100, symmetric=True)
    assert e.count() > 0
    # symmetric: each (a,b) has its (b,a) twin
    fwd = e.select("src", "dst")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert fwd.exceptAll(rev).count() == 0
