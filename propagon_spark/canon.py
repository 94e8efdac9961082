"""Per-algorithm edge canonicalization (SURVEY.md §2.6 matrix).

Each reference algorithm preprocesses the shared edge list differently:

==============  =====  =======  ==========  ==========
algorithm       dedup  weights  self-loops  direction
==============  =====  =======  ==========  ==========
pagerank/ppr    yes    no       kept        directed    (pagerank.rs:6-7,133-141)
leader_rank     yes    no       kept        directed    (leader_rank.rs:74-87)
hits            yes    no       kept        directed    (hits.rs:118-126)
k-core          yes    no       dropped     undirected  (kcore.rs:47-58)
components      no     carried  kept        undirected reach (components.rs:8-11)
degree          no     yes      kept        per flag    (degree.rs:20-37)
katz            no     yes      kept        directed    (katz.rs:72-76)
lpa/triangles   yes    no       dropped     undirected  (new; SURVEY §2.4-2.5)
==============  =====  =======  ==========  ==========

All helpers operate on id-typed edge frames ``(src: long, dst: long
[, weight: double])`` and stay in pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_edges(edges: DataFrame) -> DataFrame:
    """Drop parallel edges and weights: distinct (src, dst).

    Mirrors the sort+dedup each unweighted algorithm performs
    (``pagerank.rs:133-141``).
    """
    return edges.select("src", "dst").distinct()


def drop_self_loops(edges: DataFrame) -> DataFrame:
    """Remove ``src == dst`` rows (k-core / LPA / triangles only,
    ``kcore.rs:50-54``)."""
    return edges.where(F.col("src") != F.col("dst"))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected reading: each edge contributes both directions.

    Matches ``undirected_adjacency`` (``graph.rs:155-162``) which inserts
    every edge into both endpoint lists. Output columns (src, dst) only.
    """
    e = edges.select("src", "dst")
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Dedup'd, self-loop-free, one row per undirected edge with src < dst.

    The canonical form for k-core / triangles / LPA (``kcore.rs:47-58``:
    swap-to-sorted, dedup, drop loops).
    """
    e = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return e.where(F.col("src") != F.col("dst")).distinct()
