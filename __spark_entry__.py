"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a propagon_spark operator over the
driver-generated test tables; ``oracle_sql()`` holds the equivalent
DuckDB SQL. Graph queries run over a co-occurrence edge table derived
from ``lineitem`` (order = commit, part = file — the same co-commit
derivation as SURVEY.md §7.2; see
``propagon_spark/sources/tpch_graph.py``). Iterative fixpoint operators
(k-core, converged PageRank, MinHash/SimHash near-dup) have no practical
ANSI-SQL twin and are registered without an oracle (rows-only check).

Float-valued results are rounded to 9 decimals on BOTH sides: the math
is arranged so both engines fold doubles in the same order, and the
rounding absorbs last-ulp differences from Spark's partition-parallel
sums.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from propagon_spark.graph.core import Graph  # noqa: E402
from propagon_spark.sources import tpch_graph  # noqa: E402
from propagon_spark.sources.tpch_graph import ORACLE_EDGES_CTE, ORDER_CAP  # noqa: E402

DAMPING = 0.85
PPR_DAMPING = 0.5
PR_ITERS = 3


def _doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _graph(spark: SparkSession, sf_dir: str, symmetric: bool, min_weight: int = 1) -> Graph:
    e = tpch_graph.cocommit_edges(spark, sf_dir, symmetric=symmetric, min_weight=min_weight)
    return Graph.from_edges(e, weight="weight")


# --------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to 1e-6 convergence over the co-occurrence
    graph derived from sf0.001 lineitem."""
    from propagon_spark.graph.pagerank import pagerank

    g = _graph(spark, "/root/testdata/sf0.001", symmetric=True)
    res = pagerank(g, damping=DAMPING, sink="uniform", tol=1e-6, max_iterations=100)
    return res.scores


# ------------------------------------------------------------- queries


def q_edge_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch_graph.cocommit_edges(spark, sf_dir, symmetric=False)


def _degree(direction: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from propagon_spark.graph.degree import degree

        g = _graph(spark, sf_dir, symmetric=False)
        return degree(g, direction)

    return run


def q_pagerank_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.pagerank import pagerank

    g = _graph(spark, sf_dir, symmetric=True)
    res = pagerank(g, damping=DAMPING, iterations=PR_ITERS, sink="none")
    return res.scores.select("name", F.round("score", 9).alias("score"))


def q_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.pagerank import pagerank

    g = _graph(spark, sf_dir, symmetric=True)
    seed = g.vocab.agg(F.min("name")).first()[0]
    res = pagerank(
        g, damping=PPR_DAMPING, iterations=PR_ITERS, sink="none", seeds={seed: 1.0}
    )
    return res.scores.select("name", F.round("score", 9).alias("score"))


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.components import connected_components

    g = _graph(spark, sf_dir, symmetric=False, min_weight=2)
    cc = connected_components(g)
    rep = g.vocab.select(
        F.col("id").alias("component"), F.col("name").alias("component_name")
    )
    return (
        cc.join(rep, "component")
        .select(
            "name",
            F.col("component_name").alias("component"),
            F.col("component_size").cast("long").alias("component_size"),
        )
    )


def q_triangle_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.triangles import triangle_total

    g = _graph(spark, sf_dir, symmetric=False)
    n = triangle_total(g)
    return spark.createDataFrame([(n,)], "triangles long")


def q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.triangles import triangle_count

    g = _graph(spark, sf_dir, symmetric=False)
    return triangle_count(g).select("name", "triangles")


def q_lpa_round1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.lpa import label_propagation

    g = _graph(spark, sf_dir, symmetric=False, min_weight=2)
    res = label_propagation(g, max_rounds=1)
    lab = g.vocab.select(F.col("id").alias("label"), F.col("name").alias("label_name"))
    return res.join(lab, "label").select("name", F.col("label_name").alias("label"))


def _pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tpch_graph.load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("grp"),
        F.col("l_linenumber").alias("ln"),
        F.concat(F.lit("t:"), tpch_graph.part_name("l_partkey")).alias("item"),
        F.col("l_extendedprice").alias("p"),
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.ln") != F.col("b.ln"))
            & (F.col("a.p") > F.col("b.p")),
        )
        .select(
            F.col("a.item").alias("winner"),
            F.col("b.item").alias("loser"),
            F.lit(1.0).alias("weight"),
            F.lit(0).cast("long").alias("period"),
        )
    )


def q_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.tally import tally

    return tally(_pairwise(spark, sf_dir))


def q_sha_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("sha")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.functions.dedup import exact_duplicates

    return exact_duplicates(_doc(spark, sf_dir))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.functions.text import token_count

    d = _doc(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_t"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.functions.text import lang_id

    return lang_id(_doc(spark, sf_dir)).select("doc_id", "lang_pred")


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = cosine_topk(emb, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine", 9).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


# ----- rows-only entries (no practical SQL twin; driver records a weaker
# ----- check and the judge sees which)


def q_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.pagerank import pagerank

    g = _graph(spark, sf_dir, symmetric=True)
    res = pagerank(g, damping=DAMPING, sink="uniform", tol=1e-6, max_iterations=100)
    return res.scores


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.kcore import kcore

    g = _graph(spark, sf_dir, symmetric=False, min_weight=2)
    return kcore(g).select("name", "coreness")


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.functions.dedup import minhash_near_duplicates

    return minhash_near_duplicates(_doc(spark, sf_dir), threshold=0.5)


def q_birank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bipartite supplier → part endorsements from lineitem (side-local id
    # spaces; seeded random init ⇒ tier-S rows-only check, like the
    # reference's own golden treatment of birank)
    from propagon_spark.graph.birank import birank

    li = tpch_graph.load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("src"),
        F.col("l_partkey").alias("dst"),
        F.col("l_quantity").alias("weight"),
    )
    res = birank(li, iterations=10)
    return res.dst_scores


def q_bootstrap_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bootstrap CIs over in-degree on the co-occurrence graph (Poisson
    # resampling; seeded but RNG-dependent ⇒ rows-only)
    from propagon_spark.graph.bootstrap import bootstrap
    from propagon_spark.graph.degree import degree

    g = _graph(spark, sf_dir, symmetric=False, min_weight=2)
    res = bootstrap(g, lambda rg: degree(rg, "in"), replicates=8)
    return res.intervals


def q_harmonic_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sampled-source harmonic estimator on the sparse subgraph (iterative
    # BFS fixpoint ⇒ rows-only)
    from propagon_spark.graph.harmonic import harmonic

    g = _graph(spark, sf_dir, symmetric=False, min_weight=2)
    return harmonic(g, "total", sample=64, seed=2014)


def q_rank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.rank_centrality import rank_centrality

    return rank_centrality(_pairwise(spark, sf_dir), iterations=50)


def q_random_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propagon_spark.graph.random_walker import random_walker

    return random_walker(_pairwise(spark, sf_dir), iterations=50)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edge_derivation": q_edge_derivation,
        "degree_in": _degree("in"),
        "degree_out": _degree("out"),
        "degree_total": _degree("total"),
        "pagerank_k3": q_pagerank_k,
        "ppr_seeded_k3": q_ppr_seeded,
        "components_minw2": q_components,
        "triangle_total": q_triangle_total,
        "triangles_per_vertex": q_triangles_per_vertex,
        "lpa_round1": q_lpa_round1,
        "tally": q_tally,
        "sha_invariant": q_sha_invariant,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "ann_cosine_topk": q_ann_cosine_topk,
        "pagerank_converged": q_pagerank_converged,
        "kcore_minw2": q_kcore,
        "minhash_neardup": q_minhash_neardup,
        "birank_supplier_part": q_birank,
        "bootstrap_degree_ci": q_bootstrap_degree,
        "harmonic_sampled": q_harmonic_sampled,
        "rank_centrality": q_rank_centrality,
        "random_walker": q_random_walker,
    }


# ---------------------------------------------------------- oracle SQL


def _pr_unrolled(damping: float, iters: int, seeded: bool) -> str:
    """Generate DuckDB SQL unrolling `iters` PageRank power steps over the
    deduplicated symmetric co-occurrence graph (no sinks by symmetry)."""
    v = (
        "CASE WHEN v.id = (SELECT min(id) FROM v) THEN 1.0 ELSE 0.0 END"
        if seeded
        else "(1.0/(SELECT c FROM n))"
    )
    v0 = v.replace("v.id", "id") if seeded else v
    sql = [
        f"WITH {ORACLE_EDGES_CTE},",
        "e AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),",
        "v AS (SELECT DISTINCT src AS id FROM e),",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM v),",
        "deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1),",
        f"r0 AS (SELECT id, {v0} AS rank FROM v),",
    ]
    for k in range(1, iters + 1):
        sql.append(
            f"g{k} AS (SELECT e.dst AS id, sum(r.rank/d.outdeg) AS m "
            f"FROM e JOIN r{k-1} r ON e.src = r.id JOIN deg d ON e.src = d.id "
            f"GROUP BY 1),"
        )
        sql.append(
            f"r{k} AS (SELECT v.id, {damping}*coalesce(g{k}.m, 0.0) "
            f"+ {1.0 - damping}*{v} AS rank "
            f"FROM v LEFT JOIN g{k} ON v.id = g{k}.id),"
        )
    sql[-1] = sql[-1].rstrip(",")
    sql.append(f"SELECT id AS name, ROUND(rank, 9) AS score FROM r{iters}")
    return "\n".join(sql)


_DEGREE_ORACLE = {
    "in": "SELECT dst AS name, sum(weight) AS score FROM pairs GROUP BY 1",
    "out": "SELECT src AS name, sum(weight) AS score FROM pairs GROUP BY 1",
    "total": (
        "SELECT name, sum(w) AS score FROM ("
        "SELECT src AS name, weight AS w FROM pairs "
        "UNION ALL SELECT dst, weight FROM pairs) u GROUP BY 1"
    ),
}


def _degree_sql(direction: str) -> str:
    agg = _DEGREE_ORACLE[direction]
    return f"""WITH {ORACLE_EDGES_CTE},
v AS (SELECT DISTINCT name FROM (SELECT src AS name FROM pairs
      UNION ALL SELECT dst FROM pairs) u),
agg AS ({agg})
SELECT v.name, coalesce(agg.score, 0.0) AS score
FROM v LEFT JOIN agg USING (name)"""


_TRI_BASE = f"""WITH {ORACLE_EDGES_CTE},
c AS (SELECT src, dst FROM pairs),
t AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      FROM c e1
      JOIN c e2 ON e2.src = e1.src AND e2.dst > e1.dst
      JOIN c e3 ON e3.src = e1.dst AND e3.dst = e2.dst)"""


_LANG_CASE = """CASE
  WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
  ELSE 'fr' END"""


def _marker_count_sql(words: list[str]) -> str:
    terms = [
        f"CAST((length(p) - length(replace(p, '{w}', ''))) / {len(w)} AS BIGINT)"
        for w in words
    ]
    return " + ".join(terms)


def oracle_sql() -> dict[str, str]:
    from propagon_spark.functions.text import _LANG_MARKERS

    lang_scores = ", ".join(
        f"({_marker_count_sql(ws)}) AS s_{lang}"
        for lang, ws in sorted(_LANG_MARKERS.items())
    )
    return {
        "edge_derivation": f"WITH {ORACLE_EDGES_CTE} SELECT * FROM pairs",
        "degree_in": _degree_sql("in"),
        "degree_out": _degree_sql("out"),
        "degree_total": _degree_sql("total"),
        "pagerank_k3": _pr_unrolled(DAMPING, PR_ITERS, seeded=False),
        "ppr_seeded_k3": _pr_unrolled(PPR_DAMPING, PR_ITERS, seeded=True),
        "components_minw2": f"""WITH RECURSIVE {ORACLE_EDGES_CTE},
se AS (SELECT src, dst FROM pairs WHERE weight >= 2
       UNION SELECT dst, src FROM pairs WHERE weight >= 2),
v AS (SELECT DISTINCT src AS id FROM se),
reach(id, r) AS (
    SELECT id, id FROM v
    UNION
    SELECT se.dst, reach.r FROM reach JOIN se ON se.src = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS component_size
          FROM comp GROUP BY 1)
SELECT c.id AS name, c.component, s.component_size
FROM comp c JOIN sizes s USING (component)""",
        "triangle_total": f"{_TRI_BASE}\nSELECT CAST(count(*) AS BIGINT) AS triangles FROM t",
        "triangles_per_vertex": f"""{_TRI_BASE},
pv AS (SELECT x AS id FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t),
cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM pv GROUP BY 1),
v AS (SELECT DISTINCT nm AS id FROM (SELECT src AS nm FROM pairs
      UNION ALL SELECT dst FROM pairs) u)
SELECT v.id AS name, coalesce(cnt.triangles, 0) AS triangles
FROM v LEFT JOIN cnt USING (id)""",
        "lpa_round1": f"""WITH {ORACLE_EDGES_CTE},
ce AS (SELECT src, dst FROM pairs WHERE weight >= 2),
se AS (SELECT src, dst FROM ce UNION SELECT dst, src FROM ce),
v AS (SELECT DISTINCT src AS id FROM se),
hist AS (SELECT dst AS id, src AS label, count(*) AS cnt FROM se GROUP BY 1, 2),
best AS (SELECT id, label FROM hist
         QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) = 1)
SELECT v.id AS name, coalesce(b.label, v.id) AS label
FROM v LEFT JOIN best b USING (id)""",
        "tally": """WITH li2 AS (SELECT l_orderkey AS grp, l_linenumber AS ln,
    concat('t:', lpad(CAST(l_partkey AS VARCHAR), 8, '0')) AS item,
    l_extendedprice AS p FROM lineitem),
pw AS (SELECT a.item AS winner, b.item AS loser
       FROM li2 a JOIN li2 b
       ON a.grp = b.grp AND a.ln <> b.ln AND a.p > b.p),
w AS (SELECT winner AS name, CAST(count(*) AS BIGINT) AS wins,
             CAST(count(*) AS DOUBLE) AS win_weight FROM pw GROUP BY 1),
l AS (SELECT loser AS name, CAST(count(*) AS BIGINT) AS losses,
             CAST(count(*) AS DOUBLE) AS loss_weight FROM pw GROUP BY 1)
SELECT coalesce(w.name, l.name) AS name,
       coalesce(wins, 0) AS wins, coalesce(losses, 0) AS losses,
       coalesce(win_weight, 0.0) AS win_weight,
       coalesce(loss_weight, 0.0) AS loss_weight
FROM w FULL OUTER JOIN l ON w.name = l.name""",
        "sha_invariant": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "dedup_exact": """SELECT sha256(text) AS content_sha,
       min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS copies
FROM documents GROUP BY 1""",
        "text_stats": r"""SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0
       ELSE CAST(array_length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
  END AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_t
FROM documents""",
        "lang_id": f"""WITH padded AS (
    SELECT doc_id, concat(' ', lower(text), ' ') AS p FROM documents),
scores AS (SELECT doc_id, {lang_scores} FROM padded)
SELECT doc_id, {_LANG_CASE} AS lang_pred FROM scores""",
        "ann_cosine_topk": """WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           list_cosine_similarity(a.emb, b.emb) AS c
    FROM e a JOIN e b ON a.vec_id <> b.vec_id),
ranked AS (
    SELECT query_id, neighbor_id, c,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY c DESC, neighbor_id ASC) AS rank
    FROM scored)
SELECT query_id, neighbor_id, ROUND(c, 9) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5""",
    }
