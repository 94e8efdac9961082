"""CSR-blocked PageRank kernel (the north-star fast path).

Distributed **edge blocks** + driver-held **vertex state**: the edge frame
(src, dst, inv_outdeg) is hash-partitioned by ``dst`` once and cached;
each iteration broadcasts the dense rank vector (ids are dense 0..n-1 by
construction — see ids.py) and every partition computes its gather with a
vectorized ``np.bincount`` inside ``mapInPandas`` (Arrow batches, no
per-row Python). Because blocks are dst-partitioned, each vertex's
partial arrives from exactly one partition: the per-iteration data
movement is one n-vector broadcast out and one n-row Arrow collect back —
**no join and no shuffle in the hot loop**.

This is the right physical strategy while the vertex state fits the
driver/executor memory (8 bytes/vertex: ~80 MB at 10^7). Beyond
``csr_max_vertices`` the caller falls back to the pure-dataflow join
kernel in pagerank.py, which has no such cap. Driver-side numpy updates
also make score sums bit-deterministic at any parallelism (fixed
summation order), strictly stronger than the 1e-6 allclose contract.

Semantics are identical to pagerank.py (same sink policies / teleport /
init / update rule); csr/join equality is pinned by the parametrized
cases in tests/test_pagerank.py (impl="csr" vs impl="join").

Cluster-safety: edge blocks are written under the SparkContext checkpoint
directory (a Hadoop-FS path every executor can read — set by
session.get_spark / spark.sparkContext.setCheckpointDir), not the
driver's local /tmp; block paths are discovered via inputFiles() and read
with pyarrow's URI-aware reader, so the same code runs on file:// and
hdfs:// alike.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
import time
import uuid as _uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from propagon_spark.errors import NumericError
from propagon_spark.graph.core import Graph, sorted_scores


#: worker-process-local CSR block cache: {(fit_token, block_file):
#: (src, dst, inv)}. The per-iteration input to Python workers is only a
#: frame of BLOCK FILE PATHS — the edge arrays are read from Parquet with
#: pyarrow on first touch and stay resident in the reused worker process
#: (spark.python.worker.reuse, default on). Re-shipping 10^7-10^8 Arrow
#: rows JVM→Python every iteration is exactly what this avoids; a cold
#: worker re-reads its block file (local/shared storage) — correct
#: fallback, never wrong, only slower.
_BLOCK_CACHE: dict = {}

#: per-worker cache budget in bytes (task→worker binding is not stable,
#: so a worker can accumulate many blocks over a long fit; evict FIFO
#: beyond this). Uncached blocks are re-read from Parquet — cheap.
_CACHE_BYTES = int(os.environ.get("PROPAGON_CSR_CACHE_BYTES", 2_000_000_000))


def _cache_size() -> int:
    return sum(a.nbytes + b.nbytes + c.nbytes for a, b, c in _BLOCK_CACHE.values())


def _load_block(token: str, path: str):
    key = (token, path)
    arrs = _BLOCK_CACHE.get(key)
    if arrs is None:
        import pyarrow.parquet as pq

        read_path = path
        if path.startswith("file:"):
            # normalize file:/x and file:///x URIs to plain local paths;
            # non-local schemes (hdfs://, s3://) go to pyarrow's
            # URI-aware FileSystem.from_uri path as-is
            from urllib.parse import urlparse

            read_path = urlparse(path).path
        t = pq.read_table(read_path, columns=["src", "dst", "inv"])
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        inv = t.column("inv").to_numpy()
        # dst-sorted layout (CSR-ish) for bincount locality
        order = np.argsort(dst, kind="stable")
        arrs = (
            np.ascontiguousarray(src[order]),
            np.ascontiguousarray(dst[order]),
            np.ascontiguousarray(inv[order]),
        )
        for k in list(_BLOCK_CACHE):
            if k[0] != token:
                del _BLOCK_CACHE[k]
        _BLOCK_CACHE[key] = arrs
        # enforce the per-worker budget: task→worker binding is unstable,
        # so one reused worker can otherwise accumulate every block of the
        # fit. Dicts preserve insertion order → FIFO evict oldest entries
        # (keep the one just inserted).
        while _cache_size() > _CACHE_BYTES and len(_BLOCK_CACHE) > 1:
            _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))
    return arrs


def _gather_factory(n: int, rank_bc, token: str):
    def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rank = rank_bc.value
        acc = None
        for pdf in batches:
            for path in pdf["path"]:
                src, dst, inv = _load_block(token, path)
                if len(dst) == 0:
                    continue
                part = np.bincount(dst, weights=rank[src] * inv, minlength=n)
                acc = part if acc is None else acc + part
        if acc is not None:
            nz = np.nonzero(acc)[0]
            yield pd.DataFrame({"dst": nz.astype("int64"), "m": acc[nz]})

    return gather


def pagerank_csr(
    g: Graph,
    edges: DataFrame,
    damping: float,
    sink: str,
    seeds: dict[str, float] | None,
    tol: float | None,
    iterations: int,
    max_iterations: int,
    checkpoint_interval: int,
    ckpt,
    start_iter: int,
    init_ranks: pd.DataFrame | None,
    metrics: list[dict],
    logger,
):
    """Run the CSR power iteration. ``edges`` is the canonicalized
    (dedup'd, sink-rewritten) id-typed edge frame. Returns
    (rank_vector, iterations, converged, metrics)."""
    spark = g.spark
    sc = spark.sparkContext
    n = g.num_vertices
    nparts = g.edges.rdd.getNumPartitions()
    t_setup = time.monotonic()

    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # materialize dst-partitioned CSR block files once; workers read and
    # cache their blocks, so per-iteration traffic is one rank-vector
    # broadcast out and one n-row Arrow collect back. Blocks live under
    # the session checkpoint dir (Hadoop-FS path all executors can read —
    # on a cluster that's HDFS/S3, never the driver's /tmp).
    ckdir = sc.getCheckpointDir()
    if ckdir:
        blocks_dir = ckdir.rstrip("/") + f"/csr_blocks_{_uuid.uuid4().hex}"
    else:
        blocks_dir = tempfile.mkdtemp(prefix="propagon_csr_")
    (
        edges.join(outdeg, "src")
        .select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            (F.lit(1.0) / F.col("outdeg")).alias("inv"),
        )
        .repartition(nparts, "dst")
        .write.mode("overwrite")
        .parquet(blocks_dir)
    )
    # file listing through Spark, not os.listdir — works on any Hadoop FS
    block_files = sorted(spark.read.parquet(blocks_dir).inputFiles())
    # round-robin repartition: exactly one block file per task
    blocks = spark.createDataFrame(
        [(f,) for f in block_files], "path string"
    ).repartition(max(1, len(block_files)))

    # driver-held vertex state ------------------------------------------
    if seeds is None:
        v = np.full(n, 1.0 / n)
    else:
        total = float(sum(seeds.values()))
        v = np.zeros(n)
        seed_rows = (
            spark.createDataFrame(
                [(str(k),) for k in seeds], "name string"
            )
            .join(g.vocab, "name")
            .select("name", "id")
            .collect()
        )
        id_of = {r["name"]: r["id"] for r in seed_rows}
        for name, w in seeds.items():
            v[id_of[str(name)]] = float(w) / total

    sink_ids = np.array(
        sorted(
            r["id"]
            for r in g.vocab.select("id")
            .join(outdeg.withColumnRenamed("src", "id"), "id", "left_anti")
            .collect()
        ),
        dtype="int64",
    )

    if init_ranks is not None:
        p = np.zeros(n)
        p[init_ranks["id"].to_numpy()] = init_ranks["rank"].to_numpy()
    else:
        p = v.copy()

    total_iters = iterations if tol is None else max_iterations
    converged = False
    it = start_iter
    token = _uuid.uuid4().hex
    # per-phase wall time: where an N→4N scaling run spends its seconds
    # (setup = canonicalize+block write, bcast/gather = per-iteration
    # distributed work, update = serial driver numpy)
    timings = {
        "kernel": "csr",
        "setup_s": time.monotonic() - t_setup,
        "bcast_s": 0.0,
        "gather_s": 0.0,
        "update_s": 0.0,
    }

    while it < total_iters:
        t0 = time.monotonic()
        rank_bc = sc.broadcast(p)
        t_b = time.monotonic()
        timings["bcast_s"] += t_b - t0
        partials = blocks.mapInPandas(
            _gather_factory(n, rank_bc, token), schema="dst long, m double"
        ).toPandas()
        t_g = time.monotonic()
        timings["gather_s"] += t_g - t_b
        gathered = np.zeros(n)
        gathered[partials["dst"].to_numpy()] = partials["m"].to_numpy()
        rank_bc.destroy()

        s_mass = float(p[sink_ids].sum()) if len(sink_ids) else 0.0
        if sink == "uniform":
            gathered += s_mass * v
        elif sink == "all" and n > 1:
            term = np.full(n, s_mass)
            term[sink_ids] -= p[sink_ids]
            gathered += term / (n - 1)
        new_p = damping * gathered + (1.0 - damping) * v

        l1 = float(np.abs(new_p - p).sum())
        mass = float(new_p.sum())
        if not (math.isfinite(l1) and math.isfinite(mass)):
            raise NumericError(f"pagerank diverged at iteration {it}")
        p = new_p
        it += 1
        timings["update_s"] += time.monotonic() - t_g
        metrics.append(
            {
                "iteration": it,
                "steps": 1,
                "l1_delta": l1,
                "mass": mass,
                "seconds": time.monotonic() - t0,
                "kernel": "csr",
            }
        )
        logger.info(
            "pagerank[csr] iter=%d l1=%.3e mass=%.6f %.2fs",
            it, l1, mass, metrics[-1]["seconds"],
        )

        if ckpt is not None and it % checkpoint_interval == 0:
            ckpt.save(it, _ranks_df(spark, p), metrics)

        if tol is not None and l1 < tol:
            converged = True
            break

    _hadoop_rm(spark, blocks_dir)
    return p, it, converged, metrics, timings


def _hadoop_rm(spark, path: str) -> None:
    """Recursive delete through the Hadoop FS API (scheme-agnostic)."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
        fs.delete(jpath, True)
    except Exception:
        shutil.rmtree(path, ignore_errors=True)


def _ranks_df(spark, p: np.ndarray) -> DataFrame:
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(p), dtype="int64"), "rank": p})
    )


def scores_from_vector(g: Graph, p: np.ndarray) -> DataFrame:
    ranks = _ranks_df(g.spark, p)
    return sorted_scores(
        g.with_names(ranks.select("id", F.col("rank").alias("score"))).select(
            "name", "score"
        )
    ), ranks
