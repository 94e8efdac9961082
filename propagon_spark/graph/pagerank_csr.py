"""CSR-blocked PageRank kernel (the north-star fast path).

Distributed **edge blocks** + driver-held **vertex state**: the (src,
dst) edge pairs are bucketed once by ``dst % nblocks`` via a JVM-only
dynamic-partitioned Parquet write straight off the canonical frame's
existing partitions (no repartition shuffle, no JVM→Python feed); each
iteration broadcasts the dense rank vector (ids are dense 0..n-1 by
construction — see ids.py) and every bucket task computes its gather
with a vectorized ``np.bincount`` over mmapped ``.npy`` sidecars
(pyarrow-decoded from the Parquet blocks on first touch) inside
``mapInPandas``. Because each dst belongs to exactly one bucket, each
vertex's partial arrives from exactly one task: the per-iteration data
movement is one n-vector broadcast out and one n-row Arrow collect
back — **no join and no shuffle anywhere in the fit**.

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
import re
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


#: worker-process block cache: {(fit_token, block_file): (src, dst)}.
#: The per-iteration input to Python workers is only a frame of BLOCK
#: FILE PATHS — re-shipping 10^7-10^8 Arrow rows JVM→Python every
#: iteration is exactly what this avoids. Local blocks are pyarrow-
#: decoded to ``.npy`` sidecars once and then MEMORY-MAPPED: the OS page
#: cache holds the single shared copy for every worker on the node, so
#: the unstable task→worker binding costs an mmap open, not a Parquet
#: decode. Remote (hdfs://, s3://) blocks fall back to a per-process
#: materialized cache under the byte budget below.
_BLOCK_CACHE: dict = {}

#: per-worker cache budget in bytes (task→worker binding is not stable,
#: so a worker can accumulate many blocks over a long fit; evict FIFO
#: beyond this). Uncached blocks are re-read from Parquet — cheap.
_CACHE_BYTES = int(os.environ.get("PROPAGON_CSR_CACHE_BYTES", 2_000_000_000))

#: per-worker cap on cached mmap ENTRIES: each np.load(mmap_mode="r")
#: holds an open file descriptor until evicted, and a long fit can walk a
#: worker across many buckets' shards (unstable task→worker binding).
#: 512 entries = 1024 fds worst case, inside a default RLIMIT_NOFILE;
#: eviction costs one re-mmap on the next touch, no decode.
_MMAP_CACHE_ENTRIES = int(os.environ.get("PROPAGON_CSR_MMAP_ENTRIES", 512))


def _cache_size() -> int:
    # memmapped entries are page-cache-backed, not process-private
    return sum(
        sum(a.nbytes for a in arrs)
        for arrs in _BLOCK_CACHE.values()
        if not isinstance(arrs[0], np.memmap)
    )


def _as_local_path(path: str) -> str | None:
    """Plain or ``file:`` path → POSIX path; other schemes → None."""
    if path.startswith("file:"):
        from urllib.parse import urlparse

        return urlparse(path).path
    if "://" not in path and not path.startswith(("hdfs:", "s3:", "s3a:")):
        return path
    return None


_SIDECARS = (".src.npy", ".dst.npy")


def _read_parquet_block(path: str):
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["src", "dst"])
    # no ordering requirement: the gather is an order-insensitive
    # np.bincount scatter-add
    return (
        np.ascontiguousarray(t.column("src").to_numpy()),
        np.ascontiguousarray(t.column("dst").to_numpy()),
    )


def _load_block(token: str, path: str):
    key = (token, path)
    arrs = _BLOCK_CACHE.get(key)
    if arrs is not None:
        return arrs

    read_path = _as_local_path(path) or path

    if _as_local_path(path) is not None:
        # Local block → mmapped npy columns. Task→worker binding is
        # unstable, so per-PROCESS caches miss constantly; memory-mapped
        # columns make the OS page cache the single shared copy across
        # every Python worker on the node — a re-"load" after the first
        # touch is three mmap opens, no decompress, no copy. Direct-npy
        # blocks (the local write path) exist up front; parquet blocks
        # from the portable writer are converted by the first toucher
        # (atomic renames; racers convert redundantly and lose).
        sidecars = [read_path + s for s in _SIDECARS]
        if not all(os.path.exists(s) for s in sidecars):
            cols = _read_parquet_block(read_path)
            for s, a in zip(sidecars, cols):
                tmp = f"{s}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    np.save(f, a)
                os.replace(tmp, s)
        arrs = tuple(np.load(s, mmap_mode="r") for s in sidecars)
        # mmaps hold no process-private memory (page-cache-backed), but
        # each holds an open fd — cap ENTRIES, not bytes
        _BLOCK_CACHE[key] = arrs
        for k in list(_BLOCK_CACHE):
            if k[0] != token:
                del _BLOCK_CACHE[k]
        while len(_BLOCK_CACHE) > _MMAP_CACHE_ENTRIES:
            _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))
        return arrs

    # remote block (hdfs:// etc.): materialized per-process cache with a
    # FIFO budget (dicts preserve insertion order; keep the newest entry)
    arrs = _read_parquet_block(path)
    for k in list(_BLOCK_CACHE):
        if k[0] != token:
            del _BLOCK_CACHE[k]
    _BLOCK_CACHE[key] = arrs
    while _cache_size() > _CACHE_BYTES and len(_BLOCK_CACHE) > 1:
        _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))
    return arrs


def _gather_factory(n: int, rank_bc, token: str):
    """Per-task SpMV gather. Each row carries one bucket's ';'-joined
    block files (all edges with the same ``dst % nblocks``); buckets
    partition the dst space, so each dst is owned by exactly one task and
    the driver can assign (not add) the collected partials."""

    def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdiv = rank_bc.value  # p·inv_out, division pre-folded on driver
        for pdf in batches:
            for paths in pdf["paths"]:
                acc = None
                for path in paths.split(";"):
                    src, dst = _load_block(token, path)
                    if len(dst) == 0:
                        continue
                    part = np.bincount(dst, weights=pdiv[src], minlength=n)
                    acc = part if acc is None else acc + part
                if acc is not None:
                    nz = np.nonzero(acc)[0]
                    if len(nz):
                        yield pd.DataFrame(
                            {"dst": nz.astype("int64"), "m": acc[nz]}
                        )

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
    t_setup = time.monotonic()

    edges.count()  # materialize the persisted canonical frame ONCE
    t_dedup = time.monotonic()

    # materialize dst-partitioned CSR block files once; workers mmap and
    # cache their blocks, so per-iteration traffic is one rank-vector
    # broadcast out and one n-row Arrow collect back. Blocks hold ONLY
    # (src, dst) — int32 below 2^31 vertices, 8 bytes/edge — because the
    # inverse out-degree is folded into the broadcast on the DRIVER
    # (p·inv_out is n multiplies), so the block build needs no join and
    # every iteration streams a third of the bytes. Blocks live under
    # the session checkpoint dir (a path all executors can read — on a
    # cluster that's HDFS/S3 or a shared mount, never the driver's /tmp).
    ckdir = sc.getCheckpointDir()
    if ckdir:
        blocks_dir = ckdir.rstrip("/") + f"/csr_blocks_{_uuid.uuid4().hex}"
    else:
        blocks_dir = tempfile.mkdtemp(prefix="propagon_csr_")
    # one bucket per core: fewer tasks per iteration = less constant
    # Python-runner overhead in the hot loop (buckets are ~|E|/cores rows)
    nblocks = max(1, sc.defaultParallelism)
    id_type = "int" if n <= 2**31 - 1 else "long"

    # Block build is a JVM-ONLY dynamic-partitioned Parquet write: each of
    # the canonical frame's existing partitions splits its rows by
    # ``dst % nblocks`` into per-bucket files — NO repartition shuffle and
    # NO JVM→Python Arrow feed (measured at 2·10^8 edges: the mapInPandas
    # feed alone costs ~28 core-seconds/10^8 rows; a columnar Parquet
    # write is ~5x cheaper and all whole-stage-codegen). Gather tasks
    # decode their bucket's files directly with pyarrow on first touch
    # (another ~10x faster than the Spark Arrow feed), publish ``.npy``
    # sidecars, and mmap them thereafter — the OS page cache keeps one
    # shared copy per node. Works identically on file://, hdfs://, s3://.
    (
        edges.select(
            F.col("src").cast(id_type),
            F.col("dst").cast(id_type),
            F.pmod(F.col("dst"), F.lit(nblocks)).cast("int").alias("bucket"),
        )
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(blocks_dir)
    )
    # file listing through Spark, not os.listdir — works on any Hadoop FS
    by_bucket: dict[int, list[str]] = {}
    try:
        block_files = spark.read.parquet(blocks_dir).inputFiles()
    except Exception:  # zero-row write leaves no files to infer from
        block_files = []
    for f in block_files:
        m = re.search(r"bucket=(\d+)", f)
        if m:
            by_bucket.setdefault(int(m.group(1)), []).append(f)
    # one row per bucket → exactly one gather task owns each dst range
    block_rows = [(";".join(sorted(ps)),) for _, ps in sorted(by_bucket.items())]
    blocks = spark.createDataFrame(
        block_rows, "paths string"
    ).repartition(max(1, len(block_rows)))
    t_blocks = time.monotonic()

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

    # out-degree vector (one small collect): inv_out folds the division
    # into the broadcast, and zero-outdegree rows ARE the sinks — no
    # separate anti-join pass
    odf = edges.groupBy("src").agg(F.count("*").alias("outdeg")).toPandas()
    outdeg_vec = np.zeros(n)
    outdeg_vec[odf["src"].to_numpy()] = odf["outdeg"].to_numpy()
    inv_out = np.divide(
        1.0, outdeg_vec, out=np.zeros(n), where=outdeg_vec > 0
    )
    sink_ids = np.nonzero(outdeg_vec == 0)[0].astype("int64")

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
        "setup_dedup_s": t_dedup - t_setup,
        "setup_blocks_s": t_blocks - t_dedup,
        "setup_state_s": time.monotonic() - t_blocks,
        "bcast_s": 0.0,
        "gather_s": 0.0,
        "update_s": 0.0,
    }

    while it < total_iters:
        t0 = time.monotonic()
        # p·inv_out on the driver (n multiplies) — elementwise identical
        # to the join kernel's rank·inv, keeping csr/join parity exact
        rank_bc = sc.broadcast(p * inv_out)
        t_b = time.monotonic()
        timings["bcast_s"] += t_b - t0
        partials = blocks.mapInPandas(
            _gather_factory(n, rank_bc, token),
            schema="dst long, m double",
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
