"""SparkSession factory tuned for iterative graph workloads.

Arrow on (all custom math is pandas/Arrow-vectorized — no per-row Python,
per the input_hint), AQE on (runtime skew-join splitting + partition
coalescing as backstop to our explicit salting), and a checkpoint dir for
lineage truncation in driver-controlled iteration loops.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "propagon-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Parameters default from env so the same code runs in tests
    (``local[4]``), the driver's bench (``local[$SPARK_GRAFT_CPUS]``), and a
    real cluster (spark-submit sets master; our settings only touch SQL conf).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("PROPAGON_SPARK_MASTER", f"local[{cpus}]")

    # make propagon_spark importable in Python workers: without this,
    # cloudpickle serializes our UDF closures BY VALUE — every query ships
    # a fresh copy of the module globals, which silently defeats the
    # worker-resident CSR block cache (pagerank_csr._BLOCK_CACHE) and
    # re-imports nothing. On a cluster, ship the package with
    # ``spark-submit --py-files`` instead.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else "")
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("PROPAGON_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("PROPAGON_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get(
            "PROPAGON_CHECKPOINT_DIR",
            os.path.join(tempfile.gettempdir(), "propagon_spark_ckpt"),
        )
    os.makedirs(checkpoint_dir, exist_ok=True)
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return spark
