"""Checkpointed delta state for resumable iterative fits.

North-rule requirement: "checkpointed delta state so runs resume
mid-convergence with per-partition lineage and convergence metrics logged".
The reference's analogue is JSONL model state save/load between rating
periods (``/root/reference/crates/propagon/src/state.rs:42-119``,
CLI two-period flow ``crates/propagon-cli/tests/golden.rs:214-252``) — here
the state is a distributed ranks frame, so checkpoints are Parquet
snapshots plus a JSON manifest.

Layout under ``<dir>/<run_id>/``:
    state_<iter>/           Parquet ranks snapshot (id, rank)
    manifest_<iter>.json    {"iteration", "metrics": [...], "partitions":
                            [{"partition_id", "rows"}...], "schema"}
    _LATEST                 text file with the newest durable iteration

Manifests are written after the Parquet commit and ``_LATEST`` last, so a
kill at any point leaves a consistent resumable prefix. Paths are
driver-local in this sandbox; on a cluster the same layout lands on
HDFS/S3 (Parquet writes already go through Hadoop FS).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, directory: str, run_id: str):
        self.spark = spark
        self.root = os.path.join(directory, run_id)
        os.makedirs(self.root, exist_ok=True)

    def _state_path(self, iteration: int) -> str:
        return os.path.join(self.root, f"state_{iteration:06d}")

    def _manifest_path(self, iteration: int) -> str:
        return os.path.join(self.root, f"manifest_{iteration:06d}.json")

    def save(self, iteration: int, state: DataFrame, metrics: list[dict]) -> None:
        """Persist the state frame + per-partition lineage + metric history."""
        path = self._state_path(iteration)
        state.write.mode("overwrite").parquet(path)
        # Per-partition lineage: row counts per physical partition of the
        # snapshot we just wrote (read back so it reflects the files).
        part_rows = (
            self.spark.read.parquet(path)
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        manifest = {
            "iteration": iteration,
            "schema": state.schema.jsonValue(),
            "partitions": sorted(
                ({"partition_id": r["partition_id"], "rows": r["rows"]} for r in part_rows),
                key=lambda d: d["partition_id"],
            ),
            "metrics": metrics,
        }
        tmp = self._manifest_path(iteration) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(iteration))
        with open(os.path.join(self.root, "_LATEST.tmp"), "w") as f:
            f.write(str(iteration))
        os.replace(
            os.path.join(self.root, "_LATEST.tmp"), os.path.join(self.root, "_LATEST")
        )

    def latest(self) -> tuple[int, DataFrame, list[dict]] | None:
        """Return (iteration, state, metrics) of the newest durable
        checkpoint, or None."""
        latest_file = os.path.join(self.root, "_LATEST")
        if not os.path.exists(latest_file):
            return None
        with open(latest_file) as f:
            iteration = int(f.read().strip())
        with open(self._manifest_path(iteration)) as f:
            manifest = json.load(f)
        state = self.spark.read.parquet(self._state_path(iteration))
        return iteration, state, manifest["metrics"]

    def clear(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)
