"""Propagon-compatible JSONL model state (save/load).

Reference format (``/root/reference/crates/propagon/src/state.rs:27-119``):
header line ``{"propagon":1,"kind":"model","algorithm":tag,"params":{...},
"entities":N}`` followed by one ``{"id": name, "score": s}`` JSON line per
entity. Readers tolerate unknown fields, reject newer versions and wrong
algorithm tags (``state.rs:79-97``). Round-trip is byte-stable: save →
load → save produces identical text (``docs/PRD.md:201``, FR-4.3).

Models are one row per vertex — tiny next to the edge data — so the
writer collects to the driver (sorted by id for stable order). At
10^12-vertex scale use :func:`save_model_parquet` and keep the JSONL head
for interop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propagon_spark.errors import InvalidParameterError

FORMAT_VERSION = 1


def save_model_jsonl(
    scores: DataFrame, path: str, algorithm: str, params: dict | None = None
) -> None:
    """Write (name, score) rows as propagon JSONL model state."""
    rows = scores.select("name", "score").orderBy("name").collect()
    header = {
        "propagon": FORMAT_VERSION,
        "kind": "model",
        "algorithm": algorithm,
        "params": params or {},
        "entities": len(rows),
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(header, separators=(",", ":")) + "\n")
        for r in rows:
            f.write(
                json.dumps(
                    {"id": r["name"], "score": r["score"]}, separators=(",", ":")
                )
                + "\n"
            )
    os.replace(tmp, path)


def load_model_jsonl(
    spark: SparkSession, path: str, algorithm: str | None = None
) -> tuple[dict, DataFrame]:
    """Read propagon JSONL model state → (header, (name, score) DataFrame).

    Version/tag validation mirrors ``state.rs:79-97``: newer format
    versions and mismatched algorithm tags are rejected; unknown header
    fields are tolerated.
    """
    with open(path) as f:
        header = json.loads(f.readline())
        if header.get("propagon", 0) > FORMAT_VERSION:
            raise InvalidParameterError(
                f"state format version {header.get('propagon')} is newer than "
                f"supported {FORMAT_VERSION}"
            )
        if algorithm is not None and header.get("algorithm") != algorithm:
            raise InvalidParameterError(
                f"state algorithm {header.get('algorithm')!r} does not match "
                f"expected {algorithm!r}"
            )
        rows = [json.loads(line) for line in f if line.strip()]
    df = spark.createDataFrame(
        [(r["id"], float(r["score"])) for r in rows], "name string, score double"
    )
    return header, df


def save_model_parquet(scores: DataFrame, path: str) -> None:
    """Scale path: distributed Parquet write of (name, score)."""
    scores.select("name", "score").write.mode("overwrite").parquet(path)


def save_two_section_tsv(top: DataFrame, bottom: DataFrame, path: str) -> None:
    """The reference CLI's two-section format for hits / birank: first
    side's ``id: score`` lines, a blank line, then the second side's —
    each sorted score desc, name asc (hits = authorities then hubs,
    ``crates/propagon-cli/src/emit.rs:88-100``; birank = src side then
    dst side, ``emit.rs:157-169``)."""

    def emit(f, scores: DataFrame) -> None:
        rows = (
            scores.select("name", "score")
            .orderBy(F.desc("score"), F.asc("name"))
            .collect()
        )
        for r in rows:
            f.write(f"{r['name']}: {r['score']}\n")

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        emit(f, top)
        f.write("\n")
        emit(f, bottom)
    os.replace(tmp, path)


def save_scores_tsv(scores: DataFrame, path: str) -> None:
    """The reference CLI's default stdout format: sorted ``id: score``
    lines (``crates/propagon-cli/src/emit.rs:14-19``; ordering
    ``traits.rs:63-67``)."""
    from pyspark.sql import functions as F

    rows = (
        scores.select("name", "score")
        .orderBy(F.desc("score"), F.asc("name"))
        .collect()
    )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(f"{r['name']}: {r['score']}\n")
    os.replace(tmp, path)
