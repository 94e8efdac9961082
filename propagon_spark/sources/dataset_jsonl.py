"""Propagon dataset-interchange JSONL (chunked columnar format).

Reference: ``/root/reference/crates/propagon/src/dataset/io.rs:1-60,372-420``.
Layout::

    {"propagon":1,"kind":"dataset","algorithm":"graph","params":null,"entities":3}
    {"vocab":["a","b","c"]}                       (≤65,536 names per line)
    {"s":[0,1],"d":[1,2],"x":[1.0,1.0]}           (≤65,536 rows per line)

Pairwise datasets use ``algorithm":"pairwise"`` with
``params={"periods":[...]}`` (period start offsets) and chunk keys
``w/l/x`` (``io.rs:170-199``). Edge columns are vocab indices, so names
are never repeated per row. Readers re-validate version/kind/schema tag
and column lengths (``io.rs:73-110``); save → load → save is
byte-identical (the loader preserves the file's vocab order).

Like the model-state writer (state.py), this is the CLI-interop path:
chunks stream through the driver. At 10^12-row scale the engine's
interchange format is Parquet; this format exists so reference users can
move datasets between the two engines.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propagon_spark.errors import InvalidParameterError

SCHEMA_VERSION = 1
CHUNK = 65_536


def _write_header(f, algorithm: str, params, entities: int) -> None:
    f.write(
        json.dumps(
            {
                "propagon": SCHEMA_VERSION,
                "kind": "dataset",
                "algorithm": algorithm,
                "params": params,
                "entities": entities,
            },
            separators=(",", ":"),
        )
        + "\n"
    )


def _write_vocab(f, names: list[str]) -> None:
    for i in range(0, len(names), CHUNK):
        f.write(
            json.dumps({"vocab": names[i : i + CHUNK]}, separators=(",", ":"))
            + "\n"
        )


def _read_prefix(f, algorithm: str) -> tuple[dict, list[str], str | None]:
    header = json.loads(f.readline())
    if header.get("propagon", 0) > SCHEMA_VERSION:
        raise InvalidParameterError(
            f"dataset format version {header.get('propagon')} is newer than "
            f"supported {SCHEMA_VERSION}"
        )
    if header.get("kind") != "dataset":
        raise InvalidParameterError(
            f"expected a dataset file, found kind {header.get('kind')!r}"
        )
    if header.get("algorithm") != algorithm:
        raise InvalidParameterError(
            f"dataset schema {header.get('algorithm')!r} does not match "
            f"expected {algorithm!r}"
        )
    vocab: list[str] = []
    pending = None
    for line in f:
        if not line.strip():
            continue
        obj = json.loads(line)
        if "vocab" in obj:
            vocab.extend(obj["vocab"])
        else:
            pending = line
            break
    return header, vocab, pending


# ---------------------------------------------------------------- graph


def save_graph_jsonl(
    edges: DataFrame, path: str, vocab: list[str] | None = None
) -> None:
    """Write a ``(src, dst, weight)`` name-typed edge frame as a propagon
    graph dataset. ``vocab`` fixes the name→index order (defaults to
    first-appearance order over collected rows, matching the reference's
    insertion-order interner)."""
    rows = edges.select(
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
        F.col("weight").cast("double"),
    ).collect()
    if vocab is None:
        vocab = []
        seen = set()
        for r in rows:
            for nm in (r[0], r[1]):
                if nm not in seen:
                    seen.add(nm)
                    vocab.append(nm)
    idx = {nm: i for i, nm in enumerate(vocab)}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _write_header(f, "graph", None, len(vocab))
        _write_vocab(f, vocab)
        for i in range(0, len(rows), CHUNK):
            chunk = rows[i : i + CHUNK]
            f.write(
                json.dumps(
                    {
                        "s": [idx[r[0]] for r in chunk],
                        "d": [idx[r[1]] for r in chunk],
                        "x": [r[2] for r in chunk],
                    },
                    separators=(",", ":"),
                )
                + "\n"
            )
    os.replace(tmp, path)


def load_graph_jsonl(
    spark: SparkSession, path: str
) -> tuple[dict, list[str], DataFrame]:
    """Read a propagon graph dataset → (header, vocab, (src, dst, weight)
    name-typed DataFrame in file row order)."""
    data: list[tuple[str, str, float]] = []
    with open(path) as f:
        header, vocab, pending = _read_prefix(f, "graph")
        n = len(vocab)

        def eat(line: str) -> None:
            obj = json.loads(line)
            s, d, x = obj.get("s", []), obj.get("d", []), obj.get("x", [])
            if not (len(s) == len(d) == len(x)):
                raise InvalidParameterError("graph chunk column mismatch")
            for a, b, w in zip(s, d, x):
                if not (0 <= a < n and 0 <= b < n):
                    raise InvalidParameterError(
                        f"edge references out-of-range vocab id ({a}, {b})"
                    )
                data.append((vocab[a], vocab[b], float(w)))

        if pending is not None:
            eat(pending)
            for line in f:
                if line.strip():
                    eat(line)
    df = spark.createDataFrame(data, "src string, dst string, weight double")
    return header, vocab, df


# ------------------------------------------------------------- pairwise


def save_pairwise_jsonl(
    pairwise: DataFrame, path: str, vocab: list[str] | None = None
) -> None:
    """Write a ``(winner, loser, weight, period)`` frame as a propagon
    pairwise dataset: rows ordered by period, ``params.periods`` holding
    the period start offsets (``dataset/pairwise.rs:period_starts``)."""
    rows = (
        pairwise.select(
            F.col("winner").cast("string"),
            F.col("loser").cast("string"),
            F.col("weight").cast("double"),
            F.coalesce(F.col("period"), F.lit(0)).cast("long"),
        )
        .orderBy("period")
        .collect()
    )
    if vocab is None:
        vocab = []
        seen = set()
        for r in rows:
            for nm in (r[0], r[1]):
                if nm not in seen:
                    seen.add(nm)
                    vocab.append(nm)
    idx = {nm: i for i, nm in enumerate(vocab)}
    starts = []
    for i in range(1, len(rows)):
        if rows[i][3] != rows[i - 1][3]:
            starts.append(i)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _write_header(f, "pairwise", {"periods": starts}, len(vocab))
        _write_vocab(f, vocab)
        for i in range(0, len(rows), CHUNK):
            chunk = rows[i : i + CHUNK]
            f.write(
                json.dumps(
                    {
                        "w": [idx[r[0]] for r in chunk],
                        "l": [idx[r[1]] for r in chunk],
                        "x": [r[2] for r in chunk],
                    },
                    separators=(",", ":"),
                )
                + "\n"
            )
    os.replace(tmp, path)


def load_pairwise_jsonl(
    spark: SparkSession, path: str
) -> tuple[dict, list[str], DataFrame]:
    """Read a propagon pairwise dataset → (header, vocab,
    (winner, loser, weight, period) DataFrame); period column rebuilt
    from ``params.periods`` start offsets."""
    data: list[tuple[str, str, float]] = []
    with open(path) as f:
        header, vocab, pending = _read_prefix(f, "pairwise")
        n = len(vocab)

        def eat(line: str) -> None:
            obj = json.loads(line)
            w, l, x = obj.get("w", []), obj.get("l", []), obj.get("x", [])
            if not (len(w) == len(l) == len(x)):
                raise InvalidParameterError("pairwise chunk column mismatch")
            for a, b, wt in zip(w, l, x):
                if not (0 <= a < n and 0 <= b < n):
                    raise InvalidParameterError(
                        f"row references out-of-range vocab id ({a}, {b})"
                    )
                data.append((vocab[a], vocab[b], float(wt)))

        if pending is not None:
            eat(pending)
            for line in f:
                if line.strip():
                    eat(line)
    starts = (header.get("params") or {}).get("periods", [])
    bounds = [0, *starts, len(data)]
    rows = []
    for p in range(len(bounds) - 1):
        for i in range(bounds[p], bounds[p + 1]):
            rows.append((*data[i], p))
    df = spark.createDataFrame(
        rows, "winner string, loser string, weight double, period long"
    )
    return header, vocab, df
