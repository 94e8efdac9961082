"""Multimodal column plumbing (image/audio/video as opaque binary).

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The actual codec step is STUBBED
(image/audio libraries are not available in this environment): decoding
raises ``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decoder so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a multimodal asset row
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _decode(payload: bytes, media_type: str, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in this "
            "environment; pass fake=True for the deterministic stub decoder"
        )
    # deterministic fake: treat payload bytes as the 'signal'
    a = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float64)
    return a


def extract_features(
    assets: DataFrame, num_features: int = 8, fake: bool = False
) -> DataFrame:
    """Decode each asset and emit a fixed-size feature vector
    (byte-histogram moments in the stub). ``mapInPandas`` keeps the work
    Arrow-batched and partition-parallel; repartition upstream by
    ``asset_id`` for balanced decode work."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                sig = _decode(payload, mt, fake)
                chunks = np.array_split(sig, num_features)
                feats.append(
                    [float(c.mean()) if len(c) else 0.0 for c in chunks]
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample(
    assets: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Sample 'frames' at a fixed cadence (video path). Stub emits one
    frame index per ``every_ms`` of ``duration_ms`` with a deterministic
    byte-slice payload; the real decoder slots into ``_decode``."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                sig = _decode(payload, "video", fake)
                n = max(1, int((dur or 0) // every_ms))
                for i in range(n):
                    lo = (i * len(sig)) // n
                    hi = ((i + 1) * len(sig)) // n
                    ids.append(aid)
                    idxs.append(i)
                    payloads.append(bytes(sig[lo:hi].astype(np.uint8)))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return assets.mapInPandas(run, schema=schema)


def synth_assets(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic fake asset table for tests."""
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(
            F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256), "utf-8"
        ).alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("id") % 5 * 1000 + 1000).alias("duration_ms"),
    )
