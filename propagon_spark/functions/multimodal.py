"""Multimodal column plumbing (image/audio/video as opaque binary).

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``.

Decoding is REAL for the codec-free formats this sandbox can handle:

- **audio**: WAV (RIFF/PCM) via stdlib ``wave`` — 8/16/32-bit PCM,
  channel-mixed to a mono float signal;
- **image**: binary PPM (P6) / PGM (P5), uncompressed 24-bit BMP
  (numpy header + raw pixel parse), and **PNG** (stdlib ``zlib``
  inflate + per-row filter reconstruction — 8-bit non-interlaced
  grey/RGB/GA/RGBA);
- anything else tries an optional ``PIL`` import and otherwise raises a
  clearly-marked ``NotImplementedError`` naming the sniffed format
  (compressed codecs — JPEG/MP3/H.264 — need libraries this
  container doesn't ship).

``fake=True`` substitutes a deterministic byte-signal decoder so
plumbing tests run on arbitrary payloads.
"""

from __future__ import annotations

import io
import re
import wave
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


# --------------------------------------------------------------- codecs


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/PCM WAV → mono float64 sample signal (channels averaged)."""
    with wave.open(io.BytesIO(payload)) as w:
        nch, sampwidth, _, nframes = w.getparams()[:4]
        raw = w.readframes(nframes)
    if sampwidth == 1:
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sampwidth == 2:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sampwidth == 4:
        a = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise NotImplementedError(f"unsupported WAV sample width {sampwidth}")
    if nch > 1:
        a = a.reshape(-1, nch).mean(axis=1)
    return a


_PNM_HEADER = re.compile(
    rb"^(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s+"
    rb"(?:#[^\n]*\n\s*)*(\d+)\s"
)


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → (H, W, C) uint8 array."""
    m = _PNM_HEADER.match(payload)
    if not m:
        raise NotImplementedError("malformed PNM header")
    kind, w, h, maxval = m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    c = 3 if kind == b"P6" else 1
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=m.end())
    return pix.reshape(h, w, c)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR → RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (palette excluded — needs PLTE lookup)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8 via stdlib ``zlib`` + numpy filter
    reconstruction — no PIL needed for the most common real-world format.

    Supports 8-bit depth, color types grey/RGB/grey+alpha/RGBA,
    non-interlaced (the overwhelmingly common layout). Filter types
    0-4 (None/Sub/Up/Average/Paeth) per the spec; Sub/Average/Paeth have
    a sequential in-row dependency, so reconstruction runs row-wise
    (vectorized across channels) — a parity/ingest decoder, not a
    throughput path."""
    if payload[:8] != _PNG_MAGIC:
        raise NotImplementedError("not a PNG payload")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, interlace = data[8], data[9], data[12]
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if w is None or not idat:
        raise NotImplementedError("malformed PNG (missing IHDR/IDAT)")
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} interlace={interlace} "
            "unsupported (8-bit non-interlaced grey/RGB/GA/RGBA only)"
        )
    c = _PNG_CHANNELS[ctype]
    import zlib  # noqa: PLC0415 — stdlib, import where used

    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) < h * (stride + 1):
        raise NotImplementedError("truncated PNG pixel data")
    # scanlines: 1 filter byte + stride pixel bytes each
    lines = np.frombuffer(raw, np.uint8, h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters, rows = lines[:, 0], lines[:, 1:]
    img = np.zeros((h, stride), np.uint16)  # u16: room for filter sums
    prior = np.zeros(stride, np.uint16)
    for y in range(h):
        f, row = int(filters[y]), rows[y].astype(np.uint16)
        if f == 0:
            rec = row
        elif f == 2:  # Up
            rec = (row + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = rec[x - c] if x >= c else 0  # left
                b = prior[x]  # up
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (int(a) + int(b)) >> 1
                else:
                    cc = prior[x - c] if x >= c else 0  # up-left
                    p = int(a) + int(b) - int(cc)
                    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(cc))
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (row[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f} invalid")
        img[y] = rec
        prior = rec
    return img.astype(np.uint8).reshape(h, w, c)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3|1) uint8 → binary PPM/PGM bytes (the re-encode side of
    :func:`resize_images`)."""
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    kind = b"P6" if c == 3 else b"P5"
    return kind + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode an image payload → (H, W, C) uint8."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_pnm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    try:  # optional richer codecs when the library exists
        from PIL import Image  # noqa: PLC0415

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        pass
    raise NotImplementedError(
        f"unsupported image format (magic {payload[:4]!r}); this container "
        "decodes PPM/PGM/BMP/PNG natively — JPEG needs PIL"
    )


def _decode(payload: bytes, media_type: str, fake: bool) -> np.ndarray:
    """Decode a payload to a flat float64 signal (pixels or samples)."""
    if fake:
        # deterministic fake: treat payload bytes as the 'signal'
        return np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(
            np.float64
        )
    if payload is None or len(payload) == 0:
        return np.zeros(1)
    if media_type == "audio":
        return decode_wav(bytes(payload))
    if media_type == "image":
        return decode_image(bytes(payload)).astype(np.float64).ravel()
    raise NotImplementedError(
        f"no native decoder for media_type={media_type!r} (video needs "
        "codec libraries not present in this container)"
    )


# ------------------------------------------------------------ operators


def extract_features(
    assets: DataFrame, num_features: int = 8, fake: bool = False
) -> DataFrame:
    """Decode each asset and emit a fixed-size feature vector
    (chunked signal means). ``mapInPandas`` keeps the work Arrow-batched
    and partition-parallel; repartition upstream by ``asset_id`` for
    balanced decode work."""

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


def resize_images(
    assets: DataFrame, width: int, height: int
) -> DataFrame:
    """Nearest-neighbor resize of image payloads (PPM/PGM/BMP in, PPM
    out): (asset_id, payload, width, height). Pure numpy indexing inside
    the Arrow batch — the standard pre-training image normalization
    step."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload))
                ys = (np.arange(height) * img.shape[0] // height).clip(
                    0, img.shape[0] - 1
                )
                xs = (np.arange(width) * img.shape[1] // width).clip(
                    0, img.shape[1] - 1
                )
                out.append(encode_ppm(img[ys][:, xs]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(run, schema=schema)


def frame_sample(
    assets: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Sample 'frames' at a fixed cadence (video path). Without codec
    libraries the video decode step itself stays stubbed: the signal is
    the raw payload (``fake=True``) sliced into one frame per
    ``every_ms`` of ``duration_ms``; a real decoder slots into
    ``_decode``."""
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
    """Deterministic fake asset table for plumbing tests."""
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
