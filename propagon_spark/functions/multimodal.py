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
- **baseline JPEG** (SOF0 sequential, stdlib+numpy marker parse,
  Huffman entropy decode, vectorized IDCT, chroma upsampling,
  YCbCr→RGB); progressive/arithmetic JPEG and video codecs raise a
  clearly-marked ``NotImplementedError`` naming the sniffed format
  (MP3/H.264 need libraries this container doesn't ship);
- anything else tries an optional ``PIL`` import first.

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


_JPEG_MAGIC = b"\xff\xd8"


def _zigzag_order() -> np.ndarray:
    """The 64-entry JPEG zigzag scan: zigzag index → row-major index."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for y in (reversed(rng) if s % 2 == 0 else rng):
            out.append(y * 8 + (s - y))
    return np.array(out, dtype=np.intp)


_ZIGZAG = _zigzag_order()

#: IDCT-III basis A[u, x] = 0.5·a(u)·cos((2x+1)uπ/16); block = Aᵀ·F·A
_IDCT_A = 0.5 * np.cos(
    (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16
)
_IDCT_A[0] *= 1 / np.sqrt(2)


class _JpegBits:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0  # pad past the end (valid streams self-terminate)
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND (F.2.2.1): map the s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_table(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman: {(length, code): symbol} from a DHT segment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code in entropy stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Pure-stdlib/numpy **baseline sequential** JPEG (SOF0) decoder →
    (H, W, 3) RGB or (H, W, 1) grayscale uint8.

    Full marker parse (DQT 8/16-bit, DHT, SOF0, SOS, DRI with restart
    markers), per-block Huffman + dequant, then one vectorized einsum
    IDCT over all blocks per component, nearest-neighbor chroma
    upsampling for subsampled scans and BT.601 YCbCr→RGB. Like the PNG
    path this is a parity/ingest decoder (the Huffman loop is per-bit
    Python), NOT a throughput path — real pipelines mount PIL/turbojpeg
    and :func:`decode_image` prefers them when importable. Progressive
    (SOF2) and arithmetic-coded streams raise ``NotImplementedError``.
    """
    if payload[:2] != _JPEG_MAGIC:
        raise NotImplementedError("not a JPEG stream (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    restart_interval = 0
    i = 2
    data = payload
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if prec:
                    q = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(
                        np.float64
                    )
                    j += 128
                else:
                    q = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    j += 64
                quant[tid] = q
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1 : j + 17])
                nsym = sum(counts)
                symbols = seg[j + 17 : j + 17 + nsym]
                (huff_ac if cls else huff_dc)[tid] = _huff_table(
                    counts, symbols
                )
                j += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (progressive/arithmetic/"
                "hierarchical) — only baseline sequential (SOF0/1) is decoded"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            scan_map = {}  # cid -> (dc table id, ac table id)
            for k in range(ns):
                cid, tabs = seg[1 + 2 * k], seg[2 + 2 * k]
                scan_map[cid] = (tabs >> 4, tabs & 0xF)
            i = i + 2 + seglen
            return _jpeg_scan(
                data, i, frame, scan_map, quant, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seglen
    raise NotImplementedError("JPEG stream ended before SOS")


def _jpeg_scan(
    data, start, frame, scan_map, quant, huff_dc, huff_ac, restart_interval
):
    if frame is None:
        raise NotImplementedError("JPEG SOS before SOF0")
    h, w, comps = frame
    # de-stuff the entropy stream, splitting at restart markers (each
    # restart byte-aligns and resets every DC predictor)
    segments: list[bytes] = []
    buf = bytearray()
    i = start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            buf.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:
            buf.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(buf))
            buf = bytearray()
            i += 2
        else:  # EOI or next marker: scan over
            break
    segments.append(bytes(buf))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient canvases, filled block-by-block; the
    # IDCT runs vectorized over ALL blocks afterwards
    coef = {
        ci: np.zeros((mcuy * vs * mcux * hs, 64))
        for ci, (_, hs, vs, _) in enumerate(comps)
    }
    nblk = {ci: 0 for ci in range(len(comps))}
    pred = [0] * len(comps)
    bits = _JpegBits(segments[0])
    seg_i = 0
    mcus_done = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
                and seg_i + 1 < len(segments)
            ):
                seg_i += 1
                bits = _JpegBits(segments[seg_i])
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                dct, act = scan_map[cid]
                tdc, tac = huff_dc[dct], huff_ac[act]
                for _ in range(hs * vs):
                    zz = np.zeros(64)
                    s = _huff_decode(bits, tdc)
                    diff = _extend(bits.receive(s), s)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, tac)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            break
                        zz[k] = _extend(bits.receive(s), s)
                        k += 1
                    coef[ci][nblk[ci]] = zz
                    nblk[ci] += 1
            mcus_done += 1

    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        zz = coef[ci] * quant[tq][None, :]  # dequantize in zigzag order
        blocks = np.zeros((zz.shape[0], 64))
        blocks[:, _ZIGZAG] = zz  # de-zigzag
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _IDCT_A, blocks, _IDCT_A) + 128.0
        # blocks were decoded MCU-major: reassemble the component canvas
        bw = mcux * hs  # blocks per canvas row
        canvas = np.zeros((mcuy * vs * 8, bw * 8))
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        canvas[y0 : y0 + 8, x0 : x0 + 8] = pix[bi]
                        bi += 1
        # upsample subsampled components to full resolution and crop
        canvas = np.repeat(
            np.repeat(canvas, vmax // vs, axis=0), hmax // hs, axis=1
        )
        planes.append(canvas[:h, :w])

    if len(planes) == 1:
        out = planes[0][..., None]
    else:  # BT.601 YCbCr → RGB (JFIF full-range)
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        out = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    ``data[start:end]`` (32/64-bit sizes, size==0 → to end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed/truncated: stop walking, keep what we have
        yield typ, body, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, *path: bytes):
    """Descend a box path (e.g. b"moov", b"trak" yields every trak)."""
    if not path:
        yield start, end
        return
    for typ, b, e in _mp4_boxes(data, start, end):
        if typ == path[0]:
            yield from _mp4_find(data, b, e, *path[1:])


def _u32s(data: bytes, off: int, n: int) -> np.ndarray:
    return np.frombuffer(data, dtype=">u4", count=n, offset=off).astype(
        np.int64
    )


def parse_mp4_meta(payload: bytes) -> dict:
    """ISO-BMFF (MP4/M4A/MOV) container metadata — pure stdlib+numpy box
    walk, NO codec decode: movie duration from ``mvhd``, per-track
    handler/codec/dimensions/sample-count from ``trak`` subboxes.

    This is the honest scale path for video at ingest: a 100-TB corpus
    pass that filters/partitions on duration, codec and resolution reads
    a few hundred header bytes per asset and never touches a codec.
    """
    meta: dict = {"container": None, "duration_ms": None, "tracks": []}
    for b, e in _mp4_find(payload, 0, len(payload), b"ftyp"):
        meta["container"] = payload[b : b + 4].decode("ascii", "replace")
        break
    if meta["container"] is None:
        raise NotImplementedError("not an ISO-BMFF payload (no ftyp box)")
    for b, e in _mp4_find(payload, 0, len(payload), b"moov", b"mvhd"):
        ver = payload[b]
        if ver == 1:
            ts = int.from_bytes(payload[b + 20 : b + 24], "big")
            dur = int.from_bytes(payload[b + 24 : b + 32], "big")
        else:
            ts = int.from_bytes(payload[b + 12 : b + 16], "big")
            dur = int.from_bytes(payload[b + 16 : b + 20], "big")
        if ts:
            meta["duration_ms"] = int(dur * 1000 // ts)
    for tb, te in _mp4_find(payload, 0, len(payload), b"moov", b"trak"):
        trk: dict = {
            "handler": None,
            "codec": None,
            "width": None,
            "height": None,
            "n_samples": None,
        }
        for b, e in _mp4_find(payload, tb, te, b"mdia", b"hdlr"):
            trk["handler"] = payload[b + 8 : b + 12].decode("ascii", "replace")
        for b, e in _mp4_find(
            payload, tb, te, b"mdia", b"minf", b"stbl", b"stsd"
        ):
            if int.from_bytes(payload[b + 4 : b + 8], "big") >= 1:
                fmt = payload[b + 12 : b + 16]
                trk["codec"] = fmt.decode("ascii", "replace")
                if trk["handler"] == "vide":
                    # VisualSampleEntry: 8 hdr + 6 reserved + 2 dref +
                    # 16 predefined -> width/height u16 at +32/+34
                    se = b + 8
                    trk["width"] = int.from_bytes(
                        payload[se + 32 : se + 34], "big"
                    )
                    trk["height"] = int.from_bytes(
                        payload[se + 34 : se + 36], "big"
                    )
        for b, e in _mp4_find(
            payload, tb, te, b"mdia", b"minf", b"stbl", b"stsz"
        ):
            trk["n_samples"] = int.from_bytes(payload[b + 8 : b + 12], "big")
        meta["tracks"].append(trk)
    return meta


def _is_bmff(payload: bytes) -> bool:
    """ISO-BMFF sniff: an ``ftyp`` among the first few top-level boxes
    (spec-legal files may lead with ``free``/``skip`` — requiring ftyp
    FIRST would reject them while parse_mp4_meta accepts them)."""
    for i, (typ, _, _) in enumerate(_mp4_boxes(payload, 0, len(payload))):
        if typ == b"ftyp":
            return True
        if i >= 3:
            break
    return False


def mp4_sample_table(
    payload: bytes, handler: str = "vide"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-sample ``(times_ms, offsets, sizes)`` int64 arrays for the
    first ``handler`` track, from the stts/stsc/stsz/stco(co64) sample
    tables — the INDEX only, no payload bytes copied. Callers slice
    just the samples they keep (frame_sample selects ~1 per cadence
    tick, so materializing every access unit up front would copy the
    whole mdat per asset for nothing). Standard ISO-BMFF chunk-walk:
    stsc maps chunks → samples-per-chunk, offsets accumulate stsz sizes
    within each chunk."""
    for tb, te in _mp4_find(payload, 0, len(payload), b"moov", b"trak"):
        hd = None
        for b, e in _mp4_find(payload, tb, te, b"mdia", b"hdlr"):
            hd = payload[b + 8 : b + 12].decode("ascii", "replace")
        if hd != handler:
            continue
        stbl = next(
            iter(_mp4_find(payload, tb, te, b"mdia", b"minf", b"stbl")), None
        )
        if stbl is None:
            continue  # a later trak with this handler may carry tables
        sb, se = stbl
        tables: dict[bytes, tuple[int, int]] = {}
        for typ, b, e in _mp4_boxes(payload, sb, se):
            tables[typ] = (b, e)
        if b"stsz" not in tables or (
            b"stco" not in tables and b"co64" not in tables
        ):
            continue  # e.g. an empty thumbnail track ahead of the real one
        b, _ = tables[b"stsz"]
        fixed = int.from_bytes(payload[b + 4 : b + 8], "big")
        n = int.from_bytes(payload[b + 8 : b + 12], "big")
        sizes = (
            np.full(n, fixed, dtype=np.int64)
            if fixed
            else _u32s(payload, b + 12, n)
        )
        if b"co64" in tables:
            b, _ = tables[b"co64"]
            nch = int.from_bytes(payload[b + 4 : b + 8], "big")
            offs = np.frombuffer(
                payload, dtype=">u8", count=nch, offset=b + 8
            ).astype(np.int64)
        else:
            b, _ = tables[b"stco"]
            nch = int.from_bytes(payload[b + 4 : b + 8], "big")
            offs = _u32s(payload, b + 8, nch)
        # stsc: (first_chunk, samples_per_chunk, _) runs
        spc = np.ones(nch, dtype=np.int64)
        if b"stsc" in tables:
            b, _ = tables[b"stsc"]
            ne = int.from_bytes(payload[b + 4 : b + 8], "big")
            ent = _u32s(payload, b + 8, 3 * ne).reshape(ne, 3)
            for i in range(ne):
                first = ent[i, 0] - 1
                last = ent[i + 1, 0] - 1 if i + 1 < ne else nch
                spc[first:last] = ent[i, 1]
        # per-sample timestamps from stts deltas (track timescale units)
        times = np.zeros(n, dtype=np.int64)
        scale = 1
        for mb, me in _mp4_find(payload, tb, te, b"mdia", b"mdhd"):
            ver = payload[mb]
            scale = int.from_bytes(
                payload[mb + 20 : mb + 24]
                if ver == 1
                else payload[mb + 12 : mb + 16],
                "big",
            ) or 1
        if b"stts" in tables:
            b, _ = tables[b"stts"]
            ne = int.from_bytes(payload[b + 4 : b + 8], "big")
            ent = _u32s(payload, b + 8, 2 * ne).reshape(ne, 2)
            deltas = np.repeat(ent[:, 1], ent[:, 0])[:n]
            times[1 : len(deltas)] = np.cumsum(deltas[:-1])[: n - 1]
        # absolute byte offsets, vectorized: chunk id per sample, then
        # chunk base + within-chunk cumulative size. Clamp to the
        # samples the chunk tables can actually place (m) — a malformed
        # stsz count past sum(spc) must truncate, not crash.
        chunk_id = np.repeat(np.arange(nch, dtype=np.int64), spc)[:n]
        m = len(chunk_id)
        if m == 0:
            empty = np.zeros(0, dtype=np.int64)
            return empty, empty, empty
        sizes, times = sizes[:m], times[:m]
        csum = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        first_in_chunk = np.concatenate(([0], np.cumsum(spc)[:-1]))[
            : int(chunk_id.max()) + 1
        ]
        base = csum[np.minimum(first_in_chunk, m - 1)]
        sample_offs = offs[chunk_id] + (csum - base[chunk_id])
        return times * 1000 // scale, sample_offs, sizes
    raise NotImplementedError(
        f"no {handler!r} track with sample tables in ISO-BMFF payload"
    )


def extract_mp4_samples(
    payload: bytes, handler: str = "vide"
) -> list[tuple[int, bytes]]:
    """Per-sample (time_ms, encoded bytes) — :func:`mp4_sample_table`
    with the bytes sliced out, for callers that really want every
    codec-ENCODED access unit (no decode; a real decoder slots in
    downstream)."""
    times, offs, sizes = mp4_sample_table(payload, handler)
    return [
        (int(t), payload[int(o) : int(o) + int(s)])
        for t, o, s in zip(times, offs, sizes)
    ]


_PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("container", StringType()),
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_samples", LongType()),
        StructField("probe_error", StringType()),
    ]
)


def _probe_one(payload: bytes) -> dict:
    """Header-only sniff of one payload → container/codec/dims/duration."""
    out = dict.fromkeys(
        f.name for f in _PROBE_SCHEMA if f.name not in ("asset_id", "media_type")
    )
    if _is_bmff(payload):
        meta = parse_mp4_meta(payload)
        out["container"] = "mp4/" + meta["container"]
        out["duration_ms"] = meta["duration_ms"]
        vid = next(
            (t for t in meta["tracks"] if t["handler"] == "vide"), None
        )
        trk = vid or (meta["tracks"][0] if meta["tracks"] else None)
        if trk:
            out["codec"] = trk["codec"]
            out["width"], out["height"] = trk["width"], trk["height"]
            out["n_samples"] = trk["n_samples"]
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        out["container"] = "wav"
        out["codec"] = "pcm"
        with wave.open(io.BytesIO(payload)) as wv:
            nch, _, rate, nframes = wv.getparams()[:4]
        out["n_samples"] = nframes
        out["duration_ms"] = int(nframes * 1000 // rate) if rate else None
    elif payload[:8] == _PNG_MAGIC:
        out["container"] = "png"
        out["codec"] = "deflate"
        out["width"] = int.from_bytes(payload[16:20], "big")
        out["height"] = int.from_bytes(payload[20:24], "big")
    elif payload[:2] == b"BM":
        out["container"] = "bmp"
        out["codec"] = "raw"
        out["width"] = int.from_bytes(payload[18:22], "little", signed=True)
        out["height"] = abs(
            int.from_bytes(payload[22:26], "little", signed=True)
        )
    elif payload[:2] in (b"P5", b"P6"):
        m = _PNM_HEADER.match(payload)
        out["container"] = "pnm"
        out["codec"] = "raw"
        if m:
            out["width"], out["height"] = int(m.group(2)), int(m.group(3))
    elif payload[:2] == _JPEG_MAGIC:
        out["container"] = "jpeg"
        out["codec"] = "jpeg"
        i = 2
        while i + 4 <= len(payload):  # find SOFn for dimensions
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # legal fill byte: FF FF ... FF <marker>
                i += 1
                continue
            if marker == 0xD9:  # EOI: no SOF found
                break
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                # any SOFn frame header: P(1) H(2) W(2) after the length
                if i + 9 <= len(payload):
                    out["height"] = int.from_bytes(
                        payload[i + 5 : i + 7], "big"
                    )
                    out["width"] = int.from_bytes(
                        payload[i + 7 : i + 9], "big"
                    )
                break
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
    else:
        raise NotImplementedError(
            f"unrecognized container (magic {payload[:8]!r})"
        )
    return out


def probe_media(assets: DataFrame) -> DataFrame:
    """Header-only metadata probe over a multimodal asset table —
    (container, codec, width, height, duration_ms, n_samples) per asset,
    with per-row error capture (``probe_error``) so one corrupt payload
    never kills a 100-TB scan. This is the first pass of every
    large-scale media pipeline: filter/partition on cheap header fields
    before any decode work is scheduled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, mt, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                row = dict.fromkeys(f.name for f in _PROBE_SCHEMA)
                row.update({"asset_id": aid, "media_type": mt})
                try:
                    row.update(_probe_one(bytes(payload or b"")))
                except Exception as exc:  # noqa: BLE001 — per-row capture
                    row["probe_error"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in _PROBE_SCHEMA])

    return assets.mapInPandas(run, schema=_PROBE_SCHEMA)


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
    if payload[:2] == _JPEG_MAGIC:
        return decode_jpeg(payload)
    raise NotImplementedError(
        f"unsupported image format (magic {payload[:4]!r}); this container "
        "decodes PPM/PGM/BMP/PNG/baseline-JPEG natively"
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
    """Sample 'frames' at a fixed cadence (video path).

    ISO-BMFF payloads take the REAL container path: the stts/stsc/stsz/
    stco sample tables map the cadence to actual access units, and each
    emitted frame is that sample's codec-ENCODED bytes (the decode step
    itself still needs a codec library and slots in downstream — this is
    the honest boundary). BMFF payloads that cannot be mapped (no video
    track, truncated tables) emit zero frames instead of failing the
    scan — run :func:`probe_media` first to quantify and explain them.
    Non-MP4 payloads with ``fake=True`` use the deterministic
    byte-signal slicer so plumbing tests run anywhere."""
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
                raw = bytes(payload or b"")
                if not fake and _is_bmff(raw):
                    # index-only pass over the sample TABLE, then slice
                    # just the tick-selected access units (a 2h/30fps
                    # stream has ~216k samples; the cadence keeps ~1 per
                    # tick, so materializing every AU would copy the
                    # whole mdat for nothing). Per-row error capture:
                    # one corrupt container must not kill the scan —
                    # probe_media reports WHY via probe_error.
                    try:
                        times, offs, sizes = mp4_sample_table(raw, "vide")
                    except Exception:  # noqa: BLE001 — skip corrupt row
                        continue
                    next_tick, k = 0, 0
                    for t, o, s in zip(times, offs, sizes):
                        # first access unit at/after each cadence tick;
                        # a sparse stream never duplicates a sample —
                        # the next tick jumps past the one just emitted
                        if t >= next_tick:
                            ids.append(aid)
                            idxs.append(k)
                            payloads.append(raw[int(o) : int(o) + int(s)])
                            k += 1
                            next_tick = (int(t) // every_ms + 1) * every_ms
                    continue
                # non-BMFF fallback: same per-row error capture as the
                # BMFF branch — a mixed batch (one undecodable payload
                # among real MP4s) must not kill the scan either; with
                # fake=False an unsupported codec raises
                # NotImplementedError inside _decode, which here means
                # "skip this row" (probe_media reports WHY per-asset)
                try:
                    sig = _decode(payload, "video", fake)
                except Exception:  # noqa: BLE001 — skip undecodable row
                    continue
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
