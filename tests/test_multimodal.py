"""Real multimodal decoders (WAV via stdlib wave, PPM/PGM/BMP via numpy)
plus the Spark-side plumbing over mapInPandas."""

import io
import struct
import wave

import numpy as np
import pytest

from propagon_spark.functions.multimodal import (
    decode_bmp,
    decode_image,
    decode_pnm,
    decode_wav,
    encode_ppm,
    extract_features,
    frame_sample,
    resize_images,
    synth_assets,
)


def wav_bytes(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP writer (test fixture)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].astype(np.uint8).tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + info + rows


def test_wav_round_trip():
    sig = (np.sin(np.linspace(0, 20, 400)) * 1000).astype("<i2")
    out = decode_wav(wav_bytes(sig))
    assert np.array_equal(out, sig.astype(np.float64))


def test_wav_stereo_mixes_channels():
    inter = np.zeros(20, dtype="<i2")
    inter[0::2] = 100  # L
    inter[1::2] = 300  # R
    out = decode_wav(wav_bytes(inter, channels=2))
    assert np.allclose(out, 200.0)


def test_ppm_round_trip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_pnm(encode_ppm(img)), img)
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    assert np.array_equal(decode_pnm(encode_ppm(gray)), gray)


def test_bmp_decode():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_bmp(bmp_bytes(img)), img)


def test_decode_image_sniffs_and_rejects():
    img = np.ones((2, 2, 3), dtype=np.uint8)
    assert decode_image(encode_ppm(img)).shape == (2, 2, 3)
    assert decode_image(bmp_bytes(img)).shape == (2, 2, 3)
    # PNG is now natively decoded — a truncated one is a typed PNG error
    with pytest.raises(NotImplementedError, match="PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    # JPEG is natively decoded — a truncated one is a typed JPEG error
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0....")
    with pytest.raises(NotImplementedError, match="magic"):
        decode_image(b"GIF89a....")


def test_resize_images_spark(spark):
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 200  # top-left quadrant bright
    assets = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(img)), 4, 4, 0)],
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms long",
    )
    out = resize_images(assets, 2, 2).collect()
    small = decode_pnm(bytes(out[0]["payload"]))
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 200 and small[1, 1, 0] == 0


def test_extract_features_real_decoders(spark):
    sig = (np.ones(64) * 500).astype("<i2")
    img = np.full((4, 4, 3), 7, dtype=np.uint8)
    assets = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav_bytes(sig)), 0, 0, 0),
            (2, "image", bytearray(encode_ppm(img)), 4, 4, 0),
        ],
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms long",
    )
    rows = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert np.allclose(rows[1]["features"], 500.0)
    assert np.allclose(rows[2]["features"], 7.0)


def test_fake_plumbing_still_works(spark):
    assets = synth_assets(spark, n=12)
    feats = extract_features(assets, fake=True)
    assert feats.count() == 12
    assert len(feats.first()["features"]) == 8
    frames = frame_sample(assets.where("media_type = 'video'"), fake=True)
    assert frames.count() > 0


def test_video_without_codec_skips_row_not_scan(spark):
    # non-BMFF payloads with fake=False are skipped PER ROW (same
    # contract as a corrupt BMFF container: one undecodable asset never
    # kills the scan); the WHY is surfaced per-asset by probe_media,
    # which raises the typed codec error path internally
    assets = synth_assets(spark, n=3).where("media_type = 'video'")
    assert frame_sample(assets, fake=False).count() == 0
    from propagon_spark.functions.multimodal import _decode

    payload = bytes(assets.first()["payload"])
    with pytest.raises(Exception, match="codec"):
        _decode(payload, "video", fake=False)


# ------------------------------------------------------------------ PNG


def png_bytes(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG writer (test fixture, independent of the decoder):
    applies the FORWARD filter per scanline so every filter type 0-4 can
    be exercised against known pixels."""
    import zlib

    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c).astype(np.int32)
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prior = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row, f = flat[y], filters[y]
        filt = np.empty_like(row)
        for x in range(w * c):
            a = int(row[x - c]) if x >= c else 0
            b = int(prior[x])
            cc = int(prior[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (int(row[x]) - pred) & 0xFF
        raw.append(f)
        raw += filt.astype(np.uint8).tobytes()
        prior = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_round_trip_rgb_all_filters():
    from propagon_spark.functions.multimodal import decode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    # one scanline per filter type 0-4 (5 rows)
    out = decode_png(png_bytes(img, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(out, img)


def test_png_grey_and_rgba():
    from propagon_spark.functions.multimodal import decode_png

    grey = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    assert np.array_equal(decode_png(png_bytes(grey, [0, 1, 2, 4])), grey)
    rgba = np.arange(64, dtype=np.uint8).reshape(4, 4, 4)
    assert np.array_equal(decode_png(png_bytes(rgba, [4, 3, 2, 1])), rgba)


def test_png_sniffed_by_decode_image_and_resize(spark):
    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    img[2:, :, :] = 0
    assert np.array_equal(decode_image(png_bytes(img)), img)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(png_bytes(img)), 4, 4, 0)],
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms long",
    )
    out = resize_images(assets, 2, 2).collect()
    small = decode_pnm(bytes(out[0]["payload"]))
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 200 and small[1, 1, 0] == 0


def test_png_unsupported_variants_are_typed():
    from propagon_spark.functions.multimodal import decode_png

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(png_bytes(img))
    # flip IHDR bit depth byte (offset: 8 magic + 8 len/type + 8 w/h)
    payload[24] = 16
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(bytes(payload))


# ------------------------------------------------------------- JPEG

class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing (test fixture)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _fdct_tokens(comps_blocks, pred, ci, tokens):
    """Forward DCT + quantize(q=1) + zigzag + run-length one block list."""
    from propagon_spark.functions.multimodal import _IDCT_A, _ZIGZAG

    for block in comps_blocks:
        f = _IDCT_A @ (block.astype(np.float64) - 128.0) @ _IDCT_A.T
        zz = np.round(f.ravel()[_ZIGZAG]).astype(int)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = abs(diff).bit_length()
        tokens.append(("dc", s, diff, s))
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                tokens.append(("ac", 0xF0, 0, 0))  # ZRL
                run -= 16
            s = abs(v).bit_length()
            tokens.append(("ac", (run << 4) | s, v, s))
            run = 0
        if last < 63:
            tokens.append(("ac", 0x00, 0, 0))  # EOB


def _pad_to(plane, mult):
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def jpeg_bytes(img: np.ndarray, subsample: bool = False,
               restart: int = 0) -> bytes:
    """Minimal baseline-sequential JPEG encoder (test fixture): quant
    table all-ones (near-lossless), one shared DC and AC Huffman table
    with flat 8-bit canonical codes, optional 4:2:0 subsampling and
    restart intervals. Emits standards-conformant SOI/DQT/SOF0/DHT/
    [DRI]/SOS/EOI so the decoder's real marker parse is exercised."""
    from propagon_spark.functions.multimodal import _ZIGZAG

    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]
    if gray:
        planes = [img.reshape(h, w).astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            ye = _pad_to(y, 2)
            cb = (cb[: ye.shape[0], : ye.shape[1]] if False else
                  _pad_to(cb, 2))
            cr = _pad_to(cr, 2)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(
                axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(
                axis=(1, 3))
            planes = [y, cb, cr]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        np.pad(
            p,
            ((0, mcuy * vs * 8 - p.shape[0]), (0, mcux * hs * 8 - p.shape[1])),
            mode="edge",
        )
        for (hs, vs), p in zip(samp, planes)
    ]

    tokens = []
    pred = [0] * len(planes)
    mcus = 0
    marks = []  # (token index, rst index) restart positions
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcus and mcus % restart == 0:
                marks.append(len(tokens))
                pred = [0] * len(planes)
            for ci, ((hs, vs), p) in enumerate(zip(samp, padded)):
                blocks = [
                    p[(my * vs + by) * 8:(my * vs + by + 1) * 8,
                      (mx * hs + bx) * 8:(mx * hs + bx + 1) * 8]
                    for by in range(vs) for bx in range(hs)
                ]
                _fdct_tokens(blocks, pred, ci, tokens)
            mcus += 1

    dc_syms = sorted({t[1] for t in tokens if t[0] == "dc"})
    ac_syms = sorted({t[1] for t in tokens if t[0] == "ac"})
    dc_code = {s: i for i, s in enumerate(dc_syms)}
    ac_code = {s: i for i, s in enumerate(ac_syms)}

    bw = _BitWriter()
    chunks = []  # entropy segments split at restart marks
    mark_set = set(marks)
    for ti, (kind, sym, v, s) in enumerate(tokens):
        if ti in mark_set:
            bw.flush()
            chunks.append(bytes(bw.out))
            bw = _BitWriter()
        code = dc_code[sym] if kind == "dc" else ac_code[sym]
        bw.put(code, 8)
        if s:
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
    bw.flush()
    chunks.append(bytes(bw.out))

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    q = np.ones(64, dtype=np.uint8)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + q[_ZIGZAG].tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [len(planes)])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    for cls, syms in ((0, dc_syms), (1, ac_syms)):
        counts = [0] * 16
        counts[7] = len(syms)
        out += seg(0xC4, bytes([cls << 4]) + bytes(counts) + bytes(syms))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    for i, ch in enumerate(chunks):
        out += ch
        if i < len(chunks) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    out += b"\xff\xd9"
    return bytes(out)


def _smooth_image(h, w, channels=3, seed=3):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)
    if channels == 1:
        return np.clip(base, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(seed)
    shift = rng.integers(-30, 30, size=3)
    img = np.stack([np.clip(base + s, 0, 255) for s in shift], axis=-1)
    return img.astype(np.uint8)


def test_jpeg_gray_round_trip():
    from propagon_spark.functions.multimodal import decode_jpeg

    img = _smooth_image(24, 33, channels=1)
    out = decode_jpeg(jpeg_bytes(img))
    assert out.shape == (24, 33, 1)
    assert np.max(np.abs(out[..., 0].astype(int) - img.astype(int))) <= 3


def test_jpeg_rgb_444_round_trip():
    from propagon_spark.functions.multimodal import decode_jpeg

    img = _smooth_image(21, 13, channels=3)
    out = decode_jpeg(jpeg_bytes(img))
    assert out.shape == (21, 13, 3)
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 6


def test_jpeg_420_subsampled_and_restart():
    from propagon_spark.functions.multimodal import decode_jpeg

    # constant chroma: 2x2 chroma averaging is lossless, isolating the
    # upsampling path from subsampling loss
    img = np.stack([_smooth_image(35, 50, 1)] * 3, axis=-1)
    out = decode_jpeg(jpeg_bytes(img, subsample=True))
    assert out.shape == (35, 50, 3)
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 6
    out_r = decode_jpeg(jpeg_bytes(img, subsample=True, restart=2))
    assert np.array_equal(out, out_r)


def test_jpeg_sniffed_and_progressive_typed():
    from propagon_spark.functions.multimodal import decode_jpeg

    img = _smooth_image(16, 16, channels=3)
    assert decode_image(jpeg_bytes(img)).shape == (16, 16, 3)
    # SOF2 (progressive) must be a typed error, not a wrong answer
    prog = b"\xff\xd8" + b"\xff\xc2" + (10).to_bytes(2, "big") + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(prog)


# ------------------------------------------------------------- ISO-BMFF


def _box(typ: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + typ + payload


def mp4_bytes(
    samples: list[bytes],
    deltas_ms: list[int] | None = None,
    width: int = 320,
    height: int = 240,
    codec: bytes = b"avc1",
) -> bytes:
    """Minimal but structurally valid ISO-BMFF fixture: ftyp + mdat with
    the given (codec-encoded stand-in) samples in two chunks + a moov
    whose stts/stsc/stsz/stco tables describe them (timescale 1000, so
    deltas are milliseconds)."""
    n = len(samples)
    deltas = deltas_ms or [1000] * n
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    data_off = len(ftyp) + 8  # mdat payload position in the file
    split = (n + 1) // 2  # chunk 1 gets the first ceil(n/2) samples
    chunk_offs = [data_off, data_off + sum(len(s) for s in samples[:split])]

    mvhd = _box(
        b"mvhd",
        bytes(4)  # version+flags
        + bytes(8)  # ctime/mtime
        + (1000).to_bytes(4, "big")  # timescale
        + sum(deltas).to_bytes(4, "big")  # duration
        + bytes(80),
    )
    mdhd = _box(
        b"mdhd",
        bytes(4) + bytes(8) + (1000).to_bytes(4, "big")
        + sum(deltas).to_bytes(4, "big") + bytes(4),
    )
    hdlr = _box(b"hdlr", bytes(4) + bytes(4) + b"vide" + bytes(12))
    entry = (
        (86).to_bytes(4, "big") + codec + bytes(6) + (1).to_bytes(2, "big")
        + bytes(16) + width.to_bytes(2, "big") + height.to_bytes(2, "big")
        + bytes(86 - 36)
    )
    stsd = _box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + entry)
    stts = _box(
        b"stts",
        bytes(4) + n.to_bytes(4, "big")
        + b"".join(
            (1).to_bytes(4, "big") + d.to_bytes(4, "big") for d in deltas
        ),
    )
    stsc = _box(
        b"stsc",
        bytes(4) + (2).to_bytes(4, "big")
        + (1).to_bytes(4, "big") + split.to_bytes(4, "big")
        + (1).to_bytes(4, "big")
        + (2).to_bytes(4, "big") + (n - split).to_bytes(4, "big")
        + (1).to_bytes(4, "big"),
    )
    stsz = _box(
        b"stsz",
        bytes(4) + (0).to_bytes(4, "big") + n.to_bytes(4, "big")
        + b"".join(len(s).to_bytes(4, "big") for s in samples),
    )
    stco = _box(
        b"stco",
        bytes(4) + (2).to_bytes(4, "big")
        + b"".join(o.to_bytes(4, "big") for o in chunk_offs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_mp4_meta_parse():
    from propagon_spark.functions.multimodal import parse_mp4_meta

    payload = mp4_bytes([b"frameA", b"frameBB", b"frameCCC", b"frameDDDD"])
    meta = parse_mp4_meta(payload)
    assert meta["container"] == "isom"
    assert meta["duration_ms"] == 4000
    assert len(meta["tracks"]) == 1
    t = meta["tracks"][0]
    assert t["handler"] == "vide"
    assert t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (320, 240)
    assert t["n_samples"] == 4


def test_mp4_sample_extraction_exact_bytes():
    from propagon_spark.functions.multimodal import extract_mp4_samples

    frames = [b"frameA", b"frameBB", b"frameCCC", b"frameDDDD"]
    out = extract_mp4_samples(mp4_bytes(frames), "vide")
    assert [f for _, f in out] == frames
    assert [t for t, _ in out] == [0, 1000, 2000, 3000]


def test_mp4_not_bmff_is_typed():
    from propagon_spark.functions.multimodal import parse_mp4_meta

    with pytest.raises(NotImplementedError, match="ftyp"):
        parse_mp4_meta(b"\x00\x00\x00\x08free")


def test_probe_media_mixed(spark):
    from propagon_spark.functions.multimodal import probe_media

    mp4 = mp4_bytes([b"aa", b"bbb"], deltas_ms=[500, 500])
    png_img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    rows = [
        (0, "video", bytearray(mp4)),
        (1, "audio", bytearray(wav_bytes(np.arange(8000)))),
        (2, "image", bytearray(encode_ppm(png_img))),
        (3, "video", bytearray(b"garbage-payload-here")),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r.asDict() for r in probe_media(df).collect()}
    assert got[0]["container"] == "mp4/isom"
    assert got[0]["codec"] == "avc1"
    assert (got[0]["width"], got[0]["height"]) == (320, 240)
    assert got[0]["duration_ms"] == 1000
    assert got[0]["n_samples"] == 2
    assert got[1]["container"] == "wav"
    assert got[1]["duration_ms"] == 1000
    assert got[2]["container"] == "pnm"
    assert (got[2]["width"], got[2]["height"]) == (2, 2)
    assert got[3]["container"] is None
    assert "unrecognized container" in got[3]["probe_error"]


def test_frame_sample_real_mp4_cadence(spark):
    # 10 samples 300ms apart; cadence 1000ms → ticks at 0/1000/2000 ms
    # land on samples 0, 4 (1200ms), 7 (2100ms), then tick 3000 on no
    # sample (last is 2700ms)
    frames = [b"f%02d" % i for i in range(10)]
    mp4 = mp4_bytes(frames, deltas_ms=[300] * 10)
    df = spark.createDataFrame(
        [(7, "video", bytearray(mp4), 3000)],
        "asset_id long, media_type string, payload binary, duration_ms long",
    )
    out = frame_sample(df, every_ms=1000).collect()
    assert [(r["frame_idx"], bytes(r["frame_payload"])) for r in out] == [
        (0, b"f00"),
        (1, b"f04"),
        (2, b"f07"),
    ]


def test_probe_handles_leading_free_box_and_audio_only():
    from propagon_spark.functions.multimodal import parse_mp4_meta, _probe_one

    mp4 = mp4_bytes([b"aa", b"bb"])
    led = _box(b"free", b"\x00" * 16) + mp4  # spec-legal leading free box
    assert _probe_one(led)["container"] == "mp4/isom"
    assert parse_mp4_meta(led)["duration_ms"] == 2000


def test_frame_sample_skips_unmappable_bmff(spark):
    # an ftyp-only payload (no moov) must emit ZERO frames, not fail the
    # scan; the good asset in the same batch still samples
    bad = _box(b"ftyp", b"isom" + bytes(4) + b"isom")
    good = mp4_bytes([b"x", b"yy"], deltas_ms=[500, 500])
    df = spark.createDataFrame(
        [(1, "video", bytearray(bad), 0), (2, "video", bytearray(good), 1000)],
        "asset_id long, media_type string, payload binary, duration_ms long",
    )
    out = frame_sample(df, every_ms=400).collect()
    assert {r["asset_id"] for r in out} == {2}


def test_jpeg_probe_fill_bytes_and_truncation():
    from propagon_spark.functions.multimodal import _probe_one

    # legal fill padding FF FF before the SOF marker
    sof = (
        b"\xff\xd8" + b"\xff\xff"  # SOI + fill byte
        + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + (24).to_bytes(2, "big") + (42).to_bytes(2, "big") + b"\x01\x00\x00\x00"
    )
    got = _probe_one(sof)
    assert (got["width"], got["height"]) == (42, 24)
    # truncated right after the SOF marker: no bogus dimensions
    trunc = b"\xff\xd8" + b"\xff\xc0" + b"\x00"
    got2 = _probe_one(trunc)
    assert got2["width"] is None and got2["height"] is None
    # EOI before any SOF: clean None, no segment-length misread
    eoi = b"\xff\xd8" + b"\xff\xd9"
    assert _probe_one(eoi)["width"] is None
