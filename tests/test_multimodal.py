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
    # JPEG still needs PIL — sniffed and rejected with the magic named
    with pytest.raises(NotImplementedError, match="magic"):
        decode_image(b"\xff\xd8\xff\xe0....")


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


def test_video_without_codec_is_typed_error(spark):
    assets = synth_assets(spark, n=3).where("media_type = 'video'")
    with pytest.raises(Exception, match="codec"):
        frame_sample(assets, fake=False).collect()


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
