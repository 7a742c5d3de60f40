"""Multimodal plumbing tests: schema, Arrow batching, payload/metadata
pruning. Codecs are stubbed (deterministic fake) — the Spark-side
machinery is what's under test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rspl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_stub,
    extract_features,
    fake_image_decode,
    frame_sample_plan,
    media_stats,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([i % 256]) * (100 + i)
        meta = (64 + i, 48 + i, 16000 if kind == "audio" else None, 90 if kind == "video" else None, kind[:3])
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_schema_roundtrip(spark, media, tmp_path):
    """binary + struct metadata survive a parquet roundtrip intact."""
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.schema == MEDIA_SCHEMA
    orig = {r["media_id"]: r["payload"] for r in media.collect()}
    got = {r["media_id"]: r["payload"] for r in back.collect()}
    assert got == orig


def test_extract_features_deterministic(spark, media):
    feats = extract_features(media, decode=fake_image_decode)
    rows1 = {r["media_id"]: (r["feature"], r["feat_dim"]) for r in feats.collect()}
    rows2 = {r["media_id"]: (r["feature"], r["feat_dim"]) for r in feats.collect()}
    assert rows1 == rows2
    assert len(rows1) == 30
    assert all(dim == 256 for _, dim in rows1.values())  # 4 hex sha256 blocks
    # features must depend on payload: all distinct payloads → distinct feats
    assert len({f for f, _ in rows1.values()}) == 30


def test_extract_features_preserves_partitioning(spark, media):
    """mapInPandas is narrow: input partitioning is preserved (no shuffle
    before the decode at scale)."""
    m4 = media.repartition(4)
    feats = extract_features(m4, decode=fake_image_decode)
    assert feats.rdd.getNumPartitions() == 4
    plan = feats._jdf.queryExecution().executedPlan().toString()
    # every Exchange in the (AQE-duplicated) plan text is the explicit
    # round-robin repartition — mapInPandas itself adds no shuffle
    assert plan.count("Exchange") == plan.count("Exchange RoundRobinPartitioning")


def test_decode_stub_contract(spark, media):
    with pytest.raises(Exception) as ei:
        extract_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)


def test_frame_sampling_metadata_only(spark, media, tmp_path):
    p = str(tmp_path / "media_fs.parquet")
    media.write.parquet(p)
    frames = frame_sample_plan(spark.read.parquet(p), every_n=30)
    got = frames.groupBy("media_id").count().collect()
    # videos have n_frames=90 → indices 0,30,60 = 3 samples each
    assert all(r["count"] == 3 for r in got)
    assert len(got) == 10
    # pruning: the parquet scan must not read payload bytes
    plan = frames._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1]
    assert "payload" not in read_schema


def test_media_stats_prunes_payload(spark, media, tmp_path):
    p = str(tmp_path / "media2.parquet")
    media.write.parquet(p)
    stats = media_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1]
    assert "payload" not in read_schema
    rows = {r["kind"]: r["n"] for r in stats.collect()}
    assert rows == {"image": 10, "audio": 10, "video": 10}

def test_resize_composes_with_features(spark, media):
    """resize is schema-preserving: meta dims updated, audio untouched,
    and the output feeds extract_features unchanged."""
    from rspl_spark.operators.multimodal import fake_resize, resize_media

    resized = resize_media(media, 32, 24, kernel=fake_resize)
    assert resized.schema == MEDIA_SCHEMA
    rows = {r["media_id"]: r for r in resized.collect()}
    orig = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        if r["kind"] in ("image", "video"):
            assert (r["meta"]["width"], r["meta"]["height"]) == (32, 24)
            assert r["payload"] != orig[mid]["payload"]
            assert len(r["payload"]) == 64  # sha256 hex digest bytes
        else:
            assert r["payload"] == orig[mid]["payload"]
            assert r["meta"]["width"] == orig[mid]["meta"]["width"]
    # composes: features over resized media still one narrow pipeline
    feats = extract_features(resized, decode=fake_image_decode)
    assert feats.count() == 30


def test_resize_stub_contract(spark, media):
    from rspl_spark.operators.multimodal import resize_media

    with pytest.raises(Exception) as ei:
        resize_media(media, 8, 8).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)


# ---------------------------------------------------------------------------
# Real codec: pure-numpy PGM decode (decode_pgm / pgm_features).
# ---------------------------------------------------------------------------


def _p5(w, h, maxval, raster: bytes, comment: bool = False) -> bytes:
    head = b"P5\n"
    if comment:
        head += b"# a comment line\n"
    head += f"{w} {h}\n{maxval}\n".encode()
    return head + raster


def test_decode_pgm_p5_roundtrip():
    import numpy as np

    from rspl_spark.operators.multimodal import decode_pgm

    raster = bytes(range(12))  # 4x3 gradient
    arr, maxval = decode_pgm(_p5(4, 3, 255, raster))
    assert maxval == 255
    assert arr.shape == (3, 4) and arr.dtype == np.uint8
    assert arr.tobytes() == raster
    assert float(arr.mean()) == 5.5


def test_decode_pgm_header_comment_and_whitespace():
    from rspl_spark.operators.multimodal import decode_pgm

    raster = bytes(range(6))
    arr, _ = decode_pgm(_p5(3, 2, 255, raster, comment=True))
    assert arr.shape == (2, 3) and arr.tobytes() == raster
    # arbitrary whitespace between header tokens
    arr2, _ = decode_pgm(b"P5  3\t2\r\n255\n" + raster)
    assert arr2.tobytes() == raster


def test_decode_pgm_p2_ascii():
    import numpy as np

    from rspl_spark.operators.multimodal import decode_pgm

    arr, maxval = decode_pgm(b"P2\n# c\n3 2\n9\n0 1 2\n3 4 5\n")
    assert maxval == 9
    assert arr.tolist() == [[0, 1, 2], [3, 4, 5]]
    assert arr.dtype == np.uint8


def test_decode_pgm_16bit_big_endian():
    import numpy as np

    from rspl_spark.operators.multimodal import decode_pgm

    vals = np.array([[300, 70], [1, 65535]], dtype=">u2")
    arr, maxval = decode_pgm(b"P5\n2 2\n65535\n" + vals.tobytes())
    assert maxval == 65535
    assert arr.tolist() == [[300, 70], [1, 65535]]


def test_decode_pgm_rejects_bad_input():
    import pytest as _pytest

    from rspl_spark.operators.multimodal import decode_pgm

    with _pytest.raises(ValueError):
        decode_pgm(b"P6\n1 1\n255\nx")  # PPM, not PGM
    with _pytest.raises(ValueError):
        decode_pgm(_p5(4, 3, 255, b"short"))  # truncated raster
    with _pytest.raises(ValueError):
        decode_pgm(b"P5\n0 3\n255\n")  # zero width


def test_pgm_features_and_injectable_kernel(spark):
    """The real decoder drives both the typed feature op and the generic
    extract_features injection point."""
    from rspl_spark.operators.multimodal import (
        extract_features,
        pgm_decode_bytes,
        pgm_features,
    )

    raster = bytes(range(20))
    rows = [(1, _p5(5, 4, 255, raster)), (2, _p5(2, 2, 255, bytes([9, 9, 9, 9])))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in pgm_features(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_pixels"]) == (5, 4, 20)
    assert got[1]["mean_gray"] == 9.5
    assert got[2]["mean_gray"] == 9.0
    import hashlib

    assert got[1]["pixel_md5"] == hashlib.md5(raster).hexdigest()
    # generic injection path: decoded bytes = the raster
    media_k = media.withColumn("kind", F.lit("image"))
    feats = {
        r["media_id"]: r
        for r in extract_features(media_k, decode=pgm_decode_bytes).collect()
    }
    assert feats[1]["feature"] == hashlib.md5(raster).hexdigest()
    assert feats[1]["feat_dim"] == 20


# Real codec #2: pure-numpy RIFF/WAVE decode (decode_wav / wav_features).
# Cross-checked against the stdlib `wave` module — an INDEPENDENT
# implementation of the same spec — on the exact same bytes.


def _wav_bytes(rate, sampwidth, channels, frames: bytes) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_8bit_mono_matches_stdlib():
    import io
    import wave

    import numpy as np

    from rspl_spark.operators.multimodal import decode_wav

    frames = bytes(range(200))
    payload = _wav_bytes(8000, 1, 1, frames)
    arr, rate, bits = decode_wav(payload)
    assert (rate, bits, arr.shape) == (8000, 8, (200, 1))
    assert arr.dtype == np.uint8
    with wave.open(io.BytesIO(payload)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (8000, 1, 200)
        assert arr.tobytes() == w.readframes(200)


def test_decode_wav_16bit_stereo_matches_stdlib():
    import io
    import wave

    import numpy as np

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=(50, 2), dtype=np.int16)
    payload = _wav_bytes(44100, 2, 2, samples.astype("<i2").tobytes())

    from rspl_spark.operators.multimodal import decode_wav

    arr, rate, bits = decode_wav(payload)
    assert (rate, bits, arr.shape) == (44100, 16, (50, 2))
    assert (arr == samples).all()
    with wave.open(io.BytesIO(payload)) as w:
        assert arr.astype("<i2").tobytes() == w.readframes(50)


def test_decode_wav_skips_extra_chunks_and_odd_padding():
    from rspl_spark.operators.multimodal import decode_wav

    frames = bytes([1, 2, 3, 4, 5])
    base = _wav_bytes(16000, 1, 1, frames)
    # splice an odd-sized LIST chunk (3 bytes + 1 pad) between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    spliced = bytearray(base[:fmt_end] + extra + base[fmt_end:])
    # keep the outer RIFF size honest (stdlib wave trusts it)
    riff_size = int.from_bytes(spliced[4:8], "little") + len(extra)
    spliced[4:8] = riff_size.to_bytes(4, "little")
    spliced = bytes(spliced)
    arr, rate, bits = decode_wav(spliced)
    assert (rate, bits) == (16000, 8)
    assert arr.ravel().tolist() == [1, 2, 3, 4, 5]
    # stdlib wave also tolerates the extra chunk — agreement check
    import io
    import wave

    with wave.open(io.BytesIO(spliced)) as w:
        assert w.getnframes() == 5


def test_decode_wav_rejects_bad_input():
    import pytest

    from rspl_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"RIFX....WAVE")  # bad magic
    with pytest.raises(ValueError):
        decode_wav(_wav_bytes(8000, 1, 1, b"\x01")[:20])  # truncated, no data chunk
    # non-PCM format tag
    bad = bytearray(_wav_bytes(8000, 1, 1, b"\x01\x02"))
    bad[20] = 3  # IEEE float tag
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_wav_features_end_to_end(spark):
    import hashlib

    from rspl_spark.operators.multimodal import wav_features

    frames = bytes([10, 20, 30, 40])
    rows = [(1, _wav_bytes(8000, 1, 1, frames))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = wav_features(media).collect()[0]
    assert (got["sample_rate"], got["n_channels"], got["bits"]) == (8000, 1, 8)
    assert (got["n_samples"], got["mean_amp"]) == (4, 25.0)
    assert got["duration_ms"] == 0.5
    assert got["sample_md5"] == hashlib.md5(frames).hexdigest()


# Real codec #3: pure-numpy 24-bit BMP decode (decode_bmp / bmp_features).
# Pixel placement pinned by hand-built images: BGR byte order, bottom-up
# row order, and 4-byte row padding must all be normalized away.


def _bmp_bytes(width: int, height: int, rows_bgr: bytes, top_down: bool = False) -> bytes:
    """Build a 24-bit BI_RGB BMP. ``rows_bgr`` is the raster exactly as
    stored (file row order, BGR, WITH pad bytes)."""
    h_field = -height if top_down else height
    header = (
        b"BM"
        + (54 + len(rows_bgr)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + h_field.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows_bgr).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + rows_bgr


def test_decode_bmp_flips_rows_and_swaps_channels():
    import numpy as np

    from rspl_spark.operators.multimodal import decode_bmp

    # 2x2, no padding (2*3=6 bytes/row, padded to 8 → has padding!)
    # stride for w=2 is 8: 6 pixel bytes + 2 pad bytes per row
    bottom_row = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"  # blue px, green px
    top_row = bytes([0, 0, 255, 10, 20, 30]) + b"\x00\x00"  # red px, misc px
    # bottom-up storage: file lists the BOTTOM row first
    img = decode_bmp(_bmp_bytes(2, 2, bottom_row + top_row))
    assert img.shape == (2, 2, 3)
    # top-left of the IMAGE is the first pixel of the LAST stored row:
    # stored BGR (0,0,255) = red pixel at image top-left
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [30, 20, 10]  # BGR 10,20,30 → RGB 30,20,10
    assert img[1, 0].tolist() == [0, 0, 255]  # blue at bottom-left
    assert img[1, 1].tolist() == [0, 255, 0]  # green at bottom-right
    # top-down variant: rows arrive in image order already
    img_td = decode_bmp(_bmp_bytes(2, 2, top_row + bottom_row, top_down=True))
    assert (img_td == img).all()


def test_decode_bmp_row_padding():
    from rspl_spark.operators.multimodal import decode_bmp

    # w=3 → 9 pixel bytes, stride 12 → 3 pad bytes that must be dropped
    row = bytes(range(9)) + b"\xEE\xEE\xEE"
    img = decode_bmp(_bmp_bytes(3, 1, row))
    assert img.shape == (1, 3, 3)
    assert 0xEE not in img
    assert img[0, 0].tolist() == [2, 1, 0]


def test_decode_bmp_rejects_bad_input():
    import pytest

    from rspl_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"PNG....")
    good = _bmp_bytes(1, 1, bytes([1, 2, 3]) + b"\x00")
    bad_bpp = bytearray(good)
    bad_bpp[28] = 8  # 8-bit palette image
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))
    bad_comp = bytearray(good)
    bad_comp[30] = 1  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_comp))
    with pytest.raises(ValueError):
        decode_bmp(good[:-2])  # truncated raster


def test_bmp_features_end_to_end(spark):
    import hashlib

    import numpy as np

    from rspl_spark.operators.multimodal import bmp_features, decode_bmp

    raster = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00" + bytes([0, 0, 255, 10, 20, 30]) + b"\x00\x00"
    payload = _bmp_bytes(2, 2, raster)
    media = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    got = bmp_features(media).collect()[0]
    img = decode_bmp(payload)
    assert (got["width"], got["height"], got["n_pixels"]) == (2, 2, 4)
    assert got["mean_r"] == float(img[:, :, 0].mean())
    assert got["pixel_md5"] == hashlib.md5(img.tobytes()).hexdigest()


# --- PNG codec (REAL codec #4: stdlib zlib inflate + numpy unfilter) -------


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def test_decode_png_golden_hand_built():
    """Golden vector: a 3x2 grayscale PNG assembled byte-by-byte (no
    encoder involved) with one None-filtered and one Up-filtered row —
    the decoder must reproduce the exact pixel matrix."""
    import struct
    import zlib

    import numpy as np

    from rspl_spark.operators.multimodal import decode_png

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    # row 0: filter 0 (None), raw 10 20 30
    # row 1: filter 2 (Up), deltas 5 5 5 -> raw 15 25 35
    raster = bytes([0, 10, 20, 30]) + bytes([2, 5, 5, 5])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raster))
        + _png_chunk(b"IEND", b"")
    )
    img = decode_png(payload)
    assert img.dtype == np.uint8 and img.shape == (2, 3)
    assert img.tolist() == [[10, 20, 30], [15, 25, 35]]


def test_decode_png_golden_paeth_rgb():
    """Golden vector: 2x2 RGB with a Sub row then a Paeth row, modular
    wraparound included (255 + 10 -> 9)."""
    import struct
    import zlib

    from rspl_spark.operators.multimodal import decode_png

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    # row 0, filter 1 (Sub): raw (250,0,100),(5,3,200) -> deltas
    #   first px literal, second px = raw - left = (11,3,100)
    row0 = bytes([1, 250, 0, 100, 11, 3, 100])
    # row 1, filter 4 (Paeth). For first px a=0,c=0 -> pred=b=up.
    #   want raw (9,1,101): delta = raw - up = (9-250)%256=15, (1-0)=1, (101-100)=1
    #   second px: a=(9,1,101), b=(5,3,200), c=(250,0,100)
    #     p = a+b-c per byte: (-236,4,201); pick nearest of a/b/c
    #     byte0: |p-a|=245,|p-b|=241,|p-c|=486 -> pred=b=5
    #     byte1: |4-1|=3,|4-3|=1,|4-0|=4 -> pred=b=3
    #     byte2: |201-101|=100,|201-200|=1,|201-100|=101 -> pred=b=200
    #   want raw (15,4,202): delta = (10,1,2)
    row1 = bytes([4, 15, 1, 1, 10, 1, 2])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(row0 + row1))
        + _png_chunk(b"IEND", b"")
    )
    img = decode_png(payload)
    assert img.shape == (2, 2, 3)
    assert img[0].tolist() == [[250, 0, 100], [5, 3, 200]]
    assert img[1].tolist() == [[9, 1, 101], [15, 4, 202]]


def test_png_roundtrip_every_filter():
    """encode->decode is the identity for every scanline filter type,
    gray and RGB, including values that exercise mod-256 wraparound."""
    import numpy as np

    from rspl_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(1234)
    gray = rng.integers(0, 256, size=(7, 5), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    for f in range(5):
        assert np.array_equal(decode_png(encode_png(gray, row_filters=(f,))), gray)
        assert np.array_equal(decode_png(encode_png(rgb, row_filters=(f,))), rgb)
    # cycling all five across rows (the gate's construction)
    assert np.array_equal(
        decode_png(encode_png(rgb, row_filters=(0, 1, 2, 3, 4))), rgb
    )
    # multiple IDAT chunks: split the encoder's single IDAT in two
    one = encode_png(gray)
    # degenerate sizes
    tiny = np.array([[7]], dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(tiny, row_filters=(4,))), tiny)
    assert decode_png(one).shape == (7, 5)


def test_decode_png_rejects_corruption_and_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest

    from rspl_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    # flip one IDAT byte -> CRC catches it
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth and interlace are out of scope and must say so
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    p16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", zlib.compress(bytes([0, 0, 0])))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(p16)


def test_decode_wav_rejects_zero_sample_rate():
    """Review fix: a fuzzed fmt chunk with sample_rate=0 must fail at
    decode (clean ValueError), not as ZeroDivisionError downstream."""
    import struct

    from rspl_spark.operators.multimodal import decode_wav

    data = b"\x00\x01" * 4
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)  # PCM, 1ch, rate=0
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(wav)


def test_frame_sample_plan_skips_zero_and_null_frame_counts(spark):
    """Review fix: zero-frame / unknown-length videos plan nothing
    (previously a phantom frame_idx 0 row)."""
    from rspl_spark.operators.multimodal import frame_sample_plan

    schema = (
        "media_id long, kind string,"
        " meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    rows = [
        (1, "video", (1, 1, 25, None)),
        (2, "video", (1, 1, 0, None)),
        (3, "video", (1, 1, None, None)),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        (r["media_id"], r["frame_idx"])
        for r in frame_sample_plan(df, every_n=10).collect()
    }
    assert got == {(1, 0), (1, 10), (1, 20)}
