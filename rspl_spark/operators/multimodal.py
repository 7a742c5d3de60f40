"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (north star: multimodal support at 100 TB):
- payload = ``binary`` column (parquet stores it page-compressed; Spark
  never interprets it JVM-side),
- metadata = typed struct column (prunable: metadata-only queries never
  read payload bytes — column pruning is the whole point of splitting),
- decode / feature-extract / frame-sample run as Arrow-batched pandas
  iterators (``mapInPandas``): one Python worker per partition, zero-copy
  Arrow transfer, batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Heavy codecs (PIL/librosa/ffmpeg) are NOT in this container — the decode
kernel is injectable; ``fake_image_decode`` is the deterministic
stand-in used by tests, ``decode_stub`` raises NotImplementedError with
the integration contract. FOUR real codecs ship here regardless, each
exercised end-to-end by its own hash-gated query:
- :func:`decode_pgm` — netpbm graymap (binary P5 / ASCII P2, header
  comments, 8- and 16-bit rasters),
- :func:`decode_wav` — RIFF/WAVE PCM chunk walker,
- :func:`decode_bmp` — 24-bit BI_RGB with bottom-up/BGR normalization,
- :func:`decode_png` / :func:`encode_png` — 8-bit gray/RGB PNG via the
  stdlib zlib inflate, all five scanline filters, CRC-checked (the one
  compressed image format that is NOT env-blocked: DEFLATE ships in
  the stdlib, JPEG's DCT stack does not).
The Spark-side plumbing (schemas, batching, partition behavior) is real
and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feat_dim", IntegerType()),
        StructField("feature", StringType()),  # hex digest of the feature block
        StructField("n_bytes", LongType()),
    ]
)


def decode_stub(payload: bytes, kind: str):
    """Integration point for real codecs (PIL / librosa / pyav).

    Not available in this environment — wire your codec here; it receives
    the raw payload bytes of one media row and must return an
    ndarray-like. Everything around it (Arrow batching, schema,
    partitioning) is already in place.
    """
    raise NotImplementedError(
        "media codecs are not installed in this container; inject a decoder "
        "via extract_features(decode=...)"
    )


def decode_pgm(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy PGM decoder — a REAL codec with zero dependencies.

    Handles the full netpbm graymap spec: binary ``P5`` and ASCII ``P2``,
    ``#`` comments anywhere in the header, arbitrary header whitespace,
    and 16-bit rasters (maxval > 255, big-endian per spec). Returns
    ``(pixels, maxval)`` with pixels shaped (height, width), dtype uint8
    or uint16.

    This is the injectable-decoder contract made concrete: plug it into
    :func:`extract_features` via :func:`pgm_decode_bytes`, or use
    :func:`pgm_features` for a typed feature record.
    """
    if payload[:2] not in (b"P5", b"P2"):
        raise ValueError("not a PGM payload (want P5 or P2 magic)")
    ascii_fmt = payload[:2] == b"P2"
    i, tokens = 2, []
    while len(tokens) < 3:
        while i < len(payload):
            c = payload[i]
            if c == 0x23:  # '#': comment to end of line
                while i < len(payload) and payload[i] not in (0x0A, 0x0D):
                    i += 1
            elif chr(c).isspace():
                i += 1
            else:
                break
        j = i
        while j < len(payload) and not chr(payload[j]).isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PGM header")
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"invalid PGM dims/maxval: {w}x{h} max {maxval}")
    if ascii_fmt:
        vals = np.array(payload[i:].split()[: w * h], dtype=np.int64)
        if len(vals) < w * h:
            raise ValueError("truncated P2 raster")
        return vals.astype(np.uint16 if maxval > 255 else np.uint8).reshape(h, w), maxval
    i += 1  # exactly ONE whitespace byte separates maxval from the raster
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    need = w * h * dtype.itemsize
    raster = payload[i : i + need]
    if len(raster) < need:
        raise ValueError("truncated P5 raster")
    return np.frombuffer(raster, dtype=dtype).reshape(h, w), maxval


def pgm_decode_bytes(payload: bytes, kind: str) -> bytes:
    """Adapter matching the ``extract_features(decode=...)`` signature:
    decoded pixel block as native-order bytes."""
    arr, _ = decode_pgm(payload)
    return np.ascontiguousarray(arr).tobytes()


PGM_FEATURE_SCHEMA = (
    "media_id long, width int, height int, maxval int, "
    "n_pixels long, mean_gray double, pixel_md5 string"
)


def pgm_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode each PGM payload (REAL parse — dims come from the header,
    not metadata) and emit a typed feature record: dimensions, pixel
    count, mean gray level, md5 of the raw raster. mapInPandas, narrow,
    payload column read only here (metadata queries stay pruned)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "maxval": [],
                "n_pixels": [],
                "mean_gray": [],
                "pixel_md5": [],
            }
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                arr, maxval = decode_pgm(bytes(payload))
                out["media_id"].append(mid)
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["maxval"].append(maxval)
                out["n_pixels"].append(arr.size)
                out["mean_gray"].append(float(arr.mean()))
                out["pixel_md5"].append(
                    hashlib.md5(np.ascontiguousarray(arr).tobytes()).hexdigest()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=PGM_FEATURE_SCHEMA)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Pure-numpy RIFF/WAVE decoder — the REAL audio codec, zero deps.

    Walks the RIFF chunk list (tolerating extra chunks like ``LIST`` or
    ``fact`` and the spec's odd-size pad byte), parses ``fmt `` (PCM
    only, 8- or 16-bit), and returns ``(samples, sample_rate, bits)``
    with samples shaped (n_frames, n_channels): dtype uint8 for 8-bit
    (unsigned per spec) and int16 little-endian for 16-bit.

    Counterpart of :func:`decode_pgm` for the audio modality; unit tests
    cross-check it against the stdlib ``wave`` module on the same bytes.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_format = int.from_bytes(body[0:2], "little")
            if audio_format != 1:
                raise ValueError(f"only PCM supported (format {audio_format})")
            fmt = (
                int.from_bytes(body[2:4], "little"),  # n_channels
                int.from_bytes(body[4:8], "little"),  # sample_rate
                int.from_bytes(body[14:16], "little"),  # bits per sample
            )
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated data chunk")
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned: odd sizes pad
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n_channels, sample_rate, bits = fmt
    if n_channels < 1:
        raise ValueError("invalid channel count")
    if sample_rate < 1:
        # fail at DECODE like every other malformed field — unvalidated,
        # a zero rate surfaced later as a ZeroDivisionError inside
        # wav_features' duration computation, killing the task
        raise ValueError(f"invalid sample rate {sample_rate}")
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        arr = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    else:
        raise ValueError(f"only 8/16-bit PCM supported (got {bits})")
    n_frames = len(arr) // n_channels
    return arr[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate, bits


WAV_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, bits int, "
    "n_samples long, duration_ms double, mean_amp double, sample_md5 string"
)


def wav_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode each WAV payload (REAL parse — rate/width/frames come from
    the RIFF header, not metadata) and emit a typed audio feature record:
    format fields, frame count, duration, mean amplitude, md5 of the raw
    sample bytes. mapInPandas, narrow; payload read only here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "bits",
                "n_samples", "duration_ms", "mean_amp", "sample_md5",
            )}
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                arr, rate, bits = decode_wav(bytes(payload))
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(arr.shape[1])
                rows["bits"].append(bits)
                rows["n_samples"].append(arr.shape[0])
                rows["duration_ms"].append(arr.shape[0] * 1000.0 / rate)
                rows["mean_amp"].append(float(arr.mean()) if arr.size else None)
                rows["sample_md5"].append(
                    hashlib.md5(np.ascontiguousarray(arr).tobytes()).hexdigest()
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=WAV_FEATURE_SCHEMA)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy BMP decoder — REAL codec #3, zero deps.

    Parses BITMAPFILEHEADER + BITMAPINFOHEADER, supports uncompressed
    (BI_RGB) 24-bit images, 4-byte row padding, bottom-up (positive
    height, the common case) and top-down (negative height) rasters.
    Returns pixels shaped (height, width, 3) in RGB order, top-down,
    dtype uint8 — i.e. the file's BGR byte order and row direction are
    normalized away, which is what the unit tests pin pixel-by-pixel.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise ValueError(f"only BI_RGB (uncompressed) supported, got {compression}")
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    if width <= 0 or height == 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    top_down = height < 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    need = stride * h
    raster = payload[data_offset : data_offset + need]
    if len(raster) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, : width * 3]
    img = rows.reshape(h, width, 3)
    if not top_down:
        img = img[::-1]  # bottom-up file order → top-down
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR → RGB


BMP_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_pixels long, "
    "mean_r double, mean_g double, mean_b double, pixel_md5 string"
)


def bmp_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode each BMP payload (REAL parse — dims from the DIB header,
    BGR/bottom-up normalization applied) and emit per-channel means plus
    md5 of the normalized RGB block. mapInPandas, narrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "pixel_md5",
            )}
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                out["media_id"].append(mid)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["n_pixels"].append(img.shape[0] * img.shape[1])
                out["mean_r"].append(float(img[:, :, 0].mean()))
                out["mean_g"].append(float(img[:, :, 1].mean()))
                out["mean_b"].append(float(img[:, :, 2].mean()))
                out["pixel_md5"].append(hashlib.md5(img.tobytes()).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=BMP_FEATURE_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray, row_filters: tuple[int, ...] = (0,)) -> bytes:
    """Pure-numpy/zlib PNG encoder — the write half of REAL codec #4.

    8-bit grayscale (ndim == 2) or RGB (h, w, 3), non-interlaced.
    ``row_filters`` cycles per scanline over PNG filter types 0..4
    (None/Sub/Up/Average/Paeth) — passing all five makes the companion
    decoder's unfilter math load-bearing, which is exactly what the
    ``q_multimodal_decode_png`` gate does. Filters are computed from
    RAW (unfiltered) neighbor bytes per the spec, vectorized per row.
    """
    import struct
    import zlib

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, ch = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype, ch = 2, 3
        h, w = arr.shape[:2]
    else:
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB uint8")
    flat = arr.reshape(h, w * ch).astype(np.int32)
    zeros = np.zeros(ch, dtype=np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    lines = []
    for y in range(h):
        f = row_filters[y % len(row_filters)]
        cur = flat[y]
        left = np.concatenate([zeros, cur[:-ch]]) if w * ch > ch else np.zeros_like(cur)
        upleft = np.concatenate([zeros, prev[:-ch]]) if w * ch > ch else np.zeros_like(cur)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-numpy/zlib PNG decoder — REAL codec #4, zero deps beyond
    the stdlib inflate (PNG was the reference's one non-env-blocked
    image format: DEFLATE ships in ``zlib``, unlike JPEG's DCT stack).

    Supports the mainline still-image subset: 8-bit depth, grayscale
    (color type 0) and truecolor RGB (color type 2), non-interlaced,
    all five scanline filters (None/Sub/Up/Average/Paeth), multiple
    IDAT chunks, per-chunk CRC32 verification. Returns (h, w) uint8
    for gray, (h, w, 3) uint8 for RGB.

    Sub rows un-filter as a per-channel-lane prefix sum mod 256
    (vectorized); Average/Paeth are inherently sequential in x and run
    a per-byte loop — row-bounded, fine for the batch sizes the
    mapInPandas kernel feeds."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {depth}")
    if ctype not in (0, 2):
        raise ValueError(f"only gray (0) / RGB (2) color types supported, got {ctype}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace method")
    ch = 1 if ctype == 0 else 3
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(arr[y, 0])
        row = arr[y, 1:].astype(np.int32)
        if f == 0:
            cur = row & 0xFF
        elif f == 1:
            # per-lane prefix sum mod 256: out[x] = row[x] + out[x - ch]
            lanes = row.reshape(w, ch)
            cur = (np.cumsum(lanes.astype(np.uint64), axis=0) & 0xFF).reshape(stride)
            cur = cur.astype(np.int32)
        elif f == 2:
            cur = (row + prev) & 0xFF
        elif f == 3:
            cur = row.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            cur = row.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, 3)


PNG_FEATURE_SCHEMA = (
    "media_id long, width int, height int, channels int, n_pixels long, "
    "mean_r double, mean_g double, mean_b double, pixel_md5 string"
)


def png_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode each PNG payload (REAL inflate + unfilter) and emit
    per-channel means plus md5 of the decoded pixel block (gray images
    report their single mean in all three channels). mapInPandas,
    narrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "channels", "n_pixels",
                "mean_r", "mean_g", "mean_b", "pixel_md5",
            )}
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                img = decode_png(bytes(payload))
                gray = img.ndim == 2
                out["media_id"].append(mid)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["channels"].append(1 if gray else 3)
                out["n_pixels"].append(img.shape[0] * img.shape[1])
                if gray:
                    m = float(img.mean())
                    out["mean_r"].append(m)
                    out["mean_g"].append(m)
                    out["mean_b"].append(m)
                else:
                    out["mean_r"].append(float(img[:, :, 0].mean()))
                    out["mean_g"].append(float(img[:, :, 1].mean()))
                    out["mean_b"].append(float(img[:, :, 2].mean()))
                out["pixel_md5"].append(hashlib.md5(img.tobytes()).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=PNG_FEATURE_SCHEMA)


def fake_image_decode(payload: bytes, kind: str) -> bytes:
    """Deterministic stand-in decoder: a 'pixel block' derived from the
    payload by iterated hashing — stable across runs/machines.

    The chain runs over lowercase-hex STRINGS (seed = payload.hex()) so
    an independent SQL engine can recompute it exactly — DuckDB's
    sha256() is VARCHAR-only, and this lets q_multimodal_features be a
    hash-checked gate query instead of rows-only."""
    block = (payload or b"\x00").hex()
    out = []
    for i in range(4):
        block = hashlib.sha256((str(i) + block).encode()).hexdigest()
        out.append(block)
    return "".join(out).encode()


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes, str], bytes] = decode_stub,
) -> DataFrame:
    """Decode each media row and emit a fixed-dim feature record.

    ``mapInPandas``: the decoder runs per Arrow batch inside the executor
    Python worker; partitioning of the input is preserved (narrow op — at
    scale, repartition upstream by size, not here).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode(p if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": [len(d) for d in decoded],
                    "feature": [hashlib.md5(d).hexdigest() for d in decoded],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def fake_resize(payload: bytes, kind: str, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image/video resize kernel: the
    'resized pixels' are sha256 of (target-dims, payload-hex). Same
    hex-string-chain trick as fake_image_decode so DuckDB can replay it
    and the gate query is hash-checked, not rows-only."""
    seed = (payload or b"\x00").hex()
    return hashlib.sha256(f"{width}x{height}:{seed}".encode()).hexdigest().encode()


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    kernel: Callable[[bytes, str, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize every image/video payload to (width, height); audio rows
    pass through untouched.

    Binary→binary transformation that PRESERVES the media schema (meta
    width/height updated, payload replaced) so resize stages compose
    with extract_features / frame-sampling downstream. Narrow op: the
    kernel runs per Arrow batch in the executor Python worker; no
    shuffle, partitioning preserved. With real codecs, inject
    ``kernel=lambda p, k, w, h: PIL_resize(p, (w, h))``.
    """
    if kernel is None:
        kernel = _resize_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = pdf.to_dict("records")
            for r in rows:
                if r["kind"] in ("image", "video"):
                    r["payload"] = kernel(r["payload"], r["kind"], width, height)
                    meta = dict(r["meta"]) if r["meta"] is not None else {}
                    meta["width"] = width
                    meta["height"] = height
                    r["meta"] = meta
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def _resize_stub(payload: bytes, kind: str, width: int, height: int) -> bytes:
    raise NotImplementedError(
        "media codecs are not installed in this container; inject a resize "
        "kernel via resize_media(kernel=...)"
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explode frame indices 0, n, 2n, …
    (metadata-driven — touches only ``meta.n_frames``, never payload;
    the downstream decode of selected frames goes through
    extract_features). Demonstrates payload/metadata pruning."""
    # zero-frame or unknown-length videos plan NOTHING: greatest's
    # NULL-skipping made both cases yield [0] — a phantom frame index
    # telling downstream decode to fetch a frame that does not exist
    return (
        media.filter(
            (F.col("kind") == "video") & (F.col("meta.n_frames") >= 1)
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.n_frames") - 1,
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — must not read payload (column pruning)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("meta.width")).alias("avg_width"),
            F.avg(F.col("meta.n_frames")).alias("avg_frames"),
        )
        .orderBy("kind")
    )
