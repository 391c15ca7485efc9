"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are opaque ``binary`` columns; the real codec
libraries are not in this container, so the decode step is a clearly
marked deterministic fake (``_fake_decode``) — the Spark-side plumbing
(schema, Arrow batching, mapInPandas signature, partitioning) is real and
tested, and swapping the fake for PIL/ffmpeg is a one-function change.
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

    Real deployment replaces this with PIL.Image.open / soundfile /
    pyav frame sampling (NotImplemented here — libs absent). Shapes are
    derived from a content digest so results are stable and testable.
    """
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


_FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("frames", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode + feature-extract one Arrow batch.

    The feature vector is a deterministic byte-histogram projection
    (stands in for a CNN/audio embedding); numpy-vectorized per batch."""
    for pdf in batches:
        metas = [_fake_decode(p, k) for (p, k) in zip(pdf["payload"], pdf["kind"])]
        feats = []
        for p in pdf["payload"]:
            arr = np.frombuffer(bytes(p), dtype=np.uint8)
            if arr.size == 0:
                feats.append([0.0] * _FEATURE_DIM)
                continue
            hist = np.bincount(arr % _FEATURE_DIM, minlength=_FEATURE_DIM)
            feats.append((hist / arr.size).round(6).astype(np.float32).tolist())
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "kind": pdf["kind"],
            "width": pd.Series([m["width"] for m in metas], dtype="int32"),
            "height": pd.Series([m["height"] for m in metas], dtype="int32"),
            "frames": pd.Series([m["frames"] for m in metas], dtype="int32"),
            "feature": feats,
        })


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> feature-extract over Arrow batches (the real plumbing;
    fake decode). Repartitioned by doc_id so payload bytes shuffle once."""
    m = media_table(spark, sf_dir).repartition("doc_id")
    return m.mapInPandas(_feature_batches, schema=FEATURES_SCHEMA)


ORACLES: dict[str, str] = {
    "media_metadata": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               OCTET_LENGTH(ENCODE(text)) AS n_bytes,
               SHA256(text) AS digest
        FROM documents
    """,
}

QUERIES = {
    "media_metadata": media_metadata,
    "media_features": media_features,  # rows-only: stubbed decode
}
