"""Corpus curation: the end-to-end training-data pipeline composition.

extracted turns -> exact dedup (content-hash keep-first) -> quality gates
(length / punctuation / stopword heuristics) -> optional language filter.
Everything after extraction is JVM-side Spark SQL (no Python), so the whole
curation tail runs in whole-stage codegen.

Scale notes: dedup shuffles 16-byte digests (not documents); the window
keep-first beats a self-join; quality expressions fuse into the same stage.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    text = F.col(text_col)
    n_chars = F.length(text)
    words = F.filter(F.split(F.lower(text), "[^a-z0-9']+"), lambda w: w != "")
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(text, "[.,!?;:]", ""))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("punct_ratio",
                    F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("stop_ratio",
                    F.round(n_stop / F.greatest(n_words, F.lit(1)), 6))
    )


def dedup_keep_first(df: DataFrame, text_col: str = "text",
                     order_cols: list[str] | None = None) -> DataFrame:
    """Exact dedup: one survivor per content hash, deterministic winner."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(*order_cols)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def curate(extracted: DataFrame, min_words: int = 5,
           max_punct_ratio: float = 0.3,
           min_chars: int = 20) -> DataFrame:
    """Full curation tail over an extracted frame (status ok rows —
    including 'ok:truncated-forms', whose text is valid but truncated
    at the interpreter's form-nesting cap)."""
    ok = extracted.filter(F.col("status").startswith("ok"))
    deduped = dedup_keep_first(ok)
    feat = with_quality_features(deduped)
    return feat.filter(
        (F.col("n_words") >= min_words)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("n_chars") >= min_chars)
    )
