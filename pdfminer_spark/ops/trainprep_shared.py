"""Shared deterministic transcript views used by more than one ops
module (kept separate to avoid an ops-module import cycle)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import _docs


def conv_turns_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extract_conversations turn view plus a closed-form event
    time: ts_us = turn_idx * (60 + conv_num % 10) seconds, with a +5 s
    stall injected at turn 3 (so latency stats have a real outlier)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    conv_num = (F.col("doc_id") % 50).cast("int")
    turn_idx = (F.col("doc_id") / 50).cast("int")
    ts_us = (turn_idx.cast("long")
             * (F.lit(60) + (conv_num % 10)).cast("long") * 1000000
             + F.when(turn_idx == 3, F.lit(5000000)).otherwise(F.lit(0)))
    return d.select(
        F.concat(F.lit("conv-"),
                 F.lpad(conv_num.cast("string"), 4, "0")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(turn_idx % 2 == 0, "user").otherwise("assistant")
         .alias("role"),
        ts_us.alias("ts_us"),
        "text")
