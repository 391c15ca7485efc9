"""Structured Streaming extraction: micro-batch ingest, exactly-once via
checkpoint, incremental pickup of new files."""
import os

from pyspark.sql import functions as F

from pdfminer_spark.spark.fixtures import build_transcripts
from pdfminer_spark.spark.streaming import extraction_query


def test_streaming_extraction_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = build_transcripts(spark, n_convs=4)
    n1 = df.count()
    df.write.mode("append").parquet(in_dir)

    q = extraction_query(spark, in_dir, out_dir, ckpt, page_numbers=[0],
                         available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    assert got.count() == n1
    assert got.filter(F.col("status") != "ok").count() == 0

    # second batch of files: only the new rows are processed
    df2 = build_transcripts(spark, n_convs=3, seed=7)
    n2 = df2.count()
    df2.write.mode("append").parquet(in_dir)
    q = extraction_query(spark, in_dir, out_dir, ckpt, page_numbers=[0],
                         available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    assert got.count() == n1 + n2
    dups = (got.groupBy("conv_id", "turn_idx", "text").count()
            .filter("count > 2").count())
    assert dups == 0
