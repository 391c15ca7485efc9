"""Spark-layer tests: extraction pipeline, turn ordering, lineage resume.

Correctness oracle: the vendored goldens (FIXTURES.md §3) joined per
(conv_id, turn_idx)."""
import os

import pytest
from pyspark.sql import functions as F

from pdfminer_spark.spark.fixtures import build_expected, build_transcripts
from pdfminer_spark.spark.lineage import read_extracted, run_extraction
from pdfminer_spark.spark.pipeline import (assemble_conversations,
                                           extract_transcripts,
                                           with_turn_order)

N_CONVS = 8


@pytest.fixture(scope="module")
def extracted(spark):
    df = build_transcripts(spark, n_convs=N_CONVS)
    out = extract_transcripts(df, page_numbers=[0]).cache()
    yield out
    out.unpersist()


def test_per_turn_text_equality(spark, extracted):
    exp = build_expected(spark, n_convs=N_CONVS)
    joined = extracted.join(exp, ["conv_id", "turn_idx"], "inner")
    assert joined.count() == extracted.count()
    assert joined.filter(F.col("text") != F.col("expected_text")).count() == 0
    assert extracted.filter(F.col("status") != "ok").count() == 0


def test_turn_ordering_window(spark, extracted):
    ranked = with_turn_order(extracted)
    # row_number over (conv_id, turn_idx) is dense + ordered per conv
    bad = (ranked.groupBy("conv_id")
           .agg(F.count("*").alias("n"), F.max("turn_rank").alias("mx"))
           .filter(F.col("n") != F.col("mx")).count())
    assert bad == 0


def test_assemble_conversations(spark, extracted):
    docs = assemble_conversations(extracted)
    assert docs.count() == N_CONVS
    row = docs.filter(F.col("conv_id") == "conv-0000").first()
    # doc text is the turn texts joined in turn order
    turns = (extracted.filter(F.col("conv_id") == "conv-0000")
             .orderBy("turn_idx").select("text").collect())
    assert row.doc_text == "\n".join(t.text for t in turns)


def test_poison_payload_yields_status_not_failure(spark):
    rows = [("c1", 0, "user", "aGVsbG8=", "pdf", None),  # not a pdf
            ("c1", 1, "user", "plain text", "", None)]
    from pdfminer_spark.spark.fixtures import TRANSCRIPTS_SCHEMA

    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    out = extract_transcripts(df, repartition=False).collect()
    by_idx = {r.turn_idx: r for r in out}
    assert by_idx[0].status.startswith("error:")
    assert by_idx[0].text == ""
    assert by_idx[1].status == "ok"


def test_lineage_resume(spark, tmp_path):
    out_dir = str(tmp_path / "run")
    df = build_transcripts(spark, n_convs=N_CONVS)
    r1 = run_extraction(spark, df, out_dir, "run-a", num_buckets=8,
                        page_numbers=[0], fail_after_buckets=3)
    assert r1["processed_buckets"] == 3
    r2 = run_extraction(spark, df, out_dir, "run-b", num_buckets=8,
                        page_numbers=[0])
    assert r2["skipped_buckets"] == 3
    ext = read_extracted(spark, out_dir)
    assert ext.count() == df.count()
    dups = (ext.groupBy("conv_id", "turn_idx").count()
            .filter("count > 1").count())
    assert dups == 0
    # idempotent full rerun
    r3 = run_extraction(spark, df, out_dir, "run-c", num_buckets=8,
                        page_numbers=[0])
    assert r3["processed_buckets"] == 0
    assert read_extracted(spark, out_dir).count() == df.count()
