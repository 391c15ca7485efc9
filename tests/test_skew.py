"""Skew handling: the salted repartition must spread a giant conversation
across many partitions (the north-rule requirement AQE can't cover for
UDF fan-out)."""
from pyspark.sql import functions as F

from pdfminer_spark.spark.fixtures import build_transcripts
from pdfminer_spark.spark.pipeline import salted_repartition


def test_salting_spreads_giant_conversation(spark):
    # one conversation holds ~85% of all turns
    df = build_transcripts(spark, n_convs=4, giant_conv_turns=200)
    n = df.count()

    def partition_rows(frame):
        return [r.n for r in
                frame.withColumn("pid", F.spark_partition_id())
                .groupBy("pid").agg(F.count("*").alias("n")).collect()]

    unsalted = df.repartition(16, "conv_id")
    salted = salted_repartition(df, num_partitions=16, salt=16)
    max_unsalted = max(partition_rows(unsalted))
    max_salted = max(partition_rows(salted))
    # without salting one partition carries the whole giant conversation
    assert max_unsalted >= 200
    # salting spreads it: the hottest partition shrinks by >= 3x and
    # carries well under a quarter of the table (hash collisions among
    # the 16 salt buckets keep this from being the ideal n/16)
    assert max_salted * 3 <= max_unsalted
    assert max_salted <= n / 4


def test_salting_preserves_rows(spark):
    df = build_transcripts(spark, n_convs=4, giant_conv_turns=50)
    out = salted_repartition(df, num_partitions=8, salt=8)
    assert out.count() == df.count()
    assert "_salt" not in out.columns


def test_assembly_segment_cap_semantics(spark):
    """Two-stage segmented assembly must produce byte-identical documents
    to a single-shot ordered concat, including for a conversation far
    larger than the segment size (r1 verdict #6: no monster
    collect_list row at the wide stage)."""
    from pdfminer_spark.spark.pipeline import assemble_conversations

    rows = [("giant", i, "t%04d" % i, 10) for i in range(500)]
    rows += [("small", i, "s%d" % i, 5) for i in range(3)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, bytes_decoded long")
    out = {r["conv_id"]: r for r in
           assemble_conversations(df, segment_size=16).collect()}
    assert out["giant"]["n_turns"] == 500
    assert out["giant"]["bytes_decoded"] == 5000
    assert out["giant"]["doc_text"] == "\n".join("t%04d" % i for i in range(500))
    assert out["small"]["doc_text"] == "s0\ns1\ns2"
    # equality with the unsegmented formulation
    one_shot = {r["conv_id"]: r["doc_text"] for r in
                assemble_conversations(df, segment_size=1 << 30).collect()}
    assert {k: v["doc_text"] for (k, v) in out.items()} == one_shot
