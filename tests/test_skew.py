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
