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


def test_aqe_splits_skewed_shuffle_join(spark):
    """The other half of the skew story: for JOINS (no UDF fan-out), AQE
    is the designated defense — a sort-merge join against a key holding
    ~90% of one side must come out of adaptive planning with its skewed
    partition split (SortMergeJoin(skew=true) + AQEShuffleRead skewed),
    not one straggler task. Thresholds are forced low because the
    fixture is tiny; at 100 TB the defaults (256 MB medians) trigger
    the same rewrite.

    Two traps this test had to dodge: the payload must be incompressible
    AND consumed by the aggregate (count(*) lets column pruning drop it,
    and lz4 collapses a repeated pad below the skew threshold), and the
    aggregate must sit ON TOP of the join in the SAME dataframe (a
    separate .count() finalizes a different query execution, leaving
    this plan isFinalPlan=false)."""
    left = spark.range(0, 200000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id) END AS k",
        "sha2(cast(id as string), 256) AS v")
    right = spark.range(0, 5000).selectExpr(
        "CASE WHEN id % 50 = 0 THEN 'hot' ELSE concat('k', id) END AS k",
        "id AS w")
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for (k, v) in conf.items():
            spark.conf.set(k, v)
        joined = left.join(right, "k").agg(F.sum(F.length("v")).alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for (k, v) in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
