"""Co-located bucketed joins: both sides written bucketBy(key) ->
SortMergeJoin with ZERO shuffle exchanges in the physical plan (the
at-rest layout strategy for repeatedly-joined corpus tables)."""
import os

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def test_bucketed_join_elides_shuffles(spark, tmp_path):
    from pdfminer_spark.spark.bucketing import shuffle_free_join, write_bucketed

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    left = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    right = ev.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("total"))
    write_bucketed(left, "bk_left", str(tmp_path / "l"), "user_id", 8)
    write_bucketed(right, "bk_right", str(tmp_path / "r"), "user_id", 8)
    # the fixture tables are tiny, so the planner would broadcast; at
    # corpus scale both sides exceed any broadcast threshold and the
    # strategy under test is the one that matters — force it here
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold",
                              None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = shuffle_free_join(spark, "bk_left", "bk_right", "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the whole point: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is still correct
        n_users = ev.select("user_id").distinct().count()
        assert joined.count() == n_users
        row = joined.where(F.col("user_id") == 0).collect()[0]
        expect = ev.where(F.col("user_id") == 0)
        assert row["n_events"] == expect.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                           prev_aqe)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
