"""Sketch-path accuracy vs the exact oracle-checked operators: the
percentile_approx quantile sketch and the HLL++ distinct counter must
land within published error bounds of the exact statistics (sketches
are engine-specific, so this — not a value-hash oracle — is their
correctness contract)."""
import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def test_percentile_approx_within_bounds(spark):
    from pdfminer_spark.ops.sketches import quantile_summary

    exact = {r["event_type"]: r for r in
             quantile_summary(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    approx = {r["event_type"]: r for r in
              ev.groupBy("event_type")
              .agg(F.percentile_approx("value", 0.5, 10000).alias("p50"))
              .collect()}
    for (etype, row) in exact.items():
        # accuracy=10000 -> rank error <= n/10000; values here are dense
        # so a loose relative-value bound suffices
        assert abs(approx[etype]["p50"] - row["p50"]) <= \
            max(0.05 * abs(row["p50"]), 0.2)


def test_hll_within_relative_error(spark):
    from pdfminer_spark.ops.sketches import cardinality_summary

    exact = {r["event_type"]: r["n_users"] for r in
             cardinality_summary(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    approx = {r["event_type"]: r["a"] for r in
              ev.groupBy("event_type")
              .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
              .collect()}
    for (etype, n) in exact.items():
        assert abs(approx[etype] - n) <= max(0.05 * n, 2), \
            f"{etype}: approx {approx[etype]} vs exact {n}"
