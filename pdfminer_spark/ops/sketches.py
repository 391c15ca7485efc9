"""Quantile / cardinality summaries over the ``events`` table.

Two paths per statistic, mirroring the sketch literature retrieved for
this build (quantile-sketch and cold-item-filter papers in PAPERS.md):

* the EXACT operator is registered with a DuckDB oracle (interpolated
  percentiles and COUNT(DISTINCT) agree bit-for-bit across engines);
* the SKETCH path that survives 100 TB — ``percentile_approx`` (a
  mergeable single-pass quantile sketch) and ``approx_count_distinct``
  (HyperLogLog++) — is asserted against the exact values with error
  bounds in ``tests/test_sketches.py``. Sketches are engine-specific by
  construction, so they get accuracy assertions, not value-hash oracles.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_QS = [0.25, 0.5, 0.75, 0.95]


def quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of event value per event_type.

    Scale note: exact percentiles sort each group — fine for bounded
    group counts; at 100 TB per-key streaming use percentile_approx
    (fixed-memory, mergeable map-side) — accuracy-tested in
    tests/test_sketches.py against these exact values."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pct = F.percentile("value", F.lit(_QS).cast("array<double>"))
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), pct.alias("_p"))
        .select("event_type", "n",
                *[F.round(F.element_at("_p", i + 1), 4).alias(
                    "p%02d" % int(q * 100)) for (i, q) in enumerate(_QS)])
    )


def cardinality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct-user cardinality (the oracle-checked
    truth the HLL++ sketch path is tested against)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count("*").alias("n_events"))
    )


ORACLES: dict[str, str] = {
    "quantile_summary": """
        SELECT event_type, COUNT(*) AS n,
               %s
        FROM events GROUP BY event_type
    """ % ", ".join(
        "ROUND(QUANTILE_CONT(value, %s), 4) AS p%02d" % (q, int(q * 100))
        for q in _QS),
    "cardinality_summary": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
}

QUERIES = {
    "quantile_summary": quantile_summary,
    "cardinality_summary": cardinality_summary,
}
