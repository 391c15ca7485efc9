"""Bucketed-table layout helpers: the co-located-join path for tables
that are joined on the same key repeatedly at corpus scale (signature
tables joined to candidate pairs, per-user event tables, cell-bucketed
embedding tables for IVF probes).

Writing both sides bucketed+sorted by the join key lets Spark plan a
SortMergeJoin with NO shuffle exchange on either side — the join cost
collapses to a per-bucket merge, and re-running downstream joins on the
same key never pays the shuffle again. This is the at-rest complement
to the in-flight repartition the pipeline uses for one-shot joins.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as an external table
    (explicit path; the in-memory catalog carries the bucket spec)."""
    (df.write.mode("overwrite")
     .option("path", path)
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .saveAsTable(table))


def shuffle_free_join(spark: SparkSession, left: str, right: str,
                      key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark elides both shuffle exchanges (asserted in
    tests/test_bucketing.py by inspecting the physical plan)."""
    return spark.table(left).join(spark.table(right), key)
