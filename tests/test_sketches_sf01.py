"""Sketch accuracy at sf0.1 — the scale the sketches would actually be
used at (r6 verdict #8: the toy-SF bounds in test_sketches.py /
test_curationops.py say the code is wired right; these say the error
model holds where the data is big enough for the sketch to matter).

Each assertion is the sketch's PUBLISHED bound, not a loose fudge:

* ``percentile_approx(accuracy=A)`` guarantees rank error <= n/A
  (Greenwald-Khanna / KLL-style mergeable summary) — asserted by
  computing the exact rank of the approximate answer.
* ``approx_count_distinct(rsd=0.02)`` is HLL++ with relative standard
  deviation 2% — asserted at 3 sigma (6%), floor of a few absolute
  counts for small groups.
* The count-min companion (d=4, w=64) guarantees estimate >= true and
  estimate <= true + (e/w)*N w.h.p. — asserted for every exact heavy
  hitter.
"""
import math
import os

import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata not present")


def test_percentile_approx_rank_error_sf01(spark):
    A = 10000  # accuracy parameter -> rank error <= n/A
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    approx = {r["event_type"]: r["p50"] for r in
              ev.groupBy("event_type")
              .agg(F.percentile_approx("value", 0.5, A).alias("p50"))
              .collect()}
    stats = {r["event_type"]: r for r in
             ev.groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  *[F.sum((F.col("value") <= F.lit(v)).cast("long"))
                    .alias(f"le_{k}")
                    for (k, v) in enumerate(approx.values())])
             .collect()}
    for (k, (etype, p50)) in enumerate(approx.items()):
        n = stats[etype]["n"]
        rank = stats[etype][f"le_{k}"]
        # the sketch returns an actual data value, so its exact rank
        # must sit within n/A of the target rank ceil(0.5*n)
        target = math.ceil(0.5 * n)
        assert abs(rank - target) <= n / A + 1, \
            f"{etype}: rank {rank} vs target {target} (n={n})"


def test_hll_relative_error_sf01(spark):
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r["event_type"]: r["a"] for r in
              ev.groupBy("event_type")
              .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
              .collect()}
    for (etype, n) in exact.items():
        # rsd=0.02 -> 3-sigma relative bound 6%
        assert abs(approx[etype] - n) <= max(0.06 * n, 3), \
            f"{etype}: approx {approx[etype]} vs exact {n}"


def test_count_min_bound_sf01(spark):
    import hashlib

    from pdfminer_spark.ops.curationops import _words, heavy_hitters
    from pdfminer_spark.ops.textops import _docs

    D, W = 4, 64
    exact = {r["token"]: r["cnt"]
             for r in heavy_hitters(spark, SF01).collect()}
    toks = _docs(spark, SF01).select(F.explode(_words()).alias("token"))
    n_total = toks.count()
    assert n_total > 100_000  # sf0.1 is a real corpus, not the toy SF

    def bucket(row):
        return F.conv(F.substring(
            F.md5(F.concat(F.lit("r%d#" % row), F.col("token"))), 1, 8),
            16, 10).cast("long") % W

    counters = (toks.select(*[bucket(r).alias("b%d" % r) for r in range(D)])
                .select(F.posexplode(F.array(
                    *[F.col("b%d" % r) for r in range(D)]))
                    .alias("row", "bucket"))
                .groupBy("row", "bucket").agg(F.count("*").alias("c")))
    table = {(r["row"], r["bucket"]): r["c"] for r in counters.collect()}

    def est(token):
        return min(
            table.get((r, int(hashlib.md5(
                ("r%d#" % r + token).encode()).hexdigest()[:8], 16) % W), 0)
            for r in range(D))

    bound = (math.e / W) * n_total
    for (tok, cnt) in exact.items():
        e = est(tok)
        assert e >= cnt, (tok, e, cnt)
        assert e <= cnt + bound, (tok, e, cnt, bound)
