"""Temporal operators over the ``events`` / ``orders`` tables: as-of
join, dimension range join, gap sessionization. These are the custom
operators the reference's batch model never needed but any large-scale
event/training pipeline does; each is expressed with the Spark-native
construct that survives 100 TB (window carry-forward, broadcast range
join, built-in session_window) and ships a DuckDB oracle (which has
native ASOF JOIN — a strong independent check of the join semantics).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- as-of join -----------------------------------------------------------------

def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT AS-OF JOIN: each 'purchase' event picks the latest 'click'
    by the same user with click.ts <= purchase.ts (the classic
    trade-matching / feature-lookup shape).

    Spark has no asof primitive for static frames; the scale-correct
    plan is the union-tag carry-forward: tag clicks and purchases, union
    them, and run ONE window per user ordered by (ts, tag, event_id)
    with last(click, ignorenulls) carrying the most recent click into
    each purchase row. Exactly one hash shuffle on user_id and a
    within-partition sort — no join blow-up, no range-condition
    cross-product, skew bounded by events-per-user. (A sort-merge
    inequality join degrades to per-key O(n*m); the carry-forward is
    O((n+m) log) per key.) Ties: a click at the SAME timestamp as the
    purchase is eligible (<=), ordered before it by the tag sort key;
    among equal-ts clicks the largest event_id wins — mirrored in the
    oracle by deduping clicks to one row per (user_id, ts) first.

    Oracle: DuckDB's native ASOF LEFT JOIN over the same deduped click
    table — an independent engine's implementation of the same
    semantics, not a re-statement of ours."""
    ev = _t(spark, sf_dir, "events")
    clicks = (ev.where(F.col("event_type") == "click")
              # one click per (user, ts): keep the largest event_id so
              # the asof pick is deterministic under ts ties
              .groupBy("user_id", "ts")
              .agg(F.max_by("event_id", "event_id").alias("click_id"),
                   F.max_by("value", "event_id").alias("click_value")))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value")
    tagged = (
        clicks.select("user_id", "ts", F.lit(0).alias("tag"),
                      "click_id", "click_value",
                      F.lit(None).cast("long").alias("event_id"),
                      F.lit(None).cast("double").alias("value"))
        .unionByName(purchases.select(
            "user_id", "ts", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("click_id"),
            F.lit(None).cast("double").alias("click_value"),
            "event_id", "value"))
    )
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "tag", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # time delta in exact integer MICROSECONDS (unix_micros / EPOCH_US):
    # a seconds cast would truncate in Spark but round in DuckDB. The
    # parquet column is TIMESTAMP_NTZ; the session timezone is pinned
    # UTC, so the cast gives the same epoch DuckDB's EPOCH_US assigns
    # to the naive timestamp. The carry-forward expressions must be
    # projected BEFORE the purchase filter (the window has to see the
    # click rows).
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    carried = tagged.select(
        "user_id", "ts", "tag", "event_id", "value",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last("click_value", ignorenulls=True).over(w).alias("click_value"),
        F.max(F.when(F.col("tag") == 0, ts_us)).over(w).alias("click_us"),
    )
    return (carried.where(F.col("tag") == 1)
            .select("user_id", "event_id",
                    F.col("value").alias("purchase_value"),
                    "click_id", "click_value",
                    F.when(F.col("click_id").isNotNull(),
                           ts_us - F.col("click_us"))
                    .alias("micros_since_click")))


# -- dimension range join (SCD-2 lookup) ---------------------------------------

def scd2_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a small versioned dimension: each order finds
    the 'pricing epoch' whose [start, end) interval contains its
    o_orderdate (the slowly-changing-dimension lookup).

    Scale shape: the dimension is tiny by construction (one row per
    epoch), so the non-equi join is a BROADCAST nested-loop over the
    fact scan — the only join strategy that is both correct and cheap
    for interval containment against a small dim; the fact side never
    shuffles. The epoch table is generated in-plan (sequence + explode)
    so the oracle can rebuild it identically."""
    o = _t(spark, sf_dir, "orders")
    years = spark.range(1995, 2002).select(
        F.col("id").cast("int").alias("epoch_year"),
        F.to_timestamp(F.concat(F.col("id").cast("string"), F.lit("-01-01")))
        .alias("epoch_start"),
        F.to_timestamp(F.concat((F.col("id") + 1).cast("string"),
                                F.lit("-01-01"))).alias("epoch_end"),
    )
    joined = o.join(
        F.broadcast(years),
        (F.col("o_orderdate") >= F.col("epoch_start"))
        & (F.col("o_orderdate") < F.col("epoch_end")),
        "inner",
    )
    return (joined.groupBy("epoch_year")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


# -- gap sessionization ----------------------------------------------------------

_SESSION_GAP = "2 hours"


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user via Spark's BUILT-IN session_window
    aggregate (events closer than the gap merge into one session —
    the native construct; the same call works on a stream with
    watermarked state). Output: one row per session with its span and
    activity stats.

    Scale: session_window is a first-class aggregation — partial
    map-side session fragments merge in the shuffle, one exchange on
    (user_id); no self-join, no window-lag pass over the full table.
    Oracle: the equivalent lag/gap-flag/cumsum formulation (start =
    min ts, end = max ts + gap, Spark's session_window end semantics)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", _SESSION_GAP).alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "session_value")
    )


_FUNNEL_WINDOW_DAYS = 7


def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step conversion funnel (the product-analytics classic):
    per user, the first ``signup`` event, the first ``purchase``
    STRICTLY AFTER it, and a converted-within-7-days verdict. Ordered
    "first B after A" is the shape naive joins get wrong — here it is
    two user-keyed aggregations joined on the user key (co-partitioned;
    no window over the raw event stream).

    Scale: two map-side-combined aggregations + one same-key join —
    exchanges keyed by user_id only, event payloads never travel."""
    ev = _t(spark, sf_dir, "events")
    s = (ev.where(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    p = (ev.where(F.col("event_type") == "purchase")
         .select("user_id", "ts")
         .join(s, "user_id")
         .where(F.col("ts") > F.col("signup_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("purchase_ts")))
    return (s.join(p, "user_id", "left")
            .select("user_id", "signup_ts", "purchase_ts",
                    F.when(F.col("purchase_ts").isNull(), 0)
                     .when(F.col("purchase_ts")
                           <= F.col("signup_ts")
                           + F.expr("INTERVAL %d DAYS"
                                    % _FUNNEL_WINDOW_DAYS), 1)
                     .otherwise(0).cast("int").alias("converted")))


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention (the other product-analytics classic):
    cohort = each user's first active day; per cohort day, user count
    and how many were active again exactly 1 and 7+ days later. Date
    arithmetic stays in whole days (to_date/datediff — identical
    semantics in DuckDB's DATE_DIFF), so no timestamp rounding crosses
    engines.

    Scale: one user-keyed aggregation (first day), one co-partitioned
    join back, one cohort-keyed aggregation — the cohort key space is
    days, bounded and tiny."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    j = (ev.join(first, "user_id")
         .select("user_id", "cohort_day",
                 F.datediff("day", "cohort_day").alias("off")))
    return (j.groupBy(
                F.date_format("cohort_day", "yyyy-MM-dd")
                 .alias("cohort_day"))
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.countDistinct(F.when(F.col("off") == 1,
                                        F.col("user_id")))
                  .alias("d1_retained"),
                 F.countDistinct(F.when(F.col("off") >= 7,
                                        F.col("user_id")))
                  .alias("d7_retained")))


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {
    "funnel_analysis": """
        WITH s AS (
          SELECT user_id, MIN(ts) AS signup_ts
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), p AS (
          SELECT e.user_id, MIN(e.ts) AS purchase_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
          GROUP BY e.user_id
        )
        SELECT s.user_id, s.signup_ts, p.purchase_ts,
               (CASE WHEN p.purchase_ts IS NULL THEN 0
                     WHEN p.purchase_ts <= s.signup_ts
                          + INTERVAL 7 DAY THEN 1
                     ELSE 0 END)::INT AS converted
        FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
    "cohort_retention": """
        WITH ev AS (
          SELECT user_id, ts::DATE AS day FROM events
        ), first AS (
          SELECT user_id, MIN(day) AS cohort_day
          FROM ev GROUP BY user_id
        ), j AS (
          SELECT e.user_id, f.cohort_day,
                 DATE_DIFF('day', f.cohort_day, e.day) AS off
          FROM ev e JOIN first f ON e.user_id = f.user_id
        )
        SELECT STRFTIME(cohort_day, '%Y-%m-%d') AS cohort_day,
               COUNT(DISTINCT user_id)::BIGINT AS n_users,
               COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END)
                 ::BIGINT AS d1_retained,
               COUNT(DISTINCT CASE WHEN off >= 7 THEN user_id END)
                 ::BIGINT AS d7_retained
        FROM j GROUP BY STRFTIME(cohort_day, '%Y-%m-%d')
    """,
    "asof_join": """
        WITH clicks AS (
          SELECT user_id, ts,
                 MAX(event_id) AS click_id,
                 MAX_BY(value, event_id) AS click_value
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts
        ), purchases AS (
          SELECT user_id, event_id, ts, value
          FROM events WHERE event_type = 'purchase'
        )
        SELECT p.user_id, p.event_id,
               p.value AS purchase_value,
               c.click_id, c.click_value,
               CASE WHEN c.click_id IS NOT NULL
                    THEN EPOCH_US(p.ts) - EPOCH_US(c.ts)
               END AS micros_since_click
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "scd2_range_join": """
        WITH years AS (
          SELECT y AS epoch_year,
                 MAKE_TIMESTAMP(y, 1, 1, 0, 0, 0) AS epoch_start,
                 MAKE_TIMESTAMP(y + 1, 1, 1, 0, 0, 0) AS epoch_end
          FROM (SELECT UNNEST(RANGE(1995, 2002))::INT AS y)
        )
        SELECT epoch_year, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN years
          ON o_orderdate >= epoch_start AND o_orderdate < epoch_end
        GROUP BY epoch_year
    """,
    "sessionize": """
        WITH flagged AS (
          SELECT user_id, ts, value, event_id,
                 -- Spark merges an event at EXACTLY last+gap into the
                 -- session (verified in tests/test_temporal.py), so only
                 -- a STRICTLY greater gap starts a new session
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                           > INTERVAL 2 HOUR
                      OR LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ), numbered AS (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 2 HOUR AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM numbered GROUP BY user_id, sid
    """,
}

QUERIES = {
    "funnel_analysis": funnel_analysis,
    "cohort_retention": cohort_retention,
    "asof_join": asof_join,
    "scd2_range_join": scd2_range_join,
    "sessionize": sessionize,
}
