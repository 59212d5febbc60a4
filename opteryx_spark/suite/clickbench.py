"""ClickBench-shaped analytics over the events table.

The reference tracks performance with a 43-query ClickBench harness
(``tests/performance/clickbench/clickbench.py``); the driver's ``events``
table proxies the web-hits shape (FIXTURES.md §8).  These entries model
the characteristic ClickBench patterns: high-cardinality user counts,
top-k by frequency, time-bucketed series, conditional funnels.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.suite import register
from opteryx_spark.suite._util import t


@register(
    "cb_user_activity_topk",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id LIMIT 50
    """,
)
def cb_user_activity_topk(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(F.col("value").cast("decimal(25,8)")).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(50)
    )


@register(
    "cb_daily_series",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(25,8)) ELSE 0 END) AS DOUBLE) AS purchase_value
    FROM events GROUP BY 1 ORDER BY day
    """,
)
def cb_daily_series(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("dau"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value").cast("decimal(25,8)")
                ).otherwise(F.lit(0).cast("decimal(25,8)"))
            )
            .cast("double")
            .alias("purchase_value"),
        )
        .orderBy("day")
    )


@register(
    "cb_type_share",
    oracle="""
    WITH tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM tot) AS share
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def cb_type_share(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    total = ev.count()  # scalar aggregate parameter (one tiny job)
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n").cast("double") / F.lit(float(total)))
        .orderBy("event_type")
    )


@register(
    "cb_value_percentiles_by_type",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           MAX(value) AS mx
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def cb_value_percentiles_by_type(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.max("value").alias("mx"),
        )
        .orderBy("event_type")
    )


@register(
    "cb_user_first_last",
    oracle="""
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS first_seen,
           CAST(MAX(ts) AS TIMESTAMP) AS last_seen,
           CAST(date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS BIGINT) AS active_span_days
    FROM events GROUP BY user_id
    HAVING COUNT(*) >= 5
    ORDER BY user_id
    """,
)
def cb_user_first_last(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date"))
            .cast("long")
            .alias("active_span_days"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 5)
        .drop("_n")
        .orderBy("user_id")
    )


# --- round-6 widening: the remaining characteristic ClickBench shapes --------
# (regexp field extraction, two-key matrix + HAVING, time histograms,
#  per-minute burst top-k — clickbench.py queries 13/17/18/22/28 flavors)


@register(
    "cb_props_extract_topk",
    oracle="""
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM (SELECT CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '')
                 AS BIGINT) AS k, user_id
          FROM events) x
    WHERE k IS NOT NULL
    GROUP BY k ORDER BY n DESC, k LIMIT 25
    """,
)
def cb_props_extract_topk(spark, sf_dir):
    """ClickBench regexp-extraction rollup (the 'extract term from URL,
    top-k by hits and distinct users' shape, CB q13/q28): pull the
    numeric field out of the raw props string with one regexp (no JSON
    parse dependency), then a high-cardinality group + two counts.
    Extraction is codegen'd map-side; one shuffle on the extracted key."""
    ev = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1)
    return (
        ev.select(F.when(k != "", k).cast("long").alias("k"), "user_id")
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n"), F.asc("k"))
        .limit(25)
    )


@register(
    "cb_user_type_matrix",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, event_type
    HAVING COUNT(*) >= 3
    ORDER BY n DESC, user_id, event_type LIMIT 100
    """,
)
def cb_user_type_matrix(spark, sf_dir):
    """Two-key frequency matrix with a HAVING floor and count-ordered
    top-k (CB q17/q18 'user x minute' shape): one shuffle on the compound
    key, partial aggregation map-side, deterministic tiebreak."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .orderBy(F.desc("n"), F.asc("user_id"), F.asc("event_type"))
        .limit(100)
    )


@register(
    "cb_hour_histogram",
    oracle="""
    SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_value
    FROM events GROUP BY 1 ORDER BY hour_of_day
    """,
)
def cb_hour_histogram(spark, sf_dir):
    """Hour-of-day traffic histogram (CB time-bucketed series family):
    24-row aggregate; the average is double(decimal-exact sum)/double(n)
    per the suite's determinism rules."""
    ev = t(spark, sf_dir, "events")
    dsum = F.sum(F.col("value").cast("decimal(25,8)")).cast("double")
    return (
        ev.groupBy(F.hour("ts").cast("long").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum.alias("total_value"),
            (dsum / F.count(F.lit(1)).cast("double")).alias("avg_value"),
        )
        .orderBy("hour_of_day")
    )


@register(
    "cb_minute_bursts",
    oracle="""
    SELECT user_id, date_trunc('minute', ts) AS minute,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    ORDER BY n DESC, user_id NULLS FIRST, minute NULLS FIRST LIMIT 50
    """,
)
def cb_minute_bursts(spark, sf_dir):
    """Per-(user, minute) burst detection, count-ordered top-k (CB q17:
    the classic hot-entity x time-bucket matrix at full cardinality)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"), F.asc("minute"))
        .limit(50)
    )
