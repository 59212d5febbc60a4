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
