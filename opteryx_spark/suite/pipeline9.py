"""Suite wave 30 (round 8): series/graph statistics and governance —
per-key OLS trend, degree assortativity + local clustering coefficients
over the deterministic doc-id graph, functional-dependency audits,
MAD-based robust outlier screens, interval-union coverage, activity
streaks, and exact per-group mode — registered after ``pipeline8`` so
the r8 queue (the 12 wave-27/28/29 entries) drains through the driver
window first (VERDICT r7 #5: new surface stays behind the queue, hard
cap ≤ 35 new oracle entries this round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import events as _events
from opteryx_spark.operators import profile as _profile
from opteryx_spark.operators import quality as _quality
from opteryx_spark.operators import timeseries as _ts
from opteryx_spark.operators import web as _web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t
from opteryx_spark.suite.pipeline8 import _KC_N, _O_DAILY, _O_KC_EDGES, _US_PER_DAY, _daily_counts


def _kc_edges(spark, sf_dir):
    """The densified doc-id permutation graph shared with the k-core /
    core-number entries (pipeline8): three linear generators mod
    ``_KC_N``, identical at every SF."""
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    g = [
        docs.select((did % _KC_N).alias("src"), ((did * 31 + 7) % _KC_N).alias("dst")),
        docs.select((did % _KC_N).alias("src"), ((did * 17 + 3) % _KC_N).alias("dst")),
        docs.select(
            ((did * 13 + 5) % _KC_N).alias("src"),
            ((did * 41 + 11) % _KC_N).alias("dst"),
        ),
    ]
    return g[0].unionAll(g[1]).unionAll(g[2])


# --- OLS trend ------------------------------------------------------------------


@register(
    "ts_ols_trend",
    oracle=f"""
    WITH daily AS ({_O_DAILY}),
    agg AS (
      SELECT event_type, count(*) AS n_points,
             CAST(sum(d) AS BIGINT) AS st, CAST(sum(cnt) AS BIGINT) AS sy,
             CAST(sum(d * d) AS BIGINT) AS stt,
             CAST(sum(d * cnt) AS BIGINT) AS sty
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n_points,
           CASE WHEN (n_points * stt - st * st) > 0
                THEN CAST(n_points * sty - st * sy AS DOUBLE)
                     / CAST(n_points * stt - st * st AS DOUBLE) END AS slope,
           CASE WHEN (n_points * stt - st * st) > 0
                THEN CAST(sy * stt - st * sty AS DOUBLE)
                     / CAST(n_points * stt - st * st AS DOUBLE) END AS intercept
    FROM agg ORDER BY event_type
    """,
)
def ts_ols_trend(spark, sf_dir):
    """Per-type OLS linear trend of the daily event-count series
    (``operators/timeseries.py::ols_trend``): five BIGINT-exact
    sufficient statistics from ONE groupBy, slope/intercept each a
    single closed-form float expression — the "is this metric growing"
    screen next to ACF (seasonality) and CUSUM (level shift)."""
    return _ts.ols_trend(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
    ).orderBy("event_type")


# --- degree assortativity -------------------------------------------------------


@register(
    "graph_assortativity",
    oracle=f"""
    WITH e AS MATERIALIZED ({_O_KC_EDGES}),
    deg AS MATERIALIZED (
      SELECT node, count(*) AS deg
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) t(node)
      GROUP BY node
    ),
    pairs AS (
      SELECT da.deg AS x, db.deg AS y
      FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
    ),
    xy AS (SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs),
    agg AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM xy
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           CASE WHEN (n * sxx - sx * sx) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS assortativity
    FROM agg
    """,
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the doc-id permutation
    graph (``operators/web.py::degree_assortativity``): Pearson over
    endpoint degrees with both orientations, BIGINT sufficient
    statistics, one fixed float expression — the one-number structural
    screen for link-graph snapshots."""
    return _web.degree_assortativity(_kc_edges(spark, sf_dir))


# --- local clustering coefficients ----------------------------------------------


@register(
    "graph_clustering_coeff",
    oracle=f"""
    WITH e AS MATERIALIZED ({_O_KC_EDGES}),
    deg AS (
      SELECT node, count(*) AS degree
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) t(node)
      GROUP BY node
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tc AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri) t(node)
      GROUP BY node
    )
    SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
           coalesce(tc.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN (2000000 * coalesce(tc.n_triangles, 0))
                     // (d.degree * (d.degree - 1)) END AS coeff_ppm
    FROM deg d LEFT JOIN tc ON tc.node = d.node
    ORDER BY d.node
    """,
)
def graph_clustering_coeff(spark, sf_dir):
    """Per-node local clustering coefficient over the doc-id graph
    (``operators/web.py::clustering_coefficients``): composes the
    ordered two-join triangle enumeration with the degree aggregate;
    ``coeff_ppm`` is pure integer ``div`` arithmetic (no floats at
    all); degree-<2 nodes report NULL, triangle-free nodes 0."""
    return _web.clustering_coefficients(_kc_edges(spark, sf_dir)).orderBy("node")


# --- functional-dependency audit ------------------------------------------------


def _o_fd(label: str, table: str, det: str, dep: str) -> str:
    return f"""
      SELECT '{label}' AS chk, 'functional' AS kind,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(coalesce(sum(CASE WHEN v >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_violating,
             CAST(coalesce(max(v), 0) AS BIGINT) AS max_variants,
             coalesce(sum(CASE WHEN v >= 2 THEN 1 ELSE 0 END), 0) = 0 AS passed
      FROM (SELECT {det}, count(DISTINCT {dep}) AS v
            FROM {table} WHERE {det} IS NOT NULL GROUP BY {det})
    """


@register(
    "quality_fd_violations",
    oracle=f"""
    WITH rep AS (
      {_o_fd("events.event_id -> event_type", "events", "event_id", "event_type")}
      UNION ALL {_o_fd("events.user_id -> event_type", "events", "user_id", "event_type")}
      UNION ALL {_o_fd("orders.o_orderkey -> o_custkey", "orders", "o_orderkey", "o_custkey")}
      UNION ALL {_o_fd("customer.c_nationkey -> c_mktsegment", "customer", "c_nationkey", "c_mktsegment")}
    )
    SELECT chk AS "check", kind, n_groups, n_violating, max_variants, passed
    FROM rep ORDER BY "check"
    """,
)
def quality_fd_violations(spark, sf_dir):
    """Functional-dependency audit (``operators/quality.py::fd_check``)
    over four candidate FDs — two that hold (key-determined) and two
    that don't, so both arms of the detection arithmetic are
    value-proven.  Each FD is ONE groupBy + one global aggregate."""
    ev = t(spark, sf_dir, "events")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    checks = [
        _quality.fd_check(ev, ["event_id"], "event_type",
                          name="events.event_id -> event_type"),
        _quality.fd_check(ev, ["user_id"], "event_type",
                          name="events.user_id -> event_type"),
        _quality.fd_check(orders, ["o_orderkey"], "o_custkey",
                          name="orders.o_orderkey -> o_custkey"),
        _quality.fd_check(cust, ["c_nationkey"], "c_mktsegment",
                          name="customer.c_nationkey -> c_mktsegment"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("check")


# --- MAD outlier screen ---------------------------------------------------------


@register(
    "quality_mad_outliers",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(value AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT event_type, x,
             quantile_cont(x, 0.5) OVER (PARTITION BY event_type) AS med
      FROM base
    ),
    mm AS (
      SELECT event_type, x, med,
             quantile_cont(abs(x - med), 0.5) OVER (PARTITION BY event_type) AS mad
      FROM m
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           min(med) AS median, min(mad) AS mad,
           CAST(sum(CASE WHEN abs(x - med) > (mad * 30) / 10.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM mm GROUP BY event_type ORDER BY event_type
    """,
)
def quality_mad_outliers(spark, sf_dir):
    """Robust per-type outlier counts on the event value column
    (``operators/quality.py::mad_outliers``): exact interpolated
    median + MAD via cascaded whole-partition window aggregates (one
    key exchange, NULL type a real stratum), |x−med| > 3·MAD flag —
    the heavy-tail-safe fence the mean/stddev z-score is not."""
    return _quality.mad_outliers(
        t(spark, sf_dir, "events"), ["event_type"], "value", k_tenths=30
    ).orderBy("event_type")


# --- interval-union coverage ----------------------------------------------------

_LEASE_US = 300_000_000  # each event holds a 5-minute activity lease


@register(
    "events_interval_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_LEASE_US} AS e
      FROM events WHERE ts IS NOT NULL
    ),
    mk0 AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv
    ),
    mk AS (
      SELECT user_id, s, e,
             CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS new
      FROM mk0
    ),
    isl AS (
      SELECT user_id, s, e,
             CAST(sum(new) OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl
      FROM mk
    ),
    pi AS (
      SELECT user_id, isl, min(s) AS i_s, max(e) AS i_e, count(*) AS cnt
      FROM isl GROUP BY user_id, isl
    )
    SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_e - i_s) AS BIGINT) AS covered,
           CAST(max(i_e) - min(i_s) AS BIGINT) AS span
    FROM pi GROUP BY user_id
    """,
)
def events_interval_coverage(spark, sf_dir):
    """Per-user union length of 5-minute activity leases
    (``operators/events.py::interval_coverage``): gaps-and-islands
    merge of overlapping [ts, ts+5min) intervals — one user-partitioned
    window + two user-grouped aggregates on the same hash partitioning;
    half-open touch-extends semantics, BIGINT micros end to end."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    iv = ev.select(
        "user_id", us.alias("s"), (us + F.lit(_LEASE_US)).alias("e")
    )
    return _events.interval_coverage(iv, ["user_id"], "s", "e")


# --- activity streaks -----------------------------------------------------------


@register(
    "events_streaks",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id AS u, epoch_us(ts) // {_US_PER_DAY} AS d
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    runs AS (
      SELECT u, d, d - row_number() OVER (PARTITION BY u ORDER BY d) AS run
      FROM days
    ),
    pr AS (SELECT u, run, count(*) AS len FROM runs GROUP BY u, run)
    SELECT u AS user_id, CAST(sum(len) AS BIGINT) AS active_days,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM pr GROUP BY u ORDER BY user_id
    """,
)
def events_streaks(spark, sf_dir):
    """Per-user longest consecutive-day activity streak
    (``operators/events.py::activity_streaks``): the canonical
    gaps-and-islands over the distinct user-day grid — ``day −
    row_number`` constant along a run; distinct + one window + two
    aggregates all sharing the user hash partitioning."""
    ev = t(spark, sf_dir, "events")
    return _events.activity_streaks(
        ev, "user_id", F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_US_PER_DAY}")
    ).orderBy("user_id")


# --- exact per-group mode -------------------------------------------------------


@register(
    "agg_mode_exact",
    oracle="""
    WITH b AS (
      SELECT user_id % 97 AS bucket, event_type
      FROM events WHERE event_type IS NOT NULL
    ),
    c AS (
      SELECT bucket, event_type, count(*) AS cnt
      FROM b GROUP BY bucket, event_type
    ),
    k AS (
      SELECT bucket, event_type, cnt,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY cnt DESC, event_type ASC) AS rn,
             count(*) OVER (PARTITION BY bucket) AS nd
      FROM c
    )
    SELECT bucket, event_type AS mode, CAST(cnt AS BIGINT) AS mode_count,
           CAST(nd AS BIGINT) AS n_distinct
    FROM k WHERE rn = 1 ORDER BY bucket
    """,
)
def agg_mode_exact(spark, sf_dir):
    """Exact per-group mode with deterministic tie-break
    (``operators/profile.py::mode_by_group``): counts then a
    ``min(struct(-count, value))`` keeper — map-side combinable, no
    rank window; NULL bucket (NULL user) is a real group, NULL values
    are not candidates."""
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 97).alias("bucket"), "event_type"
    )
    return _profile.mode_by_group(ev, ["bucket"], "event_type").orderBy("bucket")
