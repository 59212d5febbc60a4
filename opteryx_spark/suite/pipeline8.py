"""Suite waves 27-28 (round 7): time-series diagnostics (ACF, CUSUM
change-point, seasonal-naive forecast), graph k-core membership + full
core decomposition, snapshot-governance audits (multi-relationship
referential integrity, schema/statistics drift, categorical drift),
rolling-origin backtest folds, and the rank-family window functions —
registered after ``pipeline7`` so the round-6 backlog plus the round-7
registrations drain through the driver window first (the same tier-1b
discipline as pipeline7's header note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import quality as _quality
from opteryx_spark.operators import timeseries as _ts
from opteryx_spark.operators import web as _web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t

# --- daily series construction (shared by the two time-series entries) ---------

_US_PER_DAY = 86_400_000_000

_O_DAILY = f"""
      SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS d,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, epoch_us(ts) // {_US_PER_DAY}
"""


def _daily_counts(spark, sf_dir):
    # NULL-ts rows carry no series position (and the cusum operator
    # excludes NULL t by contract) — drop them on BOTH engine sides
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_US_PER_DAY}").alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- autocorrelation ------------------------------------------------------------

_ACF_MAX_LAG = 7


@register(
    "ts_acf_daily",
    oracle=f"""
    WITH daily AS ({_O_DAILY}),
    lags AS (SELECT CAST(x AS BIGINT) AS lag FROM range(1, {_ACF_MAX_LAG + 1}) t(x)),
    pairs AS (
      SELECT a.event_type, l.lag, a.cnt AS x, b.cnt AS y
      FROM daily a CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + l.lag
    ), agg AS (
      SELECT event_type, lag, count(*) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, lag, n_pairs,
           CASE WHEN (n_pairs * sxx - sx * sx) > 0
                 AND (n_pairs * syy - sy * sy) > 0
                THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                            * CAST(n_pairs * syy - sy * sy AS DOUBLE))
           END AS acf
    FROM agg ORDER BY event_type, lag
    """,
)
def ts_acf_daily(spark, sf_dir):
    """Per-type autocorrelation of the daily event-count series at lags
    1..{_ACF_MAX_LAG} (``operators/timeseries.py::autocorrelation``):
    BIGINT-exact Pearson sufficient statistics per (type, lag), one
    fixed float expression at the end — the seasonality screen for
    telemetry series.  Key-partitioned self-join + one aggregate; no
    global window."""
    return _ts.autocorrelation(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
        max_lag=_ACF_MAX_LAG,
    ).orderBy("event_type", "lag")


# --- CUSUM change-point ---------------------------------------------------------


@register(
    "ts_cusum_changepoint",
    oracle=f"""
    WITH daily AS ({_O_DAILY}),
    tot AS (
      SELECT event_type, count(*) AS n_points, CAST(sum(cnt) AS BIGINT) AS total
      FROM daily GROUP BY event_type
    ), pre AS (
      SELECT event_type, d,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
      FROM daily
    ), scored AS (
      SELECT p.event_type, t.n_points, t.total,
             abs(t.n_points * p.prefix - p.i * t.total) AS abs_t, p.d
      FROM pre p JOIN tot t USING (event_type)
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs_t DESC, d ASC) AS rn
      FROM scored
    )
    SELECT event_type, n_points, total, d AS cp_t,
           CAST(abs_t AS BIGINT) AS cusum_peak_abs
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
)
def ts_cusum_changepoint(spark, sf_dir):
    """Per-type CUSUM change-point over the daily event-count series
    (``operators/timeseries.py::cusum_changepoint``): the n-scaled
    statistic ``T_i = n·prefix_i − i·total`` stays BIGINT-exact; the
    peak |T| picks the level-shift boundary (earliest-day tie-break via
    a ``min(struct)`` keeper, not a rank window)."""
    return _ts.cusum_changepoint(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
    ).orderBy("event_type")


# --- k-core membership ----------------------------------------------------------

# Same deterministic doc-id permutation family as graph_triangle_counts
# (pipeline6), densified with three linear generators so the 5-core
# peel is non-trivial: fixpoint in 3 rounds (206 of 211 nodes survive);
# max_rounds=6 gives 2x margin and a fixed-depth oracle.  The edge set
# depends only on doc_id mod 211, so it is identical at every SF.
_KC_N = 211
_KC_K = 5
_KC_ROUNDS = 6

_O_KC_EDGES = f"""
      SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM (
        SELECT doc_id % {_KC_N} AS a, (doc_id * 31 + 7) % {_KC_N} AS b FROM documents
        UNION ALL SELECT doc_id % {_KC_N}, (doc_id * 17 + 3) % {_KC_N} FROM documents
        UNION ALL SELECT (doc_id * 13 + 5) % {_KC_N}, (doc_id * 41 + 11) % {_KC_N} FROM documents
      ) t(a, b) WHERE a <> b
"""


def _kcore_oracle() -> str:
    # every round CTE is MATERIALIZED: inlining would expand e{r} three
    # times per round (once per reference) — 3^rounds re-scans of the
    # base table, which exhausts file descriptors before it gets slow
    parts = [f"WITH e0 AS MATERIALIZED ({_O_KC_EDGES})"]
    for r in range(_KC_ROUNDS):
        parts.append(
            f""",
    d{r} AS MATERIALIZED (SELECT node, count(*) AS deg
             FROM (SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r}) t(node)
             GROUP BY node),
    k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {_KC_K}),
    e{r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e
                 JOIN k{r} ka ON e.a = ka.node
                 JOIN k{r} kb ON e.b = kb.node)"""
        )
    parts.append(
        f"""
    SELECT node, count(*) AS core_degree
    FROM (SELECT a AS node FROM e{_KC_ROUNDS}
          UNION ALL SELECT b FROM e{_KC_ROUNDS}) t(node)
    GROUP BY node ORDER BY node"""
    )
    return "".join(parts)


@register("graph_kcore_membership", oracle=_kcore_oracle())
def graph_kcore_membership(spark, sf_dir):
    """{_KC_K}-core membership (``operators/web.py::kcore``) over the
    deterministic doc-id permutation graph: iterative degree-peel, each
    round one aggregate + two semi joins hash-partitioned on node id,
    lineage re-rooted per round (the pagerank loop pattern).  Fixed
    ``max_rounds={_KC_ROUNDS}`` (fixpoint reached in 3) so the oracle
    unrolls the same number of peels."""
    docs = t(spark, sf_dir, "documents")
    g = [
        docs.select(
            (F.col("doc_id") % _KC_N).alias("src"),
            ((F.col("doc_id") * 31 + 7) % _KC_N).alias("dst"),
        ),
        docs.select(
            (F.col("doc_id") % _KC_N).alias("src"),
            ((F.col("doc_id") * 17 + 3) % _KC_N).alias("dst"),
        ),
        docs.select(
            ((F.col("doc_id") * 13 + 5) % _KC_N).alias("src"),
            ((F.col("doc_id") * 41 + 11) % _KC_N).alias("dst"),
        ),
    ]
    edges = g[0].unionAll(g[1]).unionAll(g[2])
    return _web.kcore(edges, k=_KC_K, max_rounds=_KC_ROUNDS).orderBy("node")


# --- multi-relationship referential-integrity audit -----------------------------


def _o_fk(label: str, child: str, fk: str, parent_sql: str, pk: str) -> str:
    return f"""
      SELECT '{label}' AS chk, 'referential' AS kind,
             (SELECT CAST(count(*) AS BIGINT) FROM {child} WHERE {fk} IS NOT NULL) AS n_rows,
             (SELECT CAST(count(*) AS BIGINT) FROM {child} c
              WHERE c.{fk} IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM ({parent_sql}) p WHERE p.{pk} = c.{fk})) AS n_violations
    """


@register(
    "quality_fk_audit",
    oracle=f"""
    WITH rep AS (
      {_o_fk("lineitem.l_orderkey -> orders.o_orderkey", "lineitem", "l_orderkey", "SELECT o_orderkey FROM orders", "o_orderkey")}
      UNION ALL {_o_fk("orders.o_custkey -> customer.c_custkey", "orders", "o_custkey", "SELECT c_custkey FROM customer", "c_custkey")}
      UNION ALL {_o_fk("customer.c_nationkey -> nation.n_nationkey", "customer", "c_nationkey", "SELECT n_nationkey FROM nation", "n_nationkey")}
      UNION ALL {_o_fk("events.user_id -> active_customer.c_custkey", "events", "user_id", "SELECT c_custkey FROM customer WHERE c_custkey < 100", "c_custkey")}
      UNION ALL {_o_fk("embeddings.vec_id -> documents.doc_id", "embeddings", "vec_id", "SELECT doc_id FROM documents", "doc_id")}
    )
    SELECT chk AS "check", kind, n_rows, n_violations,
           n_violations = 0 AS passed
    FROM rep ORDER BY "check"
    """,
)
def quality_fk_audit(spark, sf_dir):
    """Whole-schema referential-integrity audit: five FK relationships,
    each one LEFT ANTI join against the distinct (broadcastable) parent
    key set (``operators/quality.py::referential_check``), unioned into
    the uniform report schema.  The ``active_customer`` relationship
    audits against a FILTERED dimension — the nonzero-orphan case that
    proves the detection arithmetic (TPC-H proper is consistent by
    construction)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    ev = t(spark, sf_dir, "events")
    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    checks = [
        _quality.referential_check(
            li, orders, "l_orderkey", "o_orderkey",
            name="lineitem.l_orderkey -> orders.o_orderkey"),
        _quality.referential_check(
            orders, cust, "o_custkey", "c_custkey",
            name="orders.o_custkey -> customer.c_custkey"),
        _quality.referential_check(
            cust, nat, "c_nationkey", "n_nationkey",
            name="customer.c_nationkey -> nation.n_nationkey"),
        _quality.referential_check(
            ev, cust.filter(F.col("c_custkey") < 100), "user_id", "c_custkey",
            name="events.user_id -> active_customer.c_custkey"),
        _quality.referential_check(
            emb, docs, "vec_id", "doc_id",
            name="embeddings.vec_id -> documents.doc_id"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("check")


# --- snapshot schema/statistics drift -------------------------------------------

# split boundary: 2024-01-16 00:00:00 UTC in epoch micros
_DRIFT_SPLIT_US = 1_705_363_200_000_000
_DRIFT_COLS = ("event_type", "user_id", "value", "props")


def _o_drift_side(tag: str, pred: str) -> str:
    aggs = [f"count(*) AS r"]
    for i, c in enumerate(_DRIFT_COLS):
        aggs.append(f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n{i}")
        aggs.append(f"count(DISTINCT {c}) AS d{i}")
    branches = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, r AS rows_{tag}, coalesce(n{i}, 0) AS nulls_{tag}, d{i} AS distinct_{tag} FROM agg_{tag}"
        for i, c in enumerate(_DRIFT_COLS)
    )
    return (
        f"agg_{tag} AS (SELECT {', '.join(aggs)} FROM events WHERE {pred}),\n"
        f"    u{tag} AS ({branches})"
    )


@register(
    "quality_schema_drift",
    oracle=f"""
    WITH {_o_drift_side("a", f"epoch_us(ts) < {_DRIFT_SPLIT_US}")},
    {_o_drift_side("b", f"epoch_us(ts) >= {_DRIFT_SPLIT_US}")}
    SELECT ua.col_name, rows_a, nulls_a, distinct_a,
           rows_b, nulls_b, distinct_b,
           CAST(CASE WHEN rows_a > 0 AND rows_b > 0
                THEN (nulls_b * 1000000) // rows_b - (nulls_a * 1000000) // rows_a
                ELSE 0 END AS BIGINT) AS null_delta_ppm
    FROM ua JOIN ub USING (col_name) ORDER BY col_name
    """,
)
def quality_schema_drift(spark, sf_dir):
    """Structural drift between two snapshots of ``events`` (split at a
    fixed instant): per-column exact rows/nulls/distincts from ONE
    fused aggregate pass per side, unpivoted via a struct-array explode
    (``operators/quality.py::snapshot_drift``) — the cheap every-column
    screen a recurring ingestion runs before batch promotion."""
    ev = t(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    a = ev.filter(us < F.lit(_DRIFT_SPLIT_US))
    b = ev.filter(us >= F.lit(_DRIFT_SPLIT_US))
    return _quality.snapshot_drift(a, b, list(_DRIFT_COLS)).orderBy("col_name")


# --- wave 28: categorical drift, backtest folds, seasonal-naive forecast --------

from opteryx_spark.operators import scale as _scale  # noqa: E402


@register(
    "quality_categorical_drift",
    oracle=f"""
    WITH a AS (SELECT event_type FROM events WHERE epoch_us(ts) < {_DRIFT_SPLIT_US}),
    b AS (SELECT event_type FROM events WHERE epoch_us(ts) >= {_DRIFT_SPLIT_US}),
    ca AS (SELECT event_type AS cat_a, CAST(count(*) AS BIGINT) AS n_a FROM a GROUP BY event_type),
    cb AS (SELECT event_type AS cat_b, CAST(count(*) AS BIGINT) AS n_b FROM b GROUP BY event_type),
    ta AS (SELECT count(*) AS tot_a FROM a),
    tb AS (SELECT count(*) AS tot_b FROM b),
    j AS (
      SELECT coalesce(cat_a, cat_b) AS category,
             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
             CASE WHEN tot_a > 0 THEN (coalesce(n_a, 0) * 1000000) // tot_a ELSE 0 END AS sa,
             CASE WHEN tot_b > 0 THEN (coalesce(n_b, 0) * 1000000) // tot_b ELSE 0 END AS sb
      FROM ca FULL OUTER JOIN cb ON cat_a IS NOT DISTINCT FROM cat_b
      CROSS JOIN ta CROSS JOIN tb
    )
    SELECT category, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(sa AS BIGINT) AS share_a_ppm, CAST(sb AS BIGINT) AS share_b_ppm,
           CAST(abs(sa - sb) AS BIGINT) AS abs_delta_ppm
    FROM j ORDER BY category
    """,
)
def quality_categorical_drift(spark, sf_dir):
    """Categorical-distribution drift of ``event_type`` across the same
    snapshot split as `quality_schema_drift`
    (``operators/quality.py::categorical_drift``): per-category counts
    both sides (NULL-safe category alignment — a NULL stratum is real),
    truncating integer ppm shares, |delta| per category.  One groupBy
    per side + a full outer join; float-free."""
    ev = t(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    a = ev.filter(us < F.lit(_DRIFT_SPLIT_US))
    b = ev.filter(us >= F.lit(_DRIFT_SPLIT_US))
    return _quality.categorical_drift(a, b, "event_type").orderBy("category")


# rolling-origin folds: weekly cuts, 1-day embargo, 7-day test horizon
_BT_CUTS_US = (1_704_672_000_000_000, 1_705_276_800_000_000, 1_705_881_600_000_000)
_BT_EMB_MIN = 1_440
_BT_HOR_MIN = 7 * 1_440


@register(
    "sample_backtest_folds",
    oracle=f"""
    WITH folds AS (
      SELECT * FROM (VALUES
        (0, {_BT_CUTS_US[0]}), (1, {_BT_CUTS_US[1]}), (2, {_BT_CUTS_US[2]})
      ) t(fold, cut_us)
    ), e AS (SELECT epoch_us(ts) AS us FROM events WHERE ts IS NOT NULL),
    asn AS (
      SELECT f.fold,
             CASE WHEN e.us < f.cut_us THEN 'train'
                  WHEN e.us >= f.cut_us + {_BT_EMB_MIN * 60_000_000}
                   AND e.us < f.cut_us + {(_BT_EMB_MIN + _BT_HOR_MIN) * 60_000_000}
                  THEN 'test' END AS role,
             e.us
      FROM e CROSS JOIN folds f
    )
    SELECT CAST(fold AS BIGINT) AS fold, role,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(us) AS BIGINT) AS min_us, CAST(max(us) AS BIGINT) AS max_us
    FROM asn WHERE role IS NOT NULL
    GROUP BY fold, role ORDER BY fold, role
    """,
)
def sample_backtest_folds(spark, sf_dir):
    """Rolling-origin backtest folds over ``events``
    (``operators/scale.py::backtest_folds``): three weekly cut instants,
    1-day embargo (purge gap), 7-day test horizon — summarized per
    (fold, role) as counts + time bounds.  The assignment itself is
    map-only (one literal fold-spec explode, no shuffle)."""
    ev = t(spark, sf_dir, "events")
    assigned = _scale.backtest_folds(
        ev, "ts", list(_BT_CUTS_US),
        horizon_minutes=_BT_HOR_MIN, embargo_minutes=_BT_EMB_MIN,
    )
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    return (
        assigned.groupBy("fold", "role")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(us).alias("min_us"),
            F.max(us).alias("max_us"),
        )
        .orderBy("fold", "role")
    )


@register(
    "ts_forecast_snaive",
    oracle=f"""
    WITH daily AS ({_O_DAILY}),
    anch AS (SELECT event_type, max(d) AS t_max FROM daily GROUP BY event_type)
    SELECT s.event_type, s.d + 7 - a.t_max AS h, s.d + 7 AS for_t,
           s.cnt AS forecast
    FROM daily s JOIN anch a USING (event_type)
    WHERE s.d + 7 - a.t_max BETWEEN 1 AND 7
    ORDER BY event_type, h
    """,
)
def ts_forecast_snaive(spark, sf_dir):
    """Seasonal-naive forecast of the next week of daily per-type event
    counts (``operators/timeseries.py::seasonal_naive_forecast``): the
    M-competition baseline ŷ(T+h) = y(T+h−7) — one anchor aggregate +
    one key-partitioned join, integer-exact."""
    return _ts.seasonal_naive_forecast(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
        season=7,
    ).orderBy("event_type", "h")


# --- rank-family window functions (ntile / percent_rank / cume_dist / nth) ------


@register(
    "window_rank_variants",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
                ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_key
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def window_rank_variants(spark, sf_dir):
    """The rank-family window functions the other window entries don't
    reach: NTILE(4), PERCENT_RANK, CUME_DIST, NTH_VALUE — partitioned
    by priority, ordered by the unique key (fully deterministic).
    percent_rank/cume_dist are the same (rank−1)/(n−1)- and
    rank/n-style IEEE expressions in both engines over exact integer
    ranks; nth_value pins the full-partition frame explicitly."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    ).orderBy("o_orderpriority", "o_orderkey")


# --- full core decomposition (h-index iteration) --------------------------------

_CN_ROUNDS = 6  # fixpoint reached in 4 on this graph; 6 = margin


def _core_numbers_oracle() -> str:
    parts = [
        f"""WITH e0 AS MATERIALIZED ({_O_KC_EDGES}),
    nbrs AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM e0
      UNION ALL SELECT b AS node, a AS nbr FROM e0
    ),
    v0 AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS val FROM nbrs GROUP BY node
    )"""
    ]
    for r in range(_CN_ROUNDS):
        parts.append(
            f""",
    v{r + 1} AS MATERIALIZED (
      SELECT node, max(least(rn, val)) AS val FROM (
        SELECT nb.node, v.val,
               CAST(row_number() OVER (PARTITION BY nb.node
                    ORDER BY v.val DESC, nb.nbr) AS BIGINT) AS rn
        FROM nbrs nb JOIN v{r} v ON v.node = nb.nbr
      ) ranked GROUP BY node
    )"""
        )
    parts.append(
        f"""
    SELECT node, CAST(val AS BIGINT) AS core_number
    FROM v{_CN_ROUNDS} ORDER BY node"""
    )
    return "".join(parts)


@register("graph_core_numbers", oracle=_core_numbers_oracle())
def graph_core_numbers(spark, sf_dir):
    """Every node's core number via distributed h-index iteration
    (``operators/web.py::core_numbers``; Lü et al. 2016) over the same
    permutation graph as `graph_kcore_membership` — the scale-out
    replacement for the inherently-sequential peeling algorithm.
    Fixed ``max_rounds={_CN_ROUNDS}`` (fixpoint in 4), oracle unrolls
    the same rounds; consistency cross-check: every node with
    core_number ≥ 5 is exactly the 5-core membership entry."""
    docs = t(spark, sf_dir, "documents")
    g = [
        docs.select(
            (F.col("doc_id") % _KC_N).alias("src"),
            ((F.col("doc_id") * 31 + 7) % _KC_N).alias("dst"),
        ),
        docs.select(
            (F.col("doc_id") % _KC_N).alias("src"),
            ((F.col("doc_id") * 17 + 3) % _KC_N).alias("dst"),
        ),
        docs.select(
            ((F.col("doc_id") * 13 + 5) % _KC_N).alias("src"),
            ((F.col("doc_id") * 41 + 11) % _KC_N).alias("dst"),
        ),
    ]
    edges = g[0].unionAll(g[1]).unionAll(g[2])
    return _web.core_numbers(edges, max_rounds=_CN_ROUNDS).orderBy("node")


# --- ranked-retrieval evaluation (MRR / nDCG@k) ---------------------------------

from opteryx_spark.operators import retrieval as _retrieval  # noqa: E402

_EVAL_K = 10
# floor(1e6 / log2(r+1) + 0.5) for r = 1..10 — Python-quantized ONCE,
# identical literals on both engine sides (no runtime log anywhere)
_EVAL_W = (
    "(1, 1000000), (2, 630930), (3, 500000), (4, 430677), (5, 386853), "
    "(6, 356207), (7, 333333), (8, 315465), (9, 301030), (10, 289065)"
)


@register(
    "text_retrieval_eval",
    oracle=f"""
    WITH res AS (
      SELECT lang AS query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
      FROM documents WHERE lang IS NOT NULL
      QUALIFY rank <= {_EVAL_K}
    ), qr AS (
      SELECT lang AS query_id, doc_id, CAST(doc_id % 4 AS BIGINT) AS rel
      FROM documents WHERE lang IS NOT NULL
    ), w(r, w_ppm) AS (VALUES {_EVAL_W}),
    hits AS (
      SELECT res.query_id, res.rank, COALESCE(qr.rel, 0) AS rel
      FROM res LEFT JOIN qr ON qr.query_id = res.query_id
                           AND qr.doc_id = res.doc_id
    ), perq AS (
      SELECT h.query_id, CAST(count(*) AS BIGINT) AS n_retrieved,
             min(CASE WHEN h.rel > 0 THEN h.rank END) AS first_hit,
             CAST(COALESCE(sum(CASE WHEN h.rel > 0 AND h.rank <= {_EVAL_K}
                                    THEN h.rel * w.w_ppm ELSE 0 END), 0)
                  AS BIGINT) AS dcg_micro
      FROM hits h LEFT JOIN w ON w.r = h.rank
      GROUP BY h.query_id
    ), irk AS (
      SELECT query_id, doc_id, rel,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY rel DESC, doc_id) AS BIGINT) AS irank
      FROM qr WHERE rel > 0
    ), ideal AS (
      SELECT i.query_id, CAST(count(*) AS BIGINT) AS n_relevant,
             CAST(COALESCE(sum(CASE WHEN i.irank <= {_EVAL_K}
                                    THEN i.rel * w.w_ppm ELSE 0 END), 0)
                  AS BIGINT) AS idcg_micro
      FROM irk i LEFT JOIN w ON w.r = i.irank
      GROUP BY i.query_id
    )
    SELECT p.query_id, p.n_retrieved,
           CAST(COALESCE(i.n_relevant, 0) AS BIGINT) AS n_relevant,
           CAST(COALESCE(1000000 // p.first_hit, 0) AS BIGINT) AS rr_ppm,
           p.dcg_micro,
           CAST(COALESCE(i.idcg_micro, 0) AS BIGINT) AS idcg_micro,
           CAST(CASE WHEN COALESCE(i.idcg_micro, 0) > 0
                THEN (p.dcg_micro * 1000000) // i.idcg_micro
                ELSE 0 END AS BIGINT) AS ndcg_ppm
    FROM perq p LEFT JOIN ideal i USING (query_id)
    ORDER BY p.query_id
    """,
)
def text_retrieval_eval(spark, sf_dir):
    """Per-query MRR and nDCG@{_EVAL_K}
    (``operators/retrieval.py::rank_metrics``) over a deterministic
    per-language ranking (docs by n_chars DESC, id tiebreak) against
    graded qrels (rel = doc_id % 4): discount weights are
    Python-quantized ppm literals shared with the oracle, so the whole
    evaluation is BIGINT arithmetic — the tuning loop for the BM25 /
    ANN / RRF retrieval stack."""
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    results = (
        docs.select(
            F.col("lang").alias("query_id"),
            "doc_id",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= _EVAL_K)
    )
    qrels = docs.select(
        F.col("lang").alias("query_id"),
        "doc_id",
        (F.col("doc_id") % 4).cast("bigint").alias("rel"),
    )
    return _retrieval.rank_metrics(results, qrels, k=_EVAL_K).orderBy("query_id")


# --- character-entropy quality signal -------------------------------------------

from opteryx_spark.operators import text as _text  # noqa: E402

_ENT_PREFIX = 512
_ENT_LNT = ", ".join(
    f"({x}, {v})" for x, v in enumerate(_text.ln_micro_table(_ENT_PREFIX), start=1)
)


@register(
    "text_char_entropy",
    oracle=f"""
    WITH lnt(x, lx) AS (VALUES {_ENT_LNT}),
    src AS (
      SELECT doc_id, substring(text, 1, {_ENT_PREFIX}) AS s
      FROM documents
      WHERE text IS NOT NULL AND length(substring(text, 1, {_ENT_PREFIX})) >= 1
    ), ch AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(s) + 1), i -> s[i])) AS c
      FROM src
    ), cnt AS (
      SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
      FROM ch GROUP BY doc_id, c
    ), agg AS (
      SELECT cnt.doc_id, CAST(sum(n) AS BIGINT) AS n_chars_used,
             CAST(count(*) AS BIGINT) AS n_distinct_chars,
             CAST(sum(n * l.lx) AS BIGINT) AS sum_cl
      FROM cnt JOIN lnt l ON l.x = cnt.n GROUP BY cnt.doc_id
    ), fin AS (
      SELECT a.doc_id, a.n_chars_used, a.n_distinct_chars,
             CAST((a.n_chars_used * ln2.lx - a.sum_cl) // a.n_chars_used
                  AS BIGINT) AS char_entropy_micronats
      FROM agg a JOIN lnt ln2 ON ln2.x = a.n_chars_used
    )
    SELECT d.doc_id, f.n_chars_used, f.n_distinct_chars,
           f.char_entropy_micronats
    FROM documents d LEFT JOIN fin f USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_char_entropy(spark, sf_dir):
    """Per-document character-distribution entropy over a bounded
    prefix (``operators/text.py::char_entropy``): the classic cheap
    gibberish / encoding-junk screen, exact in integer micronats via
    the Python-quantized ln table both engines share as literals
    (``H = (n·L[n] − Σ c·L[c]) div n``).  NULL/empty text → NULL
    metrics, never silently zero."""
    docs = t(spark, sf_dir, "documents")
    return _text.char_entropy(docs, prefix_len=_ENT_PREFIX).orderBy("doc_id")


# --- cross-correlation (lead/lag between two metrics) ---------------------------

_CCF_MAX_LAG = 7


@register(
    "ts_ccf_daily",
    oracle=f"""
    WITH daily AS ({_O_DAILY}),
    sa AS (SELECT 'click->purchase' AS g, d, cnt FROM daily WHERE event_type = 'click'),
    sb AS (SELECT 'click->purchase' AS g, d, cnt FROM daily WHERE event_type = 'purchase'),
    lags AS (SELECT CAST(x AS BIGINT) AS lag
             FROM range({-_CCF_MAX_LAG}, {_CCF_MAX_LAG + 1}) t(x)),
    pairs AS (
      SELECT a.g, l.lag, a.cnt AS x, b.cnt AS y
      FROM sa a CROSS JOIN lags l
      JOIN sb b ON b.g = a.g AND b.d = a.d + l.lag
    ), agg AS (
      SELECT g, lag, count(*) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY g, lag
    )
    SELECT g, lag, n_pairs,
           CASE WHEN (n_pairs * sxx - sx * sx) > 0
                 AND (n_pairs * syy - sy * sy) > 0
                THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                            * CAST(n_pairs * syy - sy * sy AS DOUBLE))
           END AS ccf
    FROM agg ORDER BY g, lag
    """,
)
def ts_ccf_daily(spark, sf_dir):
    """Cross-correlation between the daily click and purchase count
    series at signed lags −{_CCF_MAX_LAG}..+{_CCF_MAX_LAG}
    (``operators/timeseries.py::cross_correlation``): a positive-lag
    peak means clicks LEAD purchases — the lead/lag discovery tool,
    BIGINT-exact sufficient statistics, one fixed float expression."""
    daily = _daily_counts(spark, sf_dir)
    a = daily.filter(F.col("event_type") == "click").select(
        F.lit("click->purchase").alias("g"), "d", "cnt"
    )
    b = daily.filter(F.col("event_type") == "purchase").select(
        F.lit("click->purchase").alias("g"), "d", "cnt"
    )
    return _ts.cross_correlation(
        a, b, key_cols=["g"], t_col="d", value_col="cnt", max_lag=_CCF_MAX_LAG
    ).orderBy("g", "lag")


# --- best-snippet (KWIC) extraction ---------------------------------------------

from opteryx_spark.suite.pipeline import _O_TOKENS as _O_TOKENS8  # noqa: E402
from opteryx_spark.suite.pipeline4 import _BM25_TERMS, _O_TERMS  # noqa: E402

_SNIP_W = 20


@register(
    "text_best_snippets",
    oracle=f"""
    WITH src AS MATERIALIZED (
      SELECT doc_id, {_O_TOKENS8} AS arr FROM documents WHERE text IS NOT NULL
    ), m AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p FROM (
        SELECT doc_id, unnest(range(1, len(arr) + 1)) AS i, arr FROM src
      ) t WHERE arr[i] IN ({_O_TERMS})
    ), s AS (
      SELECT doc_id, p,
             CAST(count(*) OVER (PARTITION BY doc_id ORDER BY p
                  RANGE BETWEEN CURRENT ROW AND {_SNIP_W - 1} FOLLOWING)
                  AS BIGINT) AS n
      FROM m
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n DESC, p ASC) AS rn
      FROM s
    )
    SELECT r.doc_id, r.p AS snippet_start, r.n AS n_matched,
           array_to_string(list_slice(arr, r.p, r.p + {_SNIP_W - 1}), ' ')
             AS snippet
    FROM r JOIN src USING (doc_id)
    WHERE rn = 1 ORDER BY r.doc_id
    """,
)
def text_best_snippets(spark, sf_dir):
    """Best-snippet (KWIC) extraction for the BM25 probe terms
    (``operators/retrieval.py::best_snippets``): the {_SNIP_W}-token
    window with the most query-term hits per matching doc — candidate
    windows anchored at match positions, one doc-partitioned RANGE
    window over the (sparse) match set, ``min(struct)`` keeper,
    token-array slice for the display text."""
    docs = t(spark, sf_dir, "documents")
    return _retrieval.best_snippets(
        docs, _BM25_TERMS, window_tokens=_SNIP_W
    ).orderBy("doc_id")
