"""Round-6 seventh-wave suite entries: conversion attribution, exact
trailing-window anomaly flags, quantile feature binning, a one-pass
correlation matrix, triangle counting, MMR diversity re-ranking and a
bigram-LM perplexity gate — each with a bit-exact DuckDB oracle.

Determinism notes specific to this wave:
- the anomaly z-test is a pure BIGINT inequality (``(n·x − S)² >
  k²·(n·SS − S²)``) — no float variance, no sqrt;
- correlations cast EXACT integer/decimal moments to double and run ONE
  fixed float expression, identical IEEE in both engines;
- MMR selection is integer argmax with an id tiebreak, unrolled per
  greedy step in the oracle exactly like the k-means CTE chain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import events as _events
from opteryx_spark.operators import text as _text
from opteryx_spark.operators import features as _features
from opteryx_spark.operators import filtering as _filtering
from opteryx_spark.operators import profile as _profile
from opteryx_spark.operators import retrieval as _retrieval
from opteryx_spark.operators import web as _web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t

# --- last-touch conversion attribution ---------------------------------------

_AT_LB_MIN = 3 * 24 * 60  # 3-day lookback


@register(
    "events_attribution",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), tch AS (
      SELECT *,
        last_value(CASE WHEN event_type IS NOT NULL AND event_type <> 'purchase'
                        THEN struct_pack(t_us := us, t_type := event_type) END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM e
    ), c AS (
      SELECT CASE WHEN touch IS NOT NULL
                   AND touch.t_us >= us - {_AT_LB_MIN * 60 * 1000000}
                  THEN touch.t_type ELSE 'direct' END AS channel,
             value
      FROM tch WHERE event_type = 'purchase'
    )
    SELECT channel, count(*) AS n_conversions,
           CAST(sum(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS total_value
    FROM c GROUP BY channel ORDER BY channel
    """,
)
def events_attribution(spark, sf_dir):
    """Last-touch conversion attribution
    (``operators/events.py::attribute_conversions``): every purchase's
    value credited to the user's most recent non-purchase event within a
    3-day lookback, else 'direct' — one user-partitioned
    ``last(ignorenulls)`` window + one channel groupBy, DECIMAL-exact
    value sums."""
    ev = t(spark, sf_dir, "events")
    return _events.attribute_conversions(
        ev, conversion_type="purchase", lookback_minutes=_AT_LB_MIN
    ).orderBy("channel")


# --- trailing-window anomaly flags --------------------------------------------


@register(
    "events_value_anomalies",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(floor(value * 1000.0) AS BIGINT) AS x
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ), w AS (
      SELECT event_id, user_id, x AS value_milli,
             count(x) OVER fr AS n,
             sum(x) OVER fr AS s,
             sum(x * x) OVER fr AS ss
      FROM e WINDOW fr AS (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value_milli, CAST(n AS BIGINT) AS n_prior,
           coalesce(n >= 5
             AND (n * value_milli - s) * (n * value_milli - s)
                 > 9 * (n * ss - s * s), FALSE) AS is_anomaly
    FROM w ORDER BY event_id
    """,
)
def events_value_anomalies(spark, sf_dir):
    """Exact trailing-window z-score anomalies
    (``operators/events.py::detect_value_anomalies``): flag events more
    than 3 population sigmas from the user's previous 20 values — the
    z-test reduced to one BIGINT inequality, so the verdict is identical
    on any partitioning; one user-keyed window pass."""
    ev = t(spark, sf_dir, "events")
    out = _events.detect_value_anomalies(
        ev, window_rows=20, min_points=5, k=3, scale=1000
    )
    # Spark's 3VL gives NULL (not false) when the history is empty AND
    # n >= min_points is false; pin the operator's documented contract
    return out.withColumn(
        "is_anomaly", F.coalesce(F.col("is_anomaly"), F.lit(False))
    ).orderBy("event_id")


# --- equal-frequency (quantile) binning ---------------------------------------

_QB_K = 10


def _qb_oracle() -> str:
    bcols = ", ".join(
        f"quantile_cont(l_extendedprice, {i / _QB_K!r}) AS b{i}"
        for i in range(1, _QB_K)
    )
    terms = " + ".join(
        f"(CASE WHEN l_extendedprice > b{i} THEN 1 ELSE 0 END)"
        for i in range(1, _QB_K)
    )
    return f"""
    WITH b AS (SELECT {bcols} FROM lineitem)
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           CAST(CASE WHEN l_extendedprice IS NOT NULL THEN {terms} END
                AS INTEGER) AS bin
    FROM lineitem CROSS JOIN b
    WHERE l_orderkey % 41 = 0
    ORDER BY l_orderkey, l_linenumber
    """


@register("feat_quantile_bin", oracle=_qb_oracle())
def feat_quantile_bin(spark, sf_dir):
    """Equal-frequency feature binning
    (``operators/features.py::quantile_bin``): decile index of every
    lineitem price — ONE exact-percentile aggregate broadcast onto a
    map-side bucket count, no rank window, no global sort.  Boundaries
    are computed over the FULL table; the output projects a
    deterministic 1-in-41 order subset to keep the compare bounded."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    out = _features.quantile_bin(li, "l_extendedprice", k=_QB_K)
    return out.filter(F.col("l_orderkey") % 41 == 0).orderBy(
        "l_orderkey", "l_linenumber"
    )


# --- one-pass correlation matrix ----------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    selects = []
    for a, b in pairs:
        qa = f"CAST(floor(CAST({a} AS DOUBLE) * 1000.0) AS DECIMAL(18,0))"
        qb = f"CAST(floor(CAST({b} AS DOUBLE) * 1000.0) AS DECIMAL(18,0))"
        selects.append(
            f"""
    SELECT '{a}' AS col_x, '{b}' AS col_y, n,
           CASE WHEN den > 0 THEN num / den END AS corr
    FROM (
      SELECT CAST(count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
                  AS BIGINT) AS n,
             (CAST(count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
                   AS DOUBLE) * CAST(sum(CAST((x * y) AS DECIMAL(38,0))) AS DOUBLE)
              - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) AS num,
             sqrt((CAST(count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
                        AS DOUBLE) * CAST(sum(CAST((x * x) AS DECIMAL(38,0))) AS DOUBLE)
                   - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
                  * (CAST(count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
                          AS DOUBLE) * CAST(sum(CAST((y * y) AS DECIMAL(38,0))) AS DOUBLE)
                     - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE))) AS den
      FROM (
        SELECT CASE WHEN {qa} IS NOT NULL AND {qb} IS NOT NULL THEN {qa} END AS x,
               CASE WHEN {qa} IS NOT NULL AND {qb} IS NOT NULL THEN {qb} END AS y
        FROM lineitem))
    """
        )
    return " UNION ALL ".join(selects) + " ORDER BY col_x, col_y"


@register("profile_correlations", oracle=_corr_oracle())
def profile_correlations(spark, sf_dir):
    """One-pass Pearson correlation matrix
    (``operators/profile.py::correlation_matrix``): all six pairs of the
    four lineitem rate/price columns from a SINGLE aggregate scan —
    milli-quantized inputs, DECIMAL(38,0)-exact moments, one fixed float
    expression at the end (bit-identical cross-engine)."""
    li = t(spark, sf_dir, "lineitem")
    return _profile.correlation_matrix(li, _CORR_COLS, scale=1000).orderBy(
        "col_x", "col_y"
    )


# --- triangle counting ---------------------------------------------------------

_TRI_N = 211  # prime node count => the doc-id permutation graph is dense


@register(
    "graph_triangle_counts",
    oracle=f"""
    WITH e0 AS (
      SELECT doc_id % {_TRI_N} AS src, (doc_id * 31 + 7) % {_TRI_N} AS dst
      FROM documents
    ), e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e0 WHERE src <> dst
    ), tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, count(*) AS n_triangles
    FROM corners GROUP BY node ORDER BY node
    """,
)
def graph_triangle_counts(spark, sf_dir):
    """Per-node triangle counts (``operators/web.py::triangle_counts``)
    over a deterministic doc-id permutation graph ({_TRI_N} nodes): the
    ordered two-join enumeration emits each triangle once — two equi
    joins + one aggregate, no cartesian, no windows."""
    docs = t(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % _TRI_N).alias("src"),
        ((F.col("doc_id") * 31 + 7) % _TRI_N).alias("dst"),
    )
    return _web.triangle_counts(edges).orderBy("node")


# --- MMR diversity re-ranking ---------------------------------------------------

_MMR_K = 5
_MMR_CAND = 15
_MMR_LAM = 70
_MMR_DIM = 64


def _mmr_oracle() -> str:
    qv = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"

    def dot(l, r):
        return (
            f"list_reduce(list_transform(range(1, {_MMR_DIM} + 1), "
            f"i -> {l}[i] * {r}[i]), (acc, v) -> acc + v)"
        )

    sql = f"""
    WITH qn AS (
      SELECT {qv} AS qv FROM embeddings WHERE vec_id = 0
    ), cand AS (
      SELECT c.vec_id, c.qv, {dot("c.qv", "y.qv")} AS rel
      FROM (SELECT vec_id, {qv} AS qv FROM embeddings
            WHERE embedding IS NOT NULL AND vec_id <> 0) c
      CROSS JOIN qn y
      ORDER BY rel DESC, vec_id LIMIT {_MMR_CAND}
    ), s1 AS (
      SELECT vec_id, qv, rel, {_MMR_LAM} * rel AS score
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    )
    """
    mu = 100 - _MMR_LAM
    for i in range(2, _MMR_K + 1):
        prev = ", ".join(f"s{j} p{j}" for j in range(1, i))
        sims = [dot("c.qv", f"p{j}.qv") for j in range(1, i)]
        mx = sims[0] if len(sims) == 1 else f"greatest({', '.join(sims)})"
        notin = " UNION ALL ".join(f"SELECT vec_id FROM s{j}" for j in range(1, i))
        sql += f"""
    , s{i} AS (
      SELECT c.vec_id, c.qv, c.rel,
             {_MMR_LAM} * c.rel - {mu} * ({mx}) AS score
      FROM cand c, {prev}
      WHERE c.vec_id NOT IN ({notin})
      ORDER BY score DESC, c.vec_id LIMIT 1
    )
    """
    parts = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, rel, score AS mmr_score FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return sql + parts + " ORDER BY rank"


@register("emb_mmr_rerank", oracle=_mmr_oracle())
def emb_mmr_rerank(spark, sf_dir):
    """MMR diversity re-ranking (``operators/retrieval.py::mmr_rerank``):
    top-5 of 15 dense-retrieval candidates balancing relevance against
    redundancy (lambda = 0.70), all-integer scoring over milli-quantized
    vectors so the greedy pick order is engine-identical — relevance is a
    map-only fold; the bounded candidate frame is collected ONCE and the
    greedy stage runs as exact integer arithmetic on the driver (one
    Spark job total).  The oracle unrolls the 5 steps as CTEs."""
    emb = t(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(v) for v in qrow["embedding"]]
    return _retrieval.mmr_rerank(
        emb.filter(F.col("vec_id") != 0),
        qvec,
        k=_MMR_K,
        candidates=_MMR_CAND,
        lambda_pct=_MMR_LAM,
    ).orderBy("rank")


# --- bigram-LM perplexity gate ---------------------------------------------------

_O_TOKENS6 = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "text_bigram_perplexity",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_O_TOKENS6} AS t FROM documents
    ), tr AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t, unnest(range(1, coalesce(len(t), 1))) AS i FROM tok)
    ), big AS (
      SELECT w1, w2, count(*) AS c12 FROM tr GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, count(*) AS c1 FROM tr GROUP BY 1
    ), vv AS (
      SELECT count(DISTINCT w1) + 1 AS V FROM tr
    ), costs AS (
      SELECT w1, w2,
             CAST(floor((-ln((CAST(c12 AS DOUBLE) + 0.5)
                 / (CAST(c1 AS DOUBLE) + (0.5 * CAST(V AS DOUBLE)))))
                 * 1000.0 + 0.5) AS BIGINT) AS nll
      FROM big JOIN ctx USING (w1) CROSS JOIN vv
    ), doc AS (
      SELECT tr.doc_id, count(*) AS n_bigrams,
             CAST(sum(nll) AS BIGINT) AS bigram_nll_millinats
      FROM tr JOIN costs USING (w1, w2) GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(bigram_nll_millinats, 0) AS bigram_nll_millinats,
           CASE WHEN coalesce(n_bigrams, 0) > 0
                THEN CAST(bigram_nll_millinats AS DOUBLE)
                     / CAST(n_bigrams AS DOUBLE) END AS avg_nll_millinats,
           coalesce(CASE WHEN coalesce(n_bigrams, 0) > 0
                         THEN CAST(bigram_nll_millinats AS DOUBLE)
                              / CAST(n_bigrams AS DOUBLE) END <= 9000.0,
                    FALSE) AS passes_perplexity
    FROM documents d LEFT JOIN doc ON doc.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def text_bigram_perplexity(spark, sf_dir):
    """Bigram-LM perplexity gate
    (``operators/filtering.py::bigram_perplexity``): per-transition
    smoothed conditional costs in integer millinats, summed exactly per
    document — the conditional upgrade of the unigram KenLM-style gate;
    two word-count aggregates + one cost join, no windows."""
    docs = t(spark, sf_dir, "documents")
    out = _filtering.bigram_perplexity(docs, alpha=0.5, max_avg_nll_millinats=9000)
    return out.select(
        "doc_id",
        "n_bigrams",
        "bigram_nll_millinats",
        "avg_nll_millinats",
        "passes_perplexity",
    ).orderBy("doc_id")


# --- OHLC time bars ---------------------------------------------------------------

_BAR_US = 60 * 60 * 1_000_000


@register(
    "events_ohlc_bars",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, value, epoch_us(ts) AS us
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ), k AS (
      SELECT event_type, us - (us % {_BAR_US}) AS bar_start_us,
             us, event_id, value
      FROM e
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bar_start_us
                                ORDER BY us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bar_start_us
                                ORDER BY us DESC, event_id DESC) AS rn_d
      FROM k
    )
    SELECT event_type, bar_start_us,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(sum(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS volume,
           count(*) AS n_events
    FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_ohlc_bars(spark, sf_dir):
    """Candlestick OHLC bars (``operators/events.py::ohlc_bars``): per
    event type and hour, open/high/low/close/volume — open and close are
    ``min/max(struct(us, id, value))`` aggregates (map-side partial
    combine; hot bars never sort in one task), volume is the exact
    DECIMAL sum.  The oracle takes the same extremes via rank windows —
    semantically identical, DuckDB-side only."""
    ev = t(spark, sf_dir, "events")
    return _events.ohlc_bars(ev, bar_minutes=60).orderBy(
        "event_type", "bar_start_us"
    )


# --- dyadic EWMA ------------------------------------------------------------------

_EW_W = 16


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(x, {k}) OVER w * {1 << (_EW_W - k)}, 0)"
        for k in range(1, _EW_W + 1)
    )
    den = " + ".join(
        f"coalesce(CASE WHEN lag(x, {k}) OVER w IS NOT NULL"
        f" THEN {1 << (_EW_W - k)} END, 0)"
        for k in range(1, _EW_W + 1)
    )
    npr = " + ".join(
        f"CASE WHEN lag(x, {k}) OVER w IS NOT NULL THEN 1 ELSE 0 END"
        for k in range(1, _EW_W + 1)
    )
    return f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(floor(value * 1000.0) AS BIGINT) AS x
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ), t AS (
      SELECT event_id, user_id, x AS value_milli,
             {num} AS num, {den} AS den, {npr} AS np
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT event_id, user_id, value_milli, CAST(np AS BIGINT) AS n_prior,
           CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END
             AS ewma
    FROM t ORDER BY event_id
    """


@register("events_ewma", oracle=_ewma_oracle())
def events_ewma(spark, sf_dir):
    """Dyadic-decay EWMA (``operators/events.py::ewma_features``): the
    k-th most recent of the last 16 values weighs 2^-k, so numerator and
    denominator are EXACT BIGINTs and the only float is one division —
    16 lag taps sharing a single user-keyed window sort.  The oracle
    unrolls the identical taps."""
    ev = t(spark, sf_dir, "events")
    return _events.ewma_features(ev, window_rows=_EW_W).orderBy("event_id")


# --- RFM segmentation ---------------------------------------------------------------


def _rfm_oracle() -> str:
    def bounds(col, tag):
        return ", ".join(
            f"quantile_cont({col}, {i / 5!r}) AS {tag}{i}" for i in range(1, 5)
        )

    def bin_expr(col, tag):
        s = " + ".join(
            f"(CASE WHEN CAST({col} AS DOUBLE) > {tag}{i} THEN 1 ELSE 0 END)"
            for i in range(1, 5)
        )
        return f"CAST({s} AS INTEGER)"

    return f"""
    WITH ref AS (SELECT max(o_orderdate) AS refd FROM orders),
    per AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate), (SELECT refd FROM ref))
                  AS BIGINT) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ), b AS (
      SELECT {bounds("recency_days", "r")}, {bounds("frequency", "f")},
             {bounds("monetary", "m")}
      FROM per
    ), binned AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             {bin_expr("recency_days", "r")} AS r_bin,
             {bin_expr("frequency", "f")} AS f_bin,
             {bin_expr("monetary", "m")} AS m_bin
      FROM per CROSS JOIN b
    )
    SELECT *, CAST(r_bin AS VARCHAR) || CAST(f_bin AS VARCHAR)
              || CAST(m_bin AS VARCHAR) AS rfm_code
    FROM binned ORDER BY o_custkey
    """


@register("cust_rfm_segments", oracle=_rfm_oracle())
def cust_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: recency/frequency/monetary per
    customer, each quintile-binned with
    ``operators/features.py::quantile_bin`` (three ONE-aggregate
    percentile passes broadcast onto map-side bucket counts — no rank
    windows) and concatenated into the classic RFM code."""
    orders = t(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("_ref"))
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(25,8)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.col("_ref"), F.col("_last")).cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    out = _features.quantile_bin(per, "recency_days", k=5).withColumnRenamed(
        "bin", "r_bin"
    )
    out = _features.quantile_bin(out, "frequency", k=5).withColumnRenamed(
        "bin", "f_bin"
    )
    out = _features.quantile_bin(out, "monetary", k=5).withColumnRenamed(
        "bin", "m_bin"
    )
    return out.withColumn(
        "rfm_code",
        F.concat(
            F.col("r_bin").cast("string"),
            F.col("f_bin").cast("string"),
            F.col("m_bin").cast("string"),
        ),
    ).orderBy("o_custkey")


# --- incremental rollup maintenance (IVM) -------------------------------------------


@register(
    "events_rollup_merge",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS us, value
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    )
    SELECT event_type, us - (us % {_BAR_US}) AS hour_start_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_rollup_merge(spark, sf_dir):
    """Incremental-view maintenance (``operators/scale.py::merge_rollups``):
    the hourly rollup is maintained as base (4/5 of events) merged with a
    delta batch (1/5) — ONE rollup-sized full outer join; counts and
    DECIMAL-exact sums add, extremes combine via least/greatest.  The
    oracle re-aggregates the full input: equality IS the IVM correctness
    property."""
    from opteryx_spark.operators import scale as _scale

    ev = t(spark, sf_dir, "events")

    def roll(df):
        base = df.filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        return (
            base.select(
                "event_type",
                (us - (us % F.lit(_BAR_US))).alias("hour_start_us"),
                "value",
            )
            .groupBy("event_type", "hour_start_us")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(25,8)")).alias("_sum_dec"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )

    merged = _scale.merge_rollups(
        roll(ev.filter(F.col("event_id") % 5 != 0)),
        roll(ev.filter(F.col("event_id") % 5 == 0)),
        ["event_type", "hour_start_us"],
        [
            ("count", "n_events"),
            ("sum", "_sum_dec"),
            ("min", "min_value"),
            ("max", "max_value"),
        ],
    )
    return merged.select(
        "event_type",
        "hour_start_us",
        "n_events",
        F.col("_sum_dec").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("event_type", "hour_start_us")


# --- perceptual-hash image dedup -----------------------------------------------------

from opteryx_spark.operators import multimodal as _mm  # noqa: E402
from opteryx_spark.operators.multimodal import _dhash_band_expr  # noqa: E402

# deterministic stub media: every 10th doc's content duplicates doc_id-5,
# so the near-dup ground truth is exactly n/10 hamming-0 pairs at any sf
_MM_KEY = "CASE WHEN doc_id % 10 = 0 THEN doc_id - 5 ELSE doc_id END"


def _mm_content(spark_side: bool):
    if spark_side:
        key = F.when(F.col("doc_id") % 10 == 0, F.col("doc_id") - 5).otherwise(
            F.col("doc_id")
        )
        return F.repeat(F.sha2(key.cast("string"), 256), 4)
    return f"repeat(sha256(CAST(({_MM_KEY}) AS VARCHAR)), 4)"


def _phash_bands_oracle() -> str:
    bands = ", ".join(f"{_dhash_band_expr('h', b)} AS b{b}" for b in range(4))
    return f"""
    WITH c AS (
      SELECT doc_id, sha256({_mm_content(False)}) AS h FROM documents
    )
    SELECT doc_id, {bands} FROM c ORDER BY doc_id
    """


@register("mm_phash_bands", oracle=_phash_bands_oracle())
def mm_phash_bands(spark, sf_dir):
    """Perceptual dHash of stub media content
    (``operators/multimodal.py::dhash_bands``): 64 bits as four 16-bit
    BIGINT bands, one codegen'd expression per band (no Python, no
    shuffle) — the banding representation image dedup joins on.  The
    oracle evaluates the IDENTICAL instr/substring expression text."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", _mm_content(True).alias("payload")
    )
    return _mm.dhash_bands(docs, content_col="payload", id_col="doc_id").orderBy(
        "doc_id"
    )


def _phash_pairs_oracle() -> str:
    bands = ", ".join(f"{_dhash_band_expr('h', b)} AS b{b}" for b in range(4))
    ham = " + ".join(f"bit_count(xor(a.b{b}, b.b{b}))" for b in range(4))
    return f"""
    WITH c AS (
      SELECT doc_id, sha256({_mm_content(False)}) AS h FROM documents
    ), bands AS (
      SELECT doc_id, {bands} FROM c
    ), pairs AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.doc_id < r.doc_id
       AND (l.b0 = r.b0 OR l.b1 = r.b1 OR l.b2 = r.b2 OR l.b3 = r.b3)
    )
    SELECT p.id_a, p.id_b, CAST({ham} AS BIGINT) AS hamming
    FROM pairs p
    JOIN bands a ON a.doc_id = p.id_a
    JOIN bands b ON b.doc_id = p.id_b
    WHERE CAST({ham} AS BIGINT) <= 3
    ORDER BY id_a, id_b
    """


@register("mm_phash_near_dups", oracle=_phash_pairs_oracle())
def mm_phash_near_dups(spark, sf_dir):
    """Perceptual-hash image near-dup pairs
    (``operators/multimodal.py::phash_near_dup_pairs``): band-equality
    candidates (4x16-bit LSH — perfect recall at hamming <= 3 by
    pigeonhole) verified by XOR popcount.  The fixture plants one
    duplicate per 10 docs; random band collisions are generated and then
    correctly rejected by the verifier on both sides."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", _mm_content(True).alias("payload")
    )
    return _mm.phash_near_dup_pairs(
        docs, content_col="payload", id_col="doc_id", max_hamming=3
    ).orderBy("id_a", "id_b")


# --- point-in-time SCD2 enrichment ---------------------------------------------------

_SCD2_CTE = """
    scd_e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), scd_f AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                    OR event_type IS DISTINCT FROM lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM scd_e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), scd_s AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS version
      FROM scd_f
    ), dim AS (
      SELECT user_id, version, min(event_type) AS state,
             CAST(min(us) AS BIGINT) AS valid_from_us,
             lead(CAST(min(us) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY version) AS valid_to_us
      FROM scd_s GROUP BY 1, 2
    )
"""


@register(
    "events_point_in_time_state",
    oracle=f"""
    WITH {_SCD2_CTE}
    SELECT e.event_id, e.user_id, CAST(e.us AS BIGINT) AS us,
           d.state, d.version
    FROM scd_e e
    JOIN dim d
      ON d.user_id = e.user_id
     AND e.us >= d.valid_from_us
     AND (d.valid_to_us IS NULL OR e.us < d.valid_to_us)
    ORDER BY e.event_id
    """,
)
def events_point_in_time_state(spark, sf_dir):
    """Point-in-time dimension enrichment — the feature-leakage-safe
    join ML training sets require: each event joined to the SCD2 state
    valid AT ITS OWN timestamp (``operators/events.py::scd2_history``
    composed with ``operators/joins.py::asof_join``).  The as-of form is
    one union + one user-keyed window — no interval/range join blowup;
    the oracle does the interval-containment join directly, proving the
    two formulations agree on every row."""
    from opteryx_spark.operators import joins as _joins

    ev = t(spark, sf_dir, "events")
    dim = _events.scd2_history(ev).select(
        "user_id",
        F.col("valid_from_us").alias("t"),
        "state",
        "version",
    )
    left = ev.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    out = _joins.asof_join(left, dim, on="t", by="user_id", how="inner")
    return out.select(
        "event_id", "user_id", F.col("t").alias("us"), "state", "version"
    ).orderBy("event_id")


# --- latency percentiles (SLO rollup) -------------------------------------------------


@register(
    "events_latency_percentiles",
    oracle="""
    SELECT event_type,
           count(value) AS n,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.99) AS p99
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_latency_percentiles(spark, sf_dir):
    """SLO percentile rollup: exact interpolated p50/p95/p99 of value
    per event type in ONE aggregate (Spark ``percentile`` == DuckDB
    ``quantile_cont``, the proven cross-engine pair).  At extreme scale
    the same plan shape takes ``approx_percentile`` — see
    ``agg_quantile_histogram`` for the sketch-based variant."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .orderBy("event_type")
    )


# --- URL canonicalization ---------------------------------------------------------

# deterministic junk-laden URL fixture — ONE SQL expression string valid
# in BOTH engines ('||' concat, CASE, %), so the inputs are identical
_CANON_URL_SQL = """
    CASE WHEN doc_id % 13 = 3 THEN 'not a url' ELSE
      (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
      (CASE doc_id % 6
         WHEN 0 THEN 'WWW.Alpha-News.com'
         WHEN 1 THEN 'cdn.Beta.co.uk'
         WHEN 2 THEN 'gamma.io'
         WHEN 3 THEN 'sub.delta.com.au'
         WHEN 4 THEN 'Blog.Epsilon.org'
         ELSE 'localhost' END) ||
      (CASE doc_id % 5
         WHEN 0 THEN ':443' WHEN 1 THEN ':80' WHEN 2 THEN ':8080'
         ELSE '' END) ||
      (CASE WHEN doc_id % 3 = 0 THEN '/sec/a/' ELSE '/sec/a/b' END) ||
      (CASE doc_id % 4
         WHEN 0 THEN '?b=2&utm_source=x&a=1'
         WHEN 1 THEN '?ref=rss'
         WHEN 2 THEN '?z=9&y=8'
         ELSE '' END) ||
      (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)
    END
"""

_O_C_SCHEME = "lower(NULLIF(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$', 1), ''))"
_O_C_HOST = (
    "lower(NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*).*$', 1), ''))"
)
_O_C_PORT = (
    "NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+).*$', 1), '')"
)
_O_C_PATH = (
    "NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*).*$', 1), '')"
)
_O_C_QUERY = (
    "NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*\\?([^#]*).*$', 1), '')"
)
_O_C_TRACK = (
    "x -> x <> '' AND NOT (starts_with(x, 'utm_') OR starts_with(x, 'gclid=')"
    " OR x = 'gclid' OR starts_with(x, 'fbclid=') OR x = 'fbclid'"
    " OR starts_with(x, 'ref=') OR x = 'ref' OR starts_with(x, 'mc_cid=')"
    " OR x = 'mc_cid' OR starts_with(x, 'mc_eid=') OR x = 'mc_eid')"
)


@register(
    "web_canonical_urls",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, {_CANON_URL_SQL} AS url FROM documents
    ), p AS (
      SELECT doc_id, url,
             {_O_C_SCHEME} AS s, {_O_C_HOST} AS h, {_O_C_PORT} AS pt,
             {_O_C_PATH} AS pa, {_O_C_QUERY} AS q
      FROM raw
    ), parts AS (
      SELECT doc_id, url, s, h,
             CASE WHEN pt IS NULL OR (s = 'http' AND pt = '80')
                       OR (s = 'https' AND pt = '443')
                  THEN '' ELSE ':' || pt END AS port_part,
             CASE WHEN pa IS NULL THEN '/'
                  WHEN length(pa) > 1 AND pa LIKE '%/'
                  THEN substring(pa, 1, length(pa) - 1)
                  ELSE pa END AS path_part,
             list_sort(list_filter(string_split(q, '&'), {_O_C_TRACK})) AS prm,
             q
      FROM p
    )
    SELECT doc_id, url,
           CASE WHEN s IS NULL OR h IS NULL THEN NULL
                ELSE s || '://' || h || port_part || path_part ||
                     (CASE WHEN q IS NULL OR len(prm) = 0 THEN ''
                           ELSE '?' || array_to_string(prm, '&') END)
           END AS canonical_url
    FROM parts ORDER BY doc_id
    """,
)
def web_canonical_urls(spark, sf_dir):
    """URL canonicalization (``operators/web.py::canonicalize_urls``):
    lowercased scheme/host, default ports stripped, fragments dropped,
    tracking params removed, surviving params SORTED, trailing slash
    normalized — the URL-level dedup key crawl pipelines collapse on
    before content hashing.  Pure map-only expressions; the fixture
    plants mixed case, default and non-default ports, utm/ref params,
    fragments and malformed values."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_CANON_URL_SQL).alias("url")
    )
    return _web.canonicalize_urls(docs).select(
        "doc_id", "url", "canonical_url"
    ).orderBy("doc_id")


# --- HTML -> text extraction ---------------------------------------------------------

# identical construction both engines ('||' concat, NULL-propagating)
_HTML_FIX = (
    "'<html><head><style>p{color:red}</style>"
    "<script type=\"text/javascript\">var x=1;</script></head>"
    "<body><!-- crawler junk --><div class=\"main\"><p>' || text || "
    "'</p></div>&amp;<b>tail&nbsp;bits</b> &lt;raw&gt;</body></html>'"
)


@register(
    "text_strip_html",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_HTML_FIX} AS html FROM documents)
    SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html,
                     '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                   '(?s)<!--.*?-->', ' ', 'g'),
                 '<[^>]+>', ' ', 'g'),
               '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', ''''), '&apos;', ''''),
             '[ \\t\\r\\n]+', ' ', 'g')) AS text_clean
    FROM raw ORDER BY doc_id
    """,
)
def text_strip_html(spark, sf_dir):
    """HTML -> text extraction (``operators/text.py::strip_html``): the
    C4-style first step over raw crawl payloads — script/style/comment
    spans dropped WITH content, tags become spaces, common entities
    decoded, whitespace collapsed.  Map-only codegen'd expressions whose
    regex semantics agree between Java regex and RE2, so the oracle runs
    the identical text arithmetic on an HTML-wrapped fixture."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_HTML_FIX).alias("html")
    )
    return docs.select(
        "doc_id", _text.strip_html("html").alias("text_clean")
    ).orderBy("doc_id")


# --- time-weighted average (TWAP) -----------------------------------------------------


@register(
    "events_twap",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS us, event_id,
             CAST(floor(value * 1000.0) AS BIGINT) AS x
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ), s AS (
      SELECT *, lead(us) OVER (PARTITION BY user_id, day
                               ORDER BY us, event_id) - us AS dt
      FROM e
    )
    SELECT user_id, day,
           CASE WHEN sum(dt) > 0
                THEN CAST(sum(CAST(x * dt AS DECIMAL(38,0))) AS DOUBLE)
                     / CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE) END AS twap,
           count(*) AS n_obs
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_twap(spark, sf_dir):
    """Time-weighted average (``operators/events.py::twap``): per user
    and day, each value weighted by its holding duration — exact BIGINT
    durations, DECIMAL(38,0) weighted sums, one float division; one lead
    window + one aggregate sharing the (user, day) exchange."""
    ev = t(spark, sf_dir, "events")
    return _events.twap(ev).orderBy("user_id", "day")


# --- domain concentration (Gini audit) ------------------------------------------------

from opteryx_spark.suite.pipeline3 import _O_HOST as _O_HOST6  # noqa: E402
from opteryx_spark.suite.pipeline3 import _O_URL_CTE as _O_URL_CTE6  # noqa: E402
from opteryx_spark.suite.pipeline3 import _o_domain as _o_domain6  # noqa: E402
from opteryx_spark.suite.pipeline3 import _with_urls as _with_urls6  # noqa: E402


@register(
    "web_domain_gini",
    oracle=f"""
    {_O_URL_CTE6}
    , d AS (
      SELECT {_o_domain6(_O_HOST6)} AS domain FROM u
    ), counts AS (
      SELECT domain, count(*) AS n_docs FROM d GROUP BY domain
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY n_docs ASC, domain ASC NULLS FIRST)
                AS i
      FROM counts
    ), g AS (
      SELECT (2.0 * CAST(sum(CAST(i * n_docs AS DECIMAL(38,0))) AS DOUBLE)
              - CAST(count(*) + 1 AS DOUBLE) * CAST(CAST(sum(n_docs) AS BIGINT) AS DOUBLE))
             / (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(n_docs) AS BIGINT) AS DOUBLE))
               AS gini,
             CAST(sum(n_docs) AS BIGINT) AS tot
      FROM ranked
    )
    SELECT domain, n_docs,
           CAST((n_docs * 1000000) // tot AS BIGINT) AS share_ppm, gini
    FROM counts CROSS JOIN g
    ORDER BY domain NULLS FIRST
    """,
)
def web_domain_gini(spark, sf_dir):
    """Domain-concentration audit
    (``operators/web.py::domain_concentration``): per-domain counts,
    truncating parts-per-million shares and the corpus Gini coefficient
    — the anti-domination number web-corpus curation reports.  The rank
    window and Gini reduction run over DOMAIN rows only (≪ corpus);
    every term is an exact integer until one final float division."""
    docs = _with_urls6(t(spark, sf_dir, "documents"))
    return _web.domain_concentration(docs).orderBy(
        F.col("domain").asc_nulls_first()
    )


# --- batched exact kNN join -----------------------------------------------------------

_KNN_QIDS = (0, 1, 2)
_KNN_K = 5
_KNN_DIM = 64


def _knn_oracle() -> str:
    qids = ", ".join(str(q) for q in _KNN_QIDS)
    dist = (
        f"list_reduce(list_transform(range(1, {_KNN_DIM} + 1), "
        "i -> (c.qv[i] - y.qv[i]) * (c.qv[i] - y.qv[i])), (a, b) -> a + b)"
    )
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ), qry AS (
      SELECT vec_id AS query_id, qv FROM q WHERE vec_id IN ({qids})
    ), corp AS (
      SELECT vec_id, qv FROM q WHERE vec_id NOT IN ({qids})
    ), d AS (
      SELECT y.query_id, c.vec_id, {dist} AS dist2
      FROM corp c CROSS JOIN qry y
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist2, vec_id) AS rank
      FROM d
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
           CAST(dist2 AS BIGINT) AS dist2
    FROM r WHERE rank <= {_KNN_K} ORDER BY query_id, rank
    """


@register("emb_knn_join", oracle=_knn_oracle())
def emb_knn_join(spark, sf_dir):
    """Batched exact kNN join (``operators/similarity.py::knn_join``):
    top-5 nearest corpus vectors for a 3-query batch in ONE corpus pass —
    partition-local top-k (bounded O(k) memory per group) merged by a
    final per-query aggregate, so the exchange carries k·P·Q structs,
    never the corpus; no rank window over corpus-sized partitions.
    BIGINT squared-L2 over milli-quantized components."""
    from opteryx_spark.operators import similarity as _sim

    emb = t(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id").isin(list(_KNN_QIDS)))
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(r.vec_id, [float(v) for v in r.embedding]) for r in qrows]
    corpus = emb.filter(~F.col("vec_id").isin(list(_KNN_QIDS)))
    return _sim.knn_join(queries, corpus, k=_KNN_K).orderBy("query_id", "rank")


# --- leakage-safe temporal split -------------------------------------------------------

# split point: a fixed instant inside the fixture's range; 1-day embargo
_TS_SPLIT_US = 1_705_000_000_000_000  # 2024-01-11T18:46:40Z
_TS_EMBARGO_MIN = 24 * 60


@register(
    "sample_temporal_split",
    oracle=f"""
    SELECT event_id, ts,
           CASE WHEN epoch_us(ts) < {_TS_SPLIT_US} THEN 'train'
                WHEN epoch_us(ts) >= {_TS_SPLIT_US + _TS_EMBARGO_MIN * 60 * 1000000}
                  THEN 'test'
                WHEN ts IS NOT NULL THEN 'embargo' END AS split
    FROM events ORDER BY event_id
    """,
)
def sample_temporal_split(spark, sf_dir):
    """Leakage-safe temporal split
    (``operators/scale.py::temporal_split``): train strictly before the
    split instant, test at/after split + 1-day embargo, the purge window
    between them EXCLUDED — the time-series evaluation split that
    prevents serial-correlation leakage; pure map-only expression."""
    from opteryx_spark.operators import scale as _scale

    ev = t(spark, sf_dir, "events").select("event_id", "ts")
    return _scale.temporal_split(
        ev, "ts", _TS_SPLIT_US, embargo_minutes=_TS_EMBARGO_MIN
    ).orderBy("event_id")


# --- DAU / WAU stickiness ---------------------------------------------------------------


@register(
    "events_dau_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), dau AS (
      SELECT d AS day, count(*) AS dau FROM ud GROUP BY d
    ), cov AS (
      SELECT u, unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
               AS day
      FROM ud
    ), wau AS (
      SELECT CAST(day AS DATE) AS day, count(DISTINCT u) AS wau
      FROM cov GROUP BY 1
    )
    SELECT w.day, coalesce(dau.dau, 0) AS dau, w.wau,
           CAST((coalesce(dau.dau, 0) * 1000000) // w.wau AS BIGINT)
             AS stickiness_ppm
    FROM wau w LEFT JOIN dau ON dau.day = w.day
    ORDER BY w.day
    """,
)
def events_dau_wau(spark, sf_dir):
    """DAU/WAU/stickiness (``operators/events.py::dau_wau_stickiness``):
    exact rolling-distinct actives via COVERAGE EXPLODE — the distinct
    (user, day) frame bounds everything, each pair covers its 7 report
    days map-side, one count-distinct per day finishes.  No window
    frames (COUNT DISTINCT OVER is unsupported everywhere); at extreme
    scale the same shape runs on merged per-day HLL registers."""
    ev = t(spark, sf_dir, "events")
    return _events.dau_wau_stickiness(ev, window_days=7).orderBy("day")


# --- Fellegi-Sunter record-linkage scoring ----------------------------------------------

import math as _math  # noqa: E402

_FS_NAME = (
    "source || '_rec_' || lpad(CAST((doc_id * 7919) % 100000 AS VARCHAR), 5, '0')"
)
_FS_M_NAME, _FS_U_NAME = 0.95, 0.02
_FS_M_LANG, _FS_U_LANG = 0.9, 0.3
_FS_THRESH = 1500


def _fs_w(m, u):
    return (
        int(_math.floor(_math.log(m / u) * 1000 + 0.5)),
        int(_math.floor(_math.log((1.0 - m) / (1.0 - u)) * 1000 + 0.5)),
    )


def _fs_oracle() -> str:
    wa_n, wd_n = _fs_w(_FS_M_NAME, _FS_U_NAME)
    wa_l, wd_l = _fs_w(_FS_M_LANG, _FS_U_LANG)
    return f"""
    WITH canon AS (
      SELECT doc_id AS cid, {_FS_NAME} AS cname, lang AS clang FROM documents
    ), dirty AS (
      SELECT doc_id AS did,
        CASE doc_id % 4
          WHEN 0 THEN substr(cname, 1, 1) || substr(cname, 3)
          WHEN 1 THEN cname || 'x'
          WHEN 2 THEN 'q' || cname
          ELSE cname END AS dname,
        CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS dlang
      FROM (SELECT doc_id, {_FS_NAME} AS cname, lang FROM documents)
    ), cand AS (
      SELECT DISTINCT did, dname, dlang, cid, cname, clang
      FROM dirty d JOIN canon c
        ON substr(d.dname, 1, 4) = substr(c.cname, 1, 4)
        OR substr(d.dname, length(d.dname) - 3) =
           substr(c.cname, length(c.cname) - 3)
    ), scored AS (
      SELECT did, cid, CAST(levenshtein(dname, cname) AS BIGINT) AS dist,
             CAST((CASE WHEN levenshtein(dname, cname) <= 1
                        THEN {wa_n} ELSE {wd_n} END)
                + (CASE WHEN dlang IS NULL OR clang IS NULL THEN 0
                        WHEN dlang = clang THEN {wa_l} ELSE {wd_l} END)
                AS BIGINT) AS score_millinats
      FROM cand WHERE levenshtein(dname, cname) <= 2
    )
    SELECT did, cid, dist, score_millinats,
           score_millinats >= {_FS_THRESH} AS is_match
    FROM scored ORDER BY did, cid
    """


@register("join_linkage_scored", oracle=_fs_oracle())
def join_linkage_scored(spark, sf_dir):
    """Fellegi-Sunter probabilistic record linkage
    (``operators/joins.py::fellegi_sunter_score`` over
    ``blocked_fuzzy_join`` candidates): name agreement (levenshtein <= 1)
    and language agreement contribute integer-millinat log-likelihood
    weights; pairs above threshold classify as matches.  Scoring is pure
    map-side arithmetic on the blocked candidate frame — zero extra
    exchanges; the oracle injects the identical quantized weights."""
    from opteryx_spark.operators import joins as _joins

    docs = t(spark, sf_dir, "documents")
    name = F.concat(
        F.col("source"),
        F.lit("_rec_"),
        F.lpad(((F.col("doc_id") * 7919) % 100000).cast("string"), 5, "0"),
    )
    canon = docs.select(
        F.col("doc_id").alias("cid"), name.alias("cname"), F.col("lang").alias("clang")
    )
    dirty = docs.select(
        F.col("doc_id").alias("did"),
        name.alias("_nm"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("xx"))
        .otherwise(F.col("lang"))
        .alias("dlang"),
    ).select(
        "did",
        F.when(F.col("did") % 4 == 0, F.expr("substr(_nm, 1, 1) || substr(_nm, 3)"))
        .when(F.col("did") % 4 == 1, F.concat(F.col("_nm"), F.lit("x")))
        .when(F.col("did") % 4 == 2, F.concat(F.lit("q"), F.col("_nm")))
        .otherwise(F.col("_nm"))
        .alias("dname"),
        "dlang",
    )
    cand = _joins.blocked_fuzzy_join(dirty, canon, "dname", "cname", max_dist=2)
    cand = cand.withColumn("_name_agree", F.col("dist") <= 1).withColumn(
        "_lang_agree",
        F.when(
            F.col("dlang").isNull() | F.col("clang").isNull(), F.lit(None)
        ).otherwise(F.col("dlang") == F.col("clang")),
    )
    scored = _joins.fellegi_sunter_score(
        cand,
        [
            ("_name_agree", _FS_M_NAME, _FS_U_NAME),
            ("_lang_agree", _FS_M_LANG, _FS_U_LANG),
        ],
        threshold_millinats=_FS_THRESH,
    )
    return scored.select(
        "did", "cid", F.col("dist").cast("long").alias("dist"),
        "score_millinats", "is_match",
    ).orderBy("did", "cid")


# --- market-basket association rules ------------------------------------------------------


@register(
    "feat_basket_rules",
    oracle="""
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i FROM lineitem
    ), nb AS (SELECT count(DISTINCT b) AS n FROM bi),
    ic AS (SELECT i AS item, count(*) AS cnt FROM bi GROUP BY i),
    pairs AS (
      SELECT l.i AS item_a, r.i AS item_b, count(*) AS n_pairs
      FROM bi l JOIN bi r ON l.b = r.b AND l.i <> r.i
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(a.cnt AS BIGINT) AS n_a, CAST(bb.cnt AS BIGINT) AS n_b,
           CAST((n_pairs * 1000000) // nb.n AS BIGINT) AS support_ppm,
           CAST((n_pairs * 1000000) // a.cnt AS BIGINT) AS confidence_ppm,
           CAST((n_pairs * nb.n * 1000000) // (a.cnt * bb.cnt) AS BIGINT)
             AS lift_ppm
    FROM pairs
    JOIN ic a ON a.item = item_a
    JOIN ic bb ON bb.item = item_b
    CROSS JOIN nb
    WHERE (n_pairs * 1000000) // nb.n >= 100
    ORDER BY item_a, item_b
    """,
)
def feat_basket_rules(spark, sf_dir):
    """Market-basket association rules
    (``operators/features.py::market_basket_rules``): support/confidence/
    lift for part-category pairs co-ordered in the same order — all-ppm
    BIGINT metrics (no float thresholds), distinct (basket, item) frame
    bounds the within-basket self-join, item counts broadcast."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 50).alias("item")
    )
    return _features.market_basket_rules(
        li, "l_orderkey", "item", min_support_ppm=100
    ).orderBy("item_a", "item_b")


# --- Kaplan-Meier survival ------------------------------------------------------------------


@register(
    "events_survival_km",
    oracle="""
    WITH days AS (
      SELECT user_id AS u, CAST(ts AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), per_user AS (
      SELECT u, min(d) AS firstd, max(d) AS lastd FROM days GROUP BY u
    ), maxd AS (SELECT max(d) AS m FROM days),
    lifetimes AS (
      SELECT CAST(date_diff('day', firstd, lastd) AS BIGINT) AS t,
             CASE WHEN lastd < (SELECT m FROM maxd) - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS churn
      FROM per_user
    ), hist AS (
      SELECT t, count(*) AS n_t, CAST(sum(churn) AS BIGINT) AS n_churned
      FROM lifetimes GROUP BY t
    ), tot AS (SELECT count(*) AS total FROM lifetimes),
    curve AS (
      SELECT t, n_churned,
             tot.total - CAST(coalesce(sum(n_t) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS n_at_risk
      FROM hist CROSS JOIN tot
    ), terms AS (
      SELECT *,
             CASE WHEN n_churned < n_at_risk THEN
               CAST(floor(ln(CAST(n_at_risk - n_churned AS DOUBLE)
                             / CAST(n_at_risk AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) END AS term,
             max(CASE WHEN n_churned >= n_at_risk THEN 1 ELSE 0 END) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               = 1 AS reached_zero
      FROM curve
    )
    SELECT t AS lifetime_days, n_at_risk, n_churned,
           CASE WHEN NOT reached_zero THEN
             CAST(sum(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) END
             AS log_survival_micronats,
           reached_zero
    FROM terms ORDER BY lifetime_days
    """,
)
def events_survival_km(spark, sf_dir):
    """Kaplan-Meier churn survival
    (``operators/events.py::survival_curve``): user lifetimes with
    honest right-censoring (active within 7 days of corpus end =
    censored), KM factors as integer-micronat ln terms, the log-survival
    curve an exact BIGINT running sum; curve windows run on the
    per-lifetime frame only (<= days-of-history rows)."""
    ev = t(spark, sf_dir, "events")
    return _events.survival_curve(ev, churn_horizon_days=7).orderBy(
        "lifetime_days"
    )


# --- Benford first-digit audit ----------------------------------------------------------------


def _benford_oracle() -> str:
    exp_rows = ", ".join(
        f"({d}, {int(_math.floor(_math.log10(1.0 + 1.0 / d) * 1_000_000 + 0.5))})"
        for d in range(1, 10)
    )
    return f"""
    WITH base AS (
      SELECT CASE WHEN length(regexp_replace(
                    CAST(abs(CAST(l_extendedprice AS DOUBLE)) AS VARCHAR),
                    '[^1-9]', '', 'g')) > 0
                  THEN CAST(substring(regexp_replace(
                    CAST(abs(CAST(l_extendedprice AS DOUBLE)) AS VARCHAR),
                    '[^1-9]', '', 'g'), 1, 1) AS INTEGER) END AS d
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), counts AS (
      SELECT d AS digit, count(*) AS n FROM base WHERE d IS NOT NULL GROUP BY d
    ), tot AS (
      SELECT count(*) AS n_total, count(d) AS n_digits FROM base
    ), expected(digit, expected_ppm) AS (VALUES {exp_rows})
    SELECT e.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
           CAST((coalesce(c.n, 0) * 1000000) // tot.n_digits AS BIGINT)
             AS observed_ppm,
           CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
           abs(CAST((coalesce(c.n, 0) * 1000000) // tot.n_digits AS BIGINT)
               - e.expected_ppm) <= 30000 AS within_tolerance
    FROM expected e LEFT JOIN counts c ON c.digit = e.digit CROSS JOIN tot
    ORDER BY e.digit
    """


@register("quality_benford_audit", oracle=_benford_oracle())
def quality_benford_audit(spark, sf_dir):
    """Benford first-digit audit
    (``operators/quality.py::benford_audit``): observed vs expected
    leading-digit shares of lineitem prices in integer PPM — the classic
    organic-data anomaly screen.  The leading significant digit is
    extracted STRING-wise (first [1-9] character — invariant across
    plain and scientific float renderings, so both engines agree even
    though their double-to-string notations differ); the audit frame is
    9 rows at any corpus size."""
    from opteryx_spark.operators import quality as _quality

    li = t(spark, sf_dir, "lineitem")
    return _quality.benford_audit(
        li, "l_extendedprice", max_deviation_ppm=30_000
    ).orderBy("digit")


# --- RAKE keyphrase extraction -----------------------------------------------------------------

_RAKE_STOPS = "'the', 'a', 'of', 'to', 'and', 'in', 'is', 'it'"


@register(
    "text_rake_keyphrases",
    oracle=f"""
    WITH tok AS (
      SELECT {_O_TOKENS6} AS t FROM documents
    ), marked AS (
      SELECT list_transform(t, x -> CASE WHEN x IN ({_RAKE_STOPS})
                                         THEN chr(31) ELSE x END) AS mt
      FROM tok
    ), phr AS (
      SELECT trim(p) AS phrase
      FROM (SELECT unnest(string_split(array_to_string(mt, ' '), chr(31))) AS p
            FROM marked)
      WHERE trim(p) <> '' AND len(string_split(trim(p), ' ')) <= 4
    ), pw AS (
      SELECT phrase, len(string_split(phrase, ' ')) AS plen,
             unnest(string_split(phrase, ' ')) AS w
      FROM phr
    ), words AS (
      SELECT w, count(*) AS freq, CAST(sum(plen) AS BIGINT) AS deg
      FROM pw GROUP BY w
    ), scores AS (
      SELECT w, CAST((deg * 1000) // freq AS BIGINT) AS ws FROM words
    ), summed AS (
      SELECT phrase, CAST(sum(ws) AS BIGINT) AS raw
      FROM pw JOIN scores USING (w) GROUP BY phrase
    ), occ AS (
      SELECT phrase, count(*) AS n_occurrences FROM phr GROUP BY phrase
    )
    SELECT s.phrase, o.n_occurrences,
           CAST(raw // n_occurrences AS BIGINT) AS score_milli
    FROM summed s JOIN occ o USING (phrase)
    ORDER BY score_milli DESC, s.phrase LIMIT 50
    """,
)
def text_rake_keyphrases(spark, sf_dir):
    """RAKE keyphrase extraction
    (``operators/text.py::rake_keyphrases``): stopword-delimited
    candidate phrases scored by summed word degree/frequency — milli-
    quantized BIGINT scores, overlap-safe token-array splitting (regex
    on raw text would let adjacent stopwords swallow each other's
    boundary); map-only phrases, two word aggregates, bounded top-50."""
    docs = t(spark, sf_dir, "documents")
    return _text.rake_keyphrases(docs, top_k=50, max_phrase_words=4)


# --- weekly seasonal decomposition --------------------------------------------------------------


@register(
    "events_seasonal_residuals",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type,
             CAST(date_part('isodow', ts) - 1 AS INTEGER) AS dow,
             CAST(hour(ts) AS INTEGER) AS hour, value
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), slots AS (
      SELECT event_type, dow, hour,
             CAST(sum(CAST(value AS DECIMAL(25,8))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS seasonal,
             count(*) AS n_slot
      FROM base GROUP BY 1, 2, 3
    )
    SELECT b.event_id, b.event_type, b.dow, b.hour, b.value,
           s.seasonal, b.value - s.seasonal AS residual,
           CAST(s.n_slot AS BIGINT) AS n_slot
    FROM base b
    JOIN slots s ON s.event_type IS NOT DISTINCT FROM b.event_type
                AND s.dow = b.dow AND s.hour = b.hour
    ORDER BY b.event_id
    """,
)
def events_seasonal_residuals(spark, sf_dir):
    """Weekly seasonal-naive decomposition
    (``operators/events.py::seasonal_residuals``): exact (weekday, hour)
    slot means per event type removed from each value — the residual
    stream rate/value anomaly detection should consume.  Weekday pinned
    Monday=0 (Spark weekday == DuckDB isodow-1; the engines' default
    day numbering disagrees).  One <=|groups|*168-row aggregate
    broadcast back, map-only after."""
    ev = t(spark, sf_dir, "events")
    return _events.seasonal_residuals(ev).orderBy("event_id")


# --- product-quantization ADC ANN ----------------------------------------------------------------

_PQ_M = 8
_PQ_CODES = 16
_PQ_SUB = 8  # dims per sub-space (64 / 8)
_PQ_K = 10


def _pq_oracle(qid: int = 0) -> str:
    fold = (
        "list_reduce(list_transform(range(s.s * {sub} + 1, s.s * {sub} + {sub} + 1), "
        "i -> ({l}[i] - b.c[i]) * ({l}[i] - b.c[i])), (a, bb) -> a + bb)"
    )
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ), corp AS (
      SELECT vec_id, qv FROM q WHERE vec_id <> {qid}
    ), qry AS (
      SELECT qv FROM q WHERE vec_id = {qid}
    ), books AS (
      SELECT CAST(row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS j,
             qv AS c
      FROM (SELECT vec_id, qv FROM corp
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_PQ_CODES})
    ), subs AS (SELECT unnest(range(0, {_PQ_M})) AS s),
    enc AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT c.vec_id, s.s, b.j,
               row_number() OVER (PARTITION BY c.vec_id, s.s
                 ORDER BY {fold.format(sub=_PQ_SUB, l="c.qv")}, b.j) AS rn
        FROM corp c CROSS JOIN subs s CROSS JOIN books b)
      WHERE rn = 1
    ), qtab AS (
      SELECT s.s, b.j, {fold.format(sub=_PQ_SUB, l="y.qv")} AS d
      FROM qry y CROSS JOIN subs s CROSS JOIN books b
    ), adc AS (
      SELECT e.vec_id, CAST(sum(t.d) AS BIGINT) AS adc_dist2
      FROM enc e JOIN qtab t ON t.s = e.s AND t.j = e.code
      GROUP BY e.vec_id
    )
    SELECT CAST(row_number() OVER (ORDER BY adc_dist2, vec_id) AS BIGINT)
             AS rank, vec_id, adc_dist2
    FROM adc ORDER BY adc_dist2, vec_id LIMIT {_PQ_K}
    """


@register("emb_pq_adc_topk", oracle=_pq_oracle())
def emb_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN with asymmetric distance (Jegou et al.
    2011; ``operators/similarity.py::pq_adc_topk``) — completes the ANN
    family (brute, LSH, IVF, SQ8, PQ).  Deterministic md5-seeded
    sub-space codebooks (no Lloyd refinement ⇒ pure integer pipeline),
    argmin encoding with lower-index ties, BIGINT table-lookup ADC scan,
    bounded top-k.  The oracle re-derives codebooks, codes, the query
    distance table and the ADC sum in SQL."""
    from opteryx_spark.operators import similarity as _sim

    emb = t(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(v) for v in qrow["embedding"]]
    return _sim.pq_adc_topk(
        emb.filter(F.col("vec_id") != 0),
        qvec,
        k=_PQ_K,
        m=_PQ_M,
        n_codes=_PQ_CODES,
    ).orderBy("rank")


# --- one-hot top-k encoding -----------------------------------------------------------------------

_OH_K = 3  # documents.lang has ~4-6 values: top-3 + other exercises both paths


def _oh_oracle() -> str:
    # vocabulary re-derived with the same (count desc, value) order
    return f"""
    WITH vocab AS (
      SELECT lang, row_number() OVER (ORDER BY count(*) DESC, lang) AS r
      FROM documents WHERE lang IS NOT NULL GROUP BY lang
    ), v AS (SELECT lang FROM vocab WHERE r <= {_OH_K}),
    named AS (
      SELECT lang, r FROM vocab WHERE r <= {_OH_K}
    )
    SELECT d.doc_id,
           {", ".join(
             f"CAST(CASE WHEN d.lang IS NULL THEN NULL WHEN d.lang = "
             f"(SELECT lang FROM named WHERE r = {i}) THEN 1 ELSE 0 END AS INTEGER)"
             f" AS oh_{i}" for i in range(1, _OH_K + 1))},
           CAST(CASE WHEN d.lang IS NULL THEN NULL
                     WHEN d.lang IN (SELECT lang FROM v) THEN 0
                     ELSE 1 END AS INTEGER) AS oh_other
    FROM documents d ORDER BY d.doc_id
    """


@register("feat_one_hot_lang", oracle=_oh_oracle())
def feat_one_hot_lang(spark, sf_dir):
    """Bounded one-hot encoding (``operators/features.py::one_hot_top_k``):
    top-3 languages by exact count (ties to the lexically smaller value)
    plus an OTHER bucket; NULL category is NULL across all indicators.
    The vocabulary is a bounded k-row driver probe; the encode is pure
    map-side codegen.  Oracle columns are positional (oh_1..oh_3) since
    the vocabulary VALUES are data-derived — the Spark side renames its
    value-named columns to the same positional names."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = _features.one_hot_top_k(docs, "lang", k=_OH_K, id_cols=["doc_id"])
    oh_cols = [c for c in out.columns if c.startswith("oh_") and c != "oh_other"]
    renamed = out
    for i, c in enumerate(oh_cols, start=1):
        renamed = renamed.withColumnRenamed(c, f"oh_{i}")
    return renamed.orderBy("doc_id")


# --- new vs returning users --------------------------------------------------------------------


@register(
    "events_new_vs_returning",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), firstd AS (
      SELECT u, min(d) AS f FROM ud GROUP BY u
    ), flagged AS (
      SELECT ud.d AS day, CASE WHEN ud.d = firstd.f THEN 1 ELSE 0 END AS nw
      FROM ud JOIN firstd ON firstd.u = ud.u
    )
    SELECT day, CAST(sum(nw) AS BIGINT) AS n_new,
           CAST(count(*) - sum(nw) AS BIGINT) AS n_returning,
           CAST((CAST(sum(nw) AS BIGINT) * 1000000) // count(*) AS BIGINT)
             AS new_share_ppm
    FROM flagged GROUP BY day ORDER BY day
    """,
)
def events_new_vs_returning(spark, sf_dir):
    """Daily new-vs-returning actives
    (``operators/events.py::new_vs_returning``): first-active-day split
    with an exact ppm share — one distinct user-day frame, one per-user
    MIN, one per-day count split."""
    ev = t(spark, sf_dir, "events")
    return _events.new_vs_returning(ev).orderBy("day")


# --- funnel stage-to-stage conversion rates --------------------------------------------------------


@register(
    "events_funnel_rates",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), lagged AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL
                      OR us - lag(us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS newflag
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT *, CAST(SUM(newflag) OVER (PARTITION BY user_id
                  ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
      FROM lagged
    ), per AS (
      SELECT user_id, session_id,
             min(CASE WHEN event_type = 'view' THEN us END) AS t0,
             min(CASE WHEN event_type = 'click' THEN us END) AS t1,
             min(CASE WHEN event_type = 'purchase' THEN us END) AS t2
      FROM sess GROUP BY 1, 2
    ), depths AS (
      SELECT CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                   AND t2 IS NOT NULL AND t2 > t1 THEN 3
                  WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0 THEN 2
                  WHEN t0 IS NOT NULL THEN 1
                  ELSE 0 END AS depth
      FROM per
    ), reach AS (
      SELECT 1 AS stage_idx, 'view' AS stage,
             count(CASE WHEN depth >= 1 THEN 1 END) AS n_reached,
             count(*) AS n_prev
      FROM depths
      UNION ALL
      SELECT 2, 'click', count(CASE WHEN depth >= 2 THEN 1 END),
             count(CASE WHEN depth >= 1 THEN 1 END) FROM depths
      UNION ALL
      SELECT 3, 'purchase', count(CASE WHEN depth >= 3 THEN 1 END),
             count(CASE WHEN depth >= 2 THEN 1 END) FROM depths
    )
    SELECT stage_idx, stage, CAST(n_reached AS BIGINT) AS n_reached,
           CASE WHEN n_prev > 0
                THEN CAST((n_reached * 1000000) // n_prev AS BIGINT)
                ELSE CAST(NULL AS BIGINT) END AS conversion_ppm
    FROM reach ORDER BY stage_idx
    """,
)
def events_funnel_rates(spark, sf_dir):
    """Stage-to-stage funnel conversion rates: the session-funnel depths
    (``operators/events.py::session_funnel`` semantics — first-touch
    strictly-increasing ordering inside 30-min sessions) reduced to
    per-stage reach and conversion ppm from the previous stage (stage 1
    converts from ALL sessions).  The whole rate table is one aggregate
    over the per-session depth frame."""
    from opteryx_spark.operators import events as _ev

    ev = t(spark, sf_dir, "events")
    per = (
        _ev.assign_sessions(ev)
        .groupBy("user_id", "session_id")
        .agg(
            *[
                F.min(F.when(F.col("event_type") == s, F.col("_us"))).alias(f"_t{i}")
                for i, s in enumerate(("view", "click", "purchase"))
            ]
        )
    )
    d1 = F.col("_t0").isNotNull()
    d2 = d1 & F.col("_t1").isNotNull() & (F.col("_t1") > F.col("_t0"))
    d3 = d2 & F.col("_t2").isNotNull() & (F.col("_t2") > F.col("_t1"))
    depths = per.select(
        F.when(d3, F.lit(3)).when(d2, F.lit(2)).when(d1, F.lit(1)).otherwise(F.lit(0)).alias("depth")
    )
    agg = depths.agg(
        F.count(F.lit(1)).alias("_all"),
        F.count(F.when(F.col("depth") >= 1, F.lit(1))).alias("_r1"),
        F.count(F.when(F.col("depth") >= 2, F.lit(1))).alias("_r2"),
        F.count(F.when(F.col("depth") >= 3, F.lit(1))).alias("_r3"),
    )
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(s).alias("stage"),
            F.col(f"_r{i}").alias("n_reached"),
            F.when(
                F.col(prev) > 0,
                F.expr(f"CAST((_r{i} * 1000000) div {prev} AS BIGINT)"),
            ).alias("conversion_ppm"),
        )
        for i, s, prev in [(1, "view", "_all"), (2, "click", "_r1"), (3, "purchase", "_r2")]
    ]
    return agg.select(F.explode(F.array(*rows)).alias("_p")).select(
        "_p.stage_idx", "_p.stage", "_p.n_reached", "_p.conversion_ppm"
    ).orderBy("stage_idx")


# --- freshness SLA + encoding hygiene ------------------------------------------------------------

_FRESH_AS_OF = 1_706_000_000_000_000  # fixed reference instant (2024-01-23)
_FRESH_LAG_MIN = 10 * 24 * 60


@register(
    "quality_freshness",
    oracle=f"""
    SELECT event_type, count(*) AS n_rows,
           CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
           {_FRESH_AS_OF} - CAST(max(epoch_us(ts)) AS BIGINT) AS lag_us,
           coalesce({_FRESH_AS_OF} - CAST(max(epoch_us(ts)) AS BIGINT)
                    <= {_FRESH_LAG_MIN * 60 * 1000000}, FALSE) AS is_fresh
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def quality_freshness(spark, sf_dir):
    """Data-freshness SLA check (``operators/quality.py::freshness_check``):
    per-source last-row lag against an EXPLICIT reference instant
    (deterministic and replayable, unlike now()) — one aggregate, the
    ingestion monitor's first question."""
    from opteryx_spark.operators import quality as _quality

    ev = t(spark, sf_dir, "events")
    return _quality.freshness_check(
        ev, "ts", as_of_us=_FRESH_AS_OF, max_lag_minutes=_FRESH_LAG_MIN,
        group_col="event_type",
    ).orderBy("event_type")


_MOJI_FIX = (
    "text || CASE doc_id % 4 WHEN 0 THEN ' Ã©tÃ©' WHEN 1 THEN ' â€œqâ€'"
    " WHEN 2 THEN ' �bad' ELSE '' END"
)


@register(
    "text_encoding_issues",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_MOJI_FIX} AS text FROM documents)
    SELECT doc_id,
           CAST((length(text) - length(replace(text, '�', '')))
              + (length(text) - length(replace(text, 'Ã', '')))
              + (length(text) - length(replace(text, 'Â', '')))
              + (length(text) - length(replace(text, 'â€', ''))) / 2
              AS BIGINT) AS n_issues,
           coalesce(CAST((length(text) - length(replace(text, '�', '')))
              + (length(text) - length(replace(text, 'Ã', '')))
              + (length(text) - length(replace(text, 'Â', '')))
              + (length(text) - length(replace(text, 'â€', ''))) / 2
              AS BIGINT) = 0, FALSE) AS is_clean
    FROM raw ORDER BY doc_id
    """,
)
def text_encoding_issues(spark, sf_dir):
    """Mojibake detection (``operators/text.py::encoding_issues``):
    count of encoding-damage markers (U+FFFD, double-encode leads,
    mangled curly-quote artifacts) planted deterministically on the
    fixture — pure length/replace arithmetic, map-only, the crawl
    hygiene gate that precedes every text pipeline."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_MOJI_FIX).alias("text")
    )
    n = _text.encoding_issues("text")
    return docs.select(
        "doc_id",
        n.alias("n_issues"),
        F.coalesce(n == 0, F.lit(False)).alias("is_clean"),
    ).orderBy("doc_id")


# --- n-gram novelty (duplication growth) ------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_O_TOKENS6} AS tk FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, coalesce(len(tk), 1) - 1),
               i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS g
      FROM tok
    ), firstd AS (
      SELECT g, min(doc_id) AS f FROM grams GROUP BY g
    ), per AS (
      SELECT grams.doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN grams.doc_id = firstd.f THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM grams JOIN firstd USING (g) GROUP BY grams.doc_id
    )
    SELECT d.doc_id,
           coalesce(per.n_grams, 0) AS n_grams,
           coalesce(per.n_novel, 0) AS n_novel,
           CASE WHEN coalesce(per.n_grams, 0) > 0
                THEN CAST((per.n_novel * 1000000) // per.n_grams AS BIGINT) END
             AS novelty_ppm
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document trigram novelty in corpus id order
    (``operators/text.py::ngram_novelty``): the fraction of a doc's
    distinct 3-grams first seen in THIS document — the duplication-
    growth curve dedup economics are argued from (Lee et al. 2021).
    One explode + one MIN-keeper aggregate + one join back; no windows,
    no self-join."""
    docs = t(spark, sf_dir, "documents")
    return _text.ngram_novelty(docs, k=3).orderBy("doc_id")


# --- peak concurrent sessions ------------------------------------------------------------------------


@register(
    "events_peak_concurrency",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), lagged AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL
                      OR us - lag(us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS newflag
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT *, CAST(SUM(newflag) OVER (PARTITION BY user_id
                  ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
      FROM lagged
    ), per AS (
      SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
      FROM sess GROUP BY 1, 2
    ), deltas AS (
      SELECT CAST(make_timestamp(s_us) AS DATE) AS day, s_us AS us,
             1 AS delta, user_id, session_id
      FROM per
      UNION ALL
      SELECT CAST(make_timestamp(s_us) AS DATE), e_us + 1, -1, user_id,
             session_id
      FROM per
    ), running AS (
      SELECT day, SUM(delta) OVER (PARTITION BY day
               ORDER BY us, delta DESC, user_id, session_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
      FROM deltas
    )
    SELECT day, CAST(max(cur) AS BIGINT) AS peak_concurrent,
           CAST(count(*) // 2 AS BIGINT) AS n_sessions
    FROM running GROUP BY day ORDER BY day
    """,
)
def events_peak_concurrency(spark, sf_dir):
    """Peak concurrent sessions per day
    (``operators/events.py::peak_concurrency``): the sweep-line count —
    +1 at session start, -1 after end, running sum, MAX per day; ties
    count the START first (the conservative capacity answer).  The
    sweep runs over session BOUNDARY rows (2 per session, << events)
    partitioned by day."""
    ev = t(spark, sf_dir, "events")
    return _events.peak_concurrency(ev, gap_minutes=30).orderBy("day")


# --- forecasting lag features ---------------------------------------------------------------------------


@register(
    "feat_lag_features",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, value
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT event_id, user_id, value,
           lag(value, 1) OVER w AS lag_1,
           value - lag(value, 1) OVER w AS delta_1,
           lag(value, 7) OVER w AS lag_7,
           value - lag(value, 7) OVER w AS delta_7
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ORDER BY event_id
    """,
)
def feat_lag_features(spark, sf_dir):
    """Forecasting lag features (``operators/features.py::lag_features``):
    per-user lag-1 and lag-7 values + deltas from ONE shared window sort;
    too-early rows stay NULL (zero would be a lie)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("event_id", "user_id", "ts", "value")
    out = _features.lag_features(
        ev, "user_id", "ts", "value", lags=[1, 7], order_col="event_id"
    )
    return out.select(
        "event_id", "user_id", "value", "lag_1", "delta_1", "lag_7", "delta_7"
    ).orderBy("event_id")
