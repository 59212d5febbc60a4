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
    map-only fold, each greedy step is one bounded 1-row probe (the
    k-means centroid pattern).  The oracle unrolls the 5 steps as CTEs."""
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
