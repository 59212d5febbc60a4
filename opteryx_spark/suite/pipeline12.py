"""Suite wave 33 (round 8): iterative/relational algorithm surface —
label-propagation communities, rolling-median detrend, Markov
stationary distribution by integer power iteration, leakage-safe
(leave-fold-out) target encoding, and the deterministic epoch shuffle —
registered after ``pipeline11`` (tier-1b order; r8 new-entry total
19 + 5 = 24, under the 35 cap)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opteryx_spark.operators import events as _events
from opteryx_spark.operators import features as _features
from opteryx_spark.operators import timeseries as _ts
from opteryx_spark.operators import web as _web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t
from opteryx_spark.suite.pipeline8 import _O_DAILY, _O_KC_EDGES, _daily_counts
from opteryx_spark.suite.pipeline9 import _kc_edges

# --- label-propagation communities ----------------------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    parts = [
        f"""WITH e AS MATERIALIZED ({_O_KC_EDGES}),
    nb AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b AS node, a AS nbr FROM e
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT node, node AS community FROM nb)"""
    ]
    for r in range(_LPA_ROUNDS):
        parts.append(
            f""",
    c{r} AS MATERIALIZED (
      SELECT nb.node, l.community AS nl, count(*) AS c
      FROM nb JOIN l{r} l ON l.node = nb.nbr
      GROUP BY nb.node, l.community
    ),
    l{r + 1} AS MATERIALIZED (
      SELECT node, nl AS community FROM (
        SELECT node, nl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, nl ASC) AS rn
        FROM c{r}
      ) WHERE rn = 1
    )"""
        )
    parts.append(
        f"""
    SELECT node, community FROM l{_LPA_ROUNDS} ORDER BY node"""
    )
    return "".join(parts)


@register("graph_label_communities", oracle=_lpa_oracle())
def graph_label_communities(spark, sf_dir):
    """Synchronous label-propagation communities (Raghavan 2007;
    ``operators/web.py::label_communities``) over the doc-id graph:
    each round one label join on the static neighbor list + one
    ``min(struct(-count, label))`` keeper, ties to the smallest label,
    fixed {_LPA_ROUNDS} rounds so the oracle unrolls identically;
    lineage re-rooted per round with eager superseded release."""
    return _web.label_communities(
        _kc_edges(spark, sf_dir), rounds=_LPA_ROUNDS
    ).orderBy("node")


# --- rolling-median detrend -----------------------------------------------------

_RMD_HW = 3


@register(
    "ts_rolling_median_detrend",
    oracle=f"""
    WITH daily AS ({_O_DAILY})
    SELECT event_type, d, cnt,
           quantile_cont(cnt, 0.5) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS BETWEEN {_RMD_HW} PRECEDING AND {_RMD_HW} FOLLOWING) AS rolling_med,
           CAST(cnt AS DOUBLE) - quantile_cont(cnt, 0.5) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS BETWEEN {_RMD_HW} PRECEDING AND {_RMD_HW} FOLLOWING) AS residual
    FROM daily ORDER BY event_type, d
    """,
)
def ts_rolling_median_detrend(spark, sf_dir):
    """Rolling-median detrend of the per-type daily series
    (``operators/timeseries.py::rolling_median_detrend``): exact
    interpolated median over a ±{_RMD_HW}-row moving frame (the
    outlier-robust trend level) and the residual anomaly screens
    should consume — ONE key-partitioned window, no joins."""
    return _ts.rolling_median_detrend(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
        half_window=_RMD_HW,
    ).orderBy("event_type", "d")


# --- Markov stationary distribution ---------------------------------------------

_MK_ROUNDS = 8


def _markov_oracle() -> str:
    parts = [
        """WITH b AS MATERIALIZED (
      SELECT user_id, epoch_us(ts) AS tu, event_id,
             coalesce(CAST(event_type AS VARCHAR), '∅') AS et
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
    ),
    pr AS MATERIALIZED (
      SELECT et AS fi, lead(et, 1) OVER (PARTITION BY user_id
                                         ORDER BY tu, event_id) AS tj
      FROM b
    ),
    cnts AS MATERIALIZED (
      SELECT fi, tj, CAST(count(*) AS BIGINT) AS c
      FROM pr WHERE tj IS NOT NULL GROUP BY fi, tj
    ),
    p AS MATERIALIZED (
      SELECT fi, tj,
             (c * 1000000) // CAST(sum(c) OVER (PARTITION BY fi) AS BIGINT) AS p_ppm
      FROM cnts
    ),
    st AS MATERIALIZED (
      SELECT DISTINCT state FROM (
        SELECT fi AS state FROM cnts UNION ALL SELECT tj FROM cnts
      )
    ),
    v0 AS MATERIALIZED (
      SELECT state,
             CAST(1000000 AS BIGINT) // (SELECT count(*) FROM st) AS v
      FROM st
    )"""
    ]
    for r in range(_MK_ROUNDS):
        parts.append(
            f""",
    v{r + 1} AS MATERIALIZED (
      SELECT p.tj AS state,
             CAST(sum((v.v * p.p_ppm) // 1000000) AS BIGINT) AS v
      FROM p JOIN v{r} v ON v.state = p.fi
      GROUP BY p.tj
    )"""
        )
    parts.append(
        f"""
    SELECT state, v AS stationary_ppm FROM v{_MK_ROUNDS} ORDER BY state"""
    )
    return "".join(parts)


@register("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type transition chain
    (``operators/events.py::markov_stationary``): transition counts
    from one user-partitioned lead window, truncating-ppm row
    normalization, {_MK_ROUNDS} integer power-iteration rounds over
    state-count-sized frames — "where does user behavior settle", the
    behavioral PageRank, every intermediate a BIGINT."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    et = F.coalesce(F.col("event_type").cast("string"), F.lit("∅"))
    w = Window.partitionBy("user_id").orderBy(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))"), F.col("event_id")
    )
    pairs = ev.select(et.alias("fi"), F.lead(et, 1).over(w).alias("tj")).filter(
        F.col("tj").isNotNull()
    )
    counts = pairs.groupBy("fi", "tj").agg(F.count(F.lit(1)).alias("c"))
    return _events.markov_stationary(
        counts, "fi", "tj", "c", rounds=_MK_ROUNDS
    ).orderBy("state")


# --- leave-fold-out target encoding ---------------------------------------------

_TE_M = 10


@register(
    "feat_target_encode_loo",
    oracle=f"""
    WITH b AS (
      SELECT event_id, event_type, event_id % 5 AS fold, value FROM events
    ),
    stats AS (
      SELECT event_type, fold,
             CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS s_cf,
             CAST(count(value) AS BIGINT) AS n_cf
      FROM b WHERE event_type IS NOT NULL AND fold IS NOT NULL
      GROUP BY event_type, fold
    ),
    stats2 AS (
      SELECT *, CAST(sum(s_cf) OVER (PARTITION BY event_type) AS BIGINT) AS s_c,
             CAST(sum(n_cf) OVER (PARTITION BY event_type) AS BIGINT) AS n_c
      FROM stats
    ),
    g AS (
      SELECT CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS s_all,
             CAST(count(value) AS BIGINT) AS n_all
      FROM b
    )
    SELECT b.event_id, b.event_type, b.fold, b.value,
           CASE WHEN b.event_type IS NOT NULL AND b.fold IS NOT NULL
                 AND s.n_c IS NOT NULL THEN
             (CAST(s.s_c - s.s_cf AS DOUBLE) / 10000.0
              + {float(_TE_M)} * (CAST(g.s_all AS DOUBLE) / 10000.0
                                  / CAST(g.n_all AS DOUBLE)))
             / CAST((s.n_c - s.n_cf) + {_TE_M} AS DOUBLE)
           END AS enc
    FROM b LEFT JOIN stats2 s
      ON s.event_type = b.event_type AND s.fold = b.fold, g
    ORDER BY b.event_id
    """,
)
def feat_target_encode_loo(spark, sf_dir):
    """Leakage-safe leave-fold-out target encoding
    (``operators/features.py::target_encode_loo``): each row's
    category encoding excludes its OWN fold's statistics — the
    cross-validated variant training pipelines must use; fixed-point
    BIGINT target sums (the q1 idiom), one (cat, fold) groupBy with
    the per-category totals recovered by a window SUM on the same
    partitioning."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("event_id") % 5).alias("fold"),
        "value",
    )
    return _features.target_encode_loo(
        ev, "event_type", "value", "fold", m=_TE_M
    ).orderBy("event_id")


# --- deterministic epoch shuffle ------------------------------------------------

_ES_SEED = "r8seed"
_ES_EPOCH = 1
_ES_SHARDS = 8

_O_ES_BUCKET = f"""
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, 9), i ->
        CAST(strpos('0123456789abcdef', substring(k, i, 1)) - 1 AS BIGINT))),
      (a, c) -> a * 16 + c)
"""


@register(
    "sample_epoch_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5('{_ES_SEED}' || ':' || '{_ES_EPOCH}'
                 || ':' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents WHERE doc_id IS NOT NULL
    ),
    s AS (SELECT doc_id, k, {_O_ES_BUCKET} % {_ES_SHARDS} AS shard FROM h)
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM s ORDER BY doc_id
    """,
)
def sample_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle (``operators/scale.py::
    epoch_shuffle``): shard + in-shard position as a pure function of
    (seed, epoch, id) — reproducible training-data order across
    reruns, resumes, and clusters; different every epoch.  Same md5
    machinery as ``split_assign``, one shard-partitioned window."""
    from opteryx_spark.operators import scale as _scale

    d = t(spark, sf_dir, "documents")
    return _scale.epoch_shuffle(
        d, "doc_id", _ES_SEED, _ES_EPOCH, _ES_SHARDS
    ).orderBy("doc_id")
