"""Suite wave 38 (round 9): personalized PageRank, additive
Holt-Winters, Matryoshka prefix-dim recall, chi-square token screening,
forward as-of join, and data-constrained epoch upsampling — six gaps a
training-data platform still had after waves 1-37 (seed-relative
authority, seasonal forecasting, the MRL dimension-axis eval, classifier
feature selection, next-event lookup, and the repeat-epochs mixture
recipe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import features as _features
from opteryx_spark.operators import filtering as _filtering
from opteryx_spark.operators import joins as _joins
from opteryx_spark.operators import similarity as _similarity
from opteryx_spark.operators import timeseries as _ts
from opteryx_spark.operators import web as _web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t
from opteryx_spark.suite.pipeline8 import _O_DAILY, _daily_counts
from opteryx_spark.suite.pipeline9 import _kc_edges
from opteryx_spark.suite.pipeline14 import _O_KC_DIRECTED

# --- personalized PageRank ----------------------------------------------------------

_PPR_ITERS = 3
_PPR_SEEDS = 5
_PPR_SCALE = 1_000_000_000


def _ppr_oracle() -> str:
    """Unrolled personalized PageRank: the web_domain_pagerank recipe
    with teleport + dangling mass restricted to the seed set.  Every
    quantity is non-negative, so DuckDB ``//`` == Spark ``div``."""
    head = f"""
    WITH e AS MATERIALIZED ({_O_KC_DIRECTED}),
    n0 AS (SELECT DISTINCT node FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)),
    sd AS (SELECT range AS node FROM range({_PPR_SEEDS})),
    f AS (
      SELECT n0.node, CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS is_seed
      FROM n0 LEFT JOIN sd ON sd.node = n0.node
    ),
    ns AS (SELECT CAST(sum(is_seed) AS BIGINT) AS ns FROM f),
    od AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY s),
    r0 AS (
      SELECT f.node, f.is_seed, coalesce(od.deg, 0) AS deg, ns.ns,
             is_seed * ({_PPR_SCALE} // ns.ns) AS rank
      FROM f LEFT JOIN od USING (node) CROSS JOIN ns)
    """
    iters = []
    for i in range(1, _PPR_ITERS + 1):
        p = f"r{i - 1}"
        iters.append(
            f"""
    , dang{i} AS (SELECT coalesce(sum(rank), 0) AS dm FROM {p} WHERE deg = 0)
    , inc{i} AS (
        SELECT e.d AS node, sum(r.rank // r.deg) AS inc
        FROM e JOIN {p} r ON r.node = e.s GROUP BY e.d)
    , r{i} AS (
        SELECT p.node, p.is_seed, p.deg, p.ns,
               CAST(p.is_seed * ((15 * ({_PPR_SCALE} // p.ns)) // 100)
               + ((85 * (coalesce(i.inc, 0) + p.is_seed * (d.dm // p.ns))) // 100)
                 AS BIGINT) AS rank
        FROM {p} p LEFT JOIN inc{i} i USING (node) CROSS JOIN dang{i} d)
    """
        )
    return (
        head
        + "".join(iters)
        + f"SELECT node, rank FROM r{_PPR_ITERS} ORDER BY node"
    )


@register("graph_personalized_pagerank", oracle=_ppr_oracle())
def graph_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (Jeh & Widom 2003;
    ``operators/web.py::personalized_pagerank``) over the directed
    doc-id graph with a {s}-node seed frontier: teleport and dangling
    mass land on the SEEDS only, so ranks measure random-walk proximity
    to the trusted set (the TrustRank-style crawl-frontier signal a
    global rank cannot give).  Same BIGINT truncating loop as
    web_domain_pagerank — per round one src join + one dst SUM, seed
    frame broadcast, lineage re-rooted per round."""
    seeds = spark.range(_PPR_SEEDS).select(F.col("id").alias("node"))
    # simple directed graph, like the oracle's DISTINCT s <> d edge CTE
    # (personalized_pagerank, like pagerank, takes the edge list as-is)
    edges = (
        _kc_edges(spark, sf_dir).filter(F.col("src") != F.col("dst")).distinct()
    )
    return _web.personalized_pagerank(
        edges,
        seeds,
        iterations=_PPR_ITERS,
        scale=_PPR_SCALE,
    ).orderBy("node")


graph_personalized_pagerank.__doc__ = graph_personalized_pagerank.__doc__.format(
    s=_PPR_SEEDS
)

# --- additive Holt-Winters ----------------------------------------------------------

_HW_PERIOD = 7


def _hw_oracle() -> str:
    m = _HW_PERIOD
    qy = "s.cnt * 1000"
    lv = f"(({qy}) - r.s1 + r.l + r.b) // 2"
    shift_keep = ", ".join(f"r.s{j + 1} AS s{j}" for j in range(1, m))
    zeros = ", ".join(f"CAST(0 AS BIGINT) AS s{j}" for j in range(1, m + 1))
    return f"""
    WITH RECURSIVE sidx AS (
      SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
             cnt
      FROM ({_O_DAILY})
    ),
    rec AS (
      SELECT event_type, i, cnt * 1000 AS l, CAST(0 AS BIGINT) AS b, {zeros}
      FROM sidx WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i,
             {lv} AS l,
             ((({lv}) - r.l) + r.b) // 2 AS b,
             {shift_keep},
             ((({qy}) - ({lv})) + r.s1) // 2 AS s{m}
      FROM rec r JOIN sidx s ON s.event_type = r.event_type AND s.i = r.i + 1
    )
    SELECT event_type, CAST(max(i) AS BIGINT) AS n_points,
           arg_max(l, i) AS level_q, arg_max(b, i) AS trend_q,
           arg_max(s1, i) AS season_next_q,
           arg_max(l, i) + arg_max(b, i) + arg_max(s1, i) AS forecast_next_q
    FROM rec GROUP BY event_type ORDER BY event_type
    """


@register("ts_holt_winters", oracle=_hw_oracle())
def ts_holt_winters(spark, sf_dir):
    """Additive Holt-Winters over the per-type daily series
    (``operators/timeseries.py::holt_winters``; period = {m}):
    alpha = beta = gamma = 1/2, every update an exact truncating BIGINT
    halving, the seasonal state a {m}-slot ring carried through ONE
    ``F.aggregate`` fold per key; the oracle replays the recurrence as
    a recursive CTE with the ring unrolled into {m} shifting columns.
    Level + trend + next-phase seasonal + one-step forecast,
    milli-scaled."""
    return _ts.holt_winters(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
        period=_HW_PERIOD,
        qscale=1000,
    ).orderBy("event_type")


ts_holt_winters.__doc__ = ts_holt_winters.__doc__.format(m=_HW_PERIOD)

# --- Matryoshka prefix-dimension recall ----------------------------------------------

_MR_K = 10
_MR_QMOD = 100
_MR_PREFIX = 16


def _matryoshka_oracle() -> str:
    full = "list_reduce(list_transform(range(1, len(q.qm)+1), i -> q.qm[i] * c.qm[i]), (x, y) -> x + y)"
    pref = (
        f"list_reduce(list_transform(range(1, {_MR_PREFIX}+1), "
        "i -> q.qm[i] * c.qm[i]), (x, y) -> x + y)"
    )
    return f"""
    WITH p AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qm
      FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    ),
    pairs AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS c_id,
             {full} AS sf, {pref} AS sp
      FROM p q, p c
      WHERE q.vec_id % {_MR_QMOD} = 0 AND c.vec_id % {_MR_QMOD} <> 0
    ),
    r AS (
      SELECT query_id, c_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sf DESC, c_id) AS rf,
             row_number() OVER (PARTITION BY query_id ORDER BY sp DESC, c_id) AS rp
      FROM pairs
    )
    SELECT query_id,
           CAST(sum(CASE WHEN rf <= {_MR_K} AND rp <= {_MR_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           (CAST(sum(CASE WHEN rf <= {_MR_K} AND rp <= {_MR_K} THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000) // {_MR_K} AS recall_ppm
    FROM r GROUP BY query_id ORDER BY query_id
    """


@register("emb_matryoshka_recall", oracle=_matryoshka_oracle())
def emb_matryoshka_recall(spark, sf_dir):
    """Recall@{k} of first-{p}-dimension scoring vs full-dimension
    scoring (``operators/similarity.py::matryoshka_recall``) over a
    ``vec_id % {m} = 0`` query panel — the Matryoshka (MRL) eval: can a
    4x-smaller prefix index serve the same top-k?  Both rankings
    exact-integer milli-quantized dot products with id tie-breaks;
    query panel broadcast, ONE map pass computes both scores, two
    windows, no corpus all-pairs.  The dimension-axis counterpart to
    emb_quantization_recall's precision axis."""
    emb = t(spark, sf_dir, "embeddings")
    return _similarity.matryoshka_recall(
        emb.filter(F.col("vec_id") % _MR_QMOD == 0),
        emb.filter(F.col("vec_id") % _MR_QMOD != 0),
        k=_MR_K,
        prefix_dims=_MR_PREFIX,
        qscale=1000,
    ).orderBy("query_id")


emb_matryoshka_recall.__doc__ = emb_matryoshka_recall.__doc__.format(
    k=_MR_K, p=_MR_PREFIX, m=_MR_QMOD
)

# --- chi-square token screening -------------------------------------------------------

_X2_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"
_X2_MIN_DF = 5
_X2_K = 25


def _chi2_oracle() -> str:
    # the operator's numerator is a*d - b*c with a=pos_docs, b=neg_docs,
    # c=pos-absent (_c), d=neg-absent (_d) — mirror the EXACT expression
    # tree so the double is bit-identical
    num = (
        "(CAST(pos_docs AS DOUBLE) * CAST(_d AS DOUBLE)"
        " - CAST(neg_docs AS DOUBLE) * CAST(_c AS DOUBLE))"
    )
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             {_X2_TOKENS} AS tks
      FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
    ),
    tot AS (SELECT CAST(sum(y) AS BIGINT) AS n1,
                   CAST(count(*) - sum(y) AS BIGINT) AS n0 FROM base),
    pres AS (
      SELECT doc_id, token, max(y) AS y
      FROM (SELECT doc_id, y, unnest(tks) AS token FROM base)
      GROUP BY doc_id, token
    ),
    cnt AS (
      SELECT token, CAST(sum(y) AS BIGINT) AS pos_docs,
             CAST(count(*) - sum(y) AS BIGINT) AS neg_docs
      FROM pres GROUP BY token
    ),
    tab AS (
      SELECT token, pos_docs + neg_docs AS n_docs, pos_docs, neg_docs,
             tot.n1 - pos_docs AS _c, tot.n0 - neg_docs AS _d,
             tot.n1, tot.n0
      FROM cnt CROSS JOIN tot
      WHERE pos_docs + neg_docs >= {_X2_MIN_DF}
    )
    SELECT token, n_docs, pos_docs, neg_docs,
           CASE WHEN (pos_docs + neg_docs) > 0 AND (_c + _d) > 0
                 AND (pos_docs + _c) > 0 AND (neg_docs + _d) > 0 THEN
             (CAST(n1 + n0 AS DOUBLE) * {num} * {num}) /
             (CAST(pos_docs + neg_docs AS DOUBLE) * CAST(_c + _d AS DOUBLE)
              * CAST(pos_docs + _c AS DOUBLE) * CAST(neg_docs + _d AS DOUBLE))
           END AS chi2,
           CASE WHEN pos_docs * _d > neg_docs * _c THEN 'pos' ELSE 'neg' END AS assoc
    FROM tab
    ORDER BY chi2 DESC NULLS LAST, token LIMIT {_X2_K}
    """


@register("feat_chi2_screen", oracle=_chi2_oracle())
def feat_chi2_screen(spark, sf_dir):
    """Chi-square token screening against the ``lang = 'en'`` label
    (``operators/features.py::chi2_screen``) — the SelectKBest step of
    building a corpus classifier: doc-level presence 2x2 tables in
    exact BIGINTs, chi2 as ONE fixed float expression over them (the
    ab_test_z convention — a BIGINT form overflows at (ad-bc)^2), top
    {k} by (chi2 DESC, token).  One explode + presence groupBy + token
    groupBy, label totals broadcast, TakeOrdered tail."""
    from opteryx_spark.operators.text import tokens as _tokens

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull() & F.col("text").isNotNull())
        .select(
            (F.col("lang") == "en").cast("int").alias("label"),
            _tokens("text").alias("tokens"),
        )
    )
    return _features.chi2_screen(
        docs, tokens_col="tokens", label_col="label", min_df=_X2_MIN_DF, top_k=_X2_K
    )


feat_chi2_screen.__doc__ = feat_chi2_screen.__doc__.format(k=_X2_K)

# --- forward as-of join ----------------------------------------------------------------


@register(
    "join_asof_forward",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'click'
    ),
    r AS (
      SELECT event_id AS rid, user_id, epoch_us(ts) AS rt, value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    cand AS (
      SELECT l.event_id, r.rid, r.rt, r.value
      FROM l JOIN r ON r.user_id = l.user_id AND r.rt >= l.t
    ),
    pick AS (
      SELECT event_id, rid, rt, value,
             row_number() OVER (PARTITION BY event_id ORDER BY rt, rid) AS rn
      FROM cand
    )
    SELECT l.user_id, l.event_id, l.t,
           p.rt AS t_r, p.rid AS matched_rid, p.value AS matched_value
    FROM l LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p USING (event_id)
    ORDER BY l.event_id
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of join (``operators/joins.py::asof_join_forward``):
    each click matched to the EARLIEST same-user purchase at or after
    it — pandas ``merge_asof(direction='forward')``, the next-event
    lookup.  ONE key-partitioned descending window over the unioned
    sides (right rows first at equal timestamps so ties match) — no
    range join, no per-row probe; the oracle replays it as the
    min-(rt, rid) candidate keeper."""
    ev = t(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", us.alias("t")
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("matched_rid"),
        "user_id",
        us.alias("t"),
        F.col("value").alias("matched_value"),
    )
    # right rows must be unique per (user, t) for determinism: collapse
    # same-timestamp purchases to the keeper the oracle picks (min rid,
    # with its value)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "t").orderBy("matched_rid")
    right = (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        _joins.asof_join_forward(left, right, on="t", by=["user_id"])
        .select("user_id", "event_id", "t", "t_r", "matched_rid", "matched_value")
        .orderBy("event_id")
    )


# --- data-constrained epoch upsampling --------------------------------------------------

_EU_TARGETS = {"en": 2_000, "de": 30_000, "es": 8_000}


def _epochs_oracle() -> str:
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(_EU_TARGETS.items())
    )
    return f"""
    WITH rows_ AS (
      SELECT doc_id, lang,
             CASE WHEN text IS NULL THEN 0
                  ELSE len(list_filter(string_split(text, ' '), x -> x <> '')) END
               AS n_tokens,
             CASE {cases} ELSE 0 END AS target_tokens
      FROM documents WHERE doc_id IS NOT NULL
    ),
    cum AS (
      SELECT *, CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tokens_before,
             CAST(sum(n_tokens) OVER (PARTITION BY lang) AS BIGINT) AS avail
      FROM rows_
    ),
    staged AS (
      SELECT doc_id, lang, n_tokens,
             CASE WHEN avail > 0 THEN target_tokens // avail ELSE 0 END AS full_epochs,
             CASE WHEN tokens_before + n_tokens
                    <= target_tokens
                       - (CASE WHEN avail > 0 THEN target_tokens // avail ELSE 0 END) * avail
                  THEN 1 ELSE 0 END AS extra_replica
      FROM cum
    )
    SELECT doc_id, lang, n_tokens, full_epochs, extra_replica,
           unnest(generate_series(0, full_epochs + extra_replica - 1)) AS epoch
    FROM staged WHERE full_epochs + extra_replica > 0
    ORDER BY lang, doc_id, epoch
    """


@register("sample_epochs_upsample", oracle=_epochs_oracle())
def sample_epochs_upsample(spark, sf_dir):
    """Data-constrained epoch upsampling
    (``operators/filtering.py::epochs_upsample``; targets en 2k / de
    30k / es 8k tokens): strata whose target exceeds their supply
    repeat for ``target div available`` full epochs plus an md5-order
    partial epoch (Muennighoff 2023's repeat-epochs mixture recipe) —
    token_mixture_sample generalized past target <= available.  One
    bounded per-stratum window + broadcast totals + ONE
    explode(sequence); fully deterministic, every replica count
    SQL-replayed."""
    docs = t(spark, sf_dir, "documents")
    return _filtering.epochs_upsample(
        docs, ["lang"], _EU_TARGETS, id_col="doc_id", text_col="text"
    ).orderBy("lang", "doc_id", "epoch")

# --- seasonal / trend strength -----------------------------------------------------------

from opteryx_spark.suite.pipeline15 import _CD_HW, _CD_P  # noqa: E402


@register(
    "ts_seasonal_strength",
    oracle=f"""
    WITH daily AS ({_O_DAILY}),
    tr AS (
      SELECT event_type, d, cnt,
             (CAST(sum(cnt) OVER w AS BIGINT) * 1000)
               // CAST(count(*) OVER w AS BIGINT) AS trend_q
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN {_CD_HW} PRECEDING AND {_CD_HW} FOLLOWING)
    ),
    de AS (
      SELECT event_type, d, cnt, trend_q, cnt * 1000 - trend_q AS detr,
             d % {_CD_P} AS ph
      FROM tr
    ),
    comp AS (
      SELECT event_type,
             (detr - (CAST(sum(detr) OVER p AS BIGINT)
                      // CAST(count(*) OVER p AS BIGINT))) // 1000 AS r,
             (CAST(sum(detr) OVER p AS BIGINT) // CAST(count(*) OVER p AS BIGINT)
              + (detr - (CAST(sum(detr) OVER p AS BIGINT)
                         // CAST(count(*) OVER p AS BIGINT)))) // 1000 AS sr,
             (trend_q
              + (detr - (CAST(sum(detr) OVER p AS BIGINT)
                         // CAST(count(*) OVER p AS BIGINT)))) // 1000 AS tr_
      FROM de
      WINDOW p AS (PARTITION BY event_type, ph)
    ),
    ag AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS s_r, CAST(sum(r * r) AS BIGINT) AS ss_r,
             CAST(sum(sr) AS BIGINT) AS s_sr, CAST(sum(sr * sr) AS BIGINT) AS ss_sr,
             CAST(sum(tr_) AS BIGINT) AS s_tr, CAST(sum(tr_ * tr_) AS BIGINT) AS ss_tr
      FROM comp GROUP BY event_type
    )
    SELECT event_type, n AS n_points,
           n * ss_r - s_r * s_r AS var_resid_n,
           n * ss_sr - s_sr * s_sr AS var_seas_n,
           n * ss_tr - s_tr * s_tr AS var_trend_n,
           CASE WHEN n * ss_sr - s_sr * s_sr > 0 THEN
             greatest(CAST(0 AS BIGINT), 1000000
               - ((n * ss_r - s_r * s_r) * 1000000) // (n * ss_sr - s_sr * s_sr))
           END AS seasonal_strength_ppm,
           CASE WHEN n * ss_tr - s_tr * s_tr > 0 THEN
             greatest(CAST(0 AS BIGINT), 1000000
               - ((n * ss_r - s_r * s_r) * 1000000) // (n * ss_tr - s_tr * s_tr))
           END AS trend_strength_ppm
    FROM ag ORDER BY event_type
    """,
)
def ts_seasonal_strength(spark, sf_dir):
    """Seasonal + trend strength of the per-type daily series
    (``operators/timeseries.py::seasonal_strength``; Hyndman FPP
    ``F_s/F_t``): variance shares of the classical-decompose components
    in truncating ppm, every variance an exact n-scaled BIGINT over
    de-scaled components — the routing stat between holt_linear,
    holt_winters and no-model; decompose windows + ONE per-key
    aggregate."""
    return _ts.seasonal_strength(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
        period=_CD_P,
        half_window=_CD_HW,
        qscale=1000,
    ).orderBy("event_type")

# --- time-decay multi-touch attribution ---------------------------------------------------

from opteryx_spark.operators import events as _events  # noqa: E402
from opteryx_spark.operators import scale as _scale  # noqa: E402

_AD_LB_DAYS = 3


@register(
    "events_attribution_decay",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    conv AS (
      -- NULL-id conversions excluded (engine contract: the id is the
      -- per-user conversion key; a NULL key would double-count)
      SELECT user_id AS u, event_id AS cid, us AS cus,
             coalesce(CAST(floor(CAST(value AS DOUBLE) * 1000.0) AS BIGINT), 0) AS vm
      FROM base WHERE event_type = 'purchase' AND event_id IS NOT NULL
    ),
    tch AS (
      SELECT user_id AS u, us AS tus, event_type AS channel
      FROM base WHERE event_type <> 'purchase' AND event_type IS NOT NULL
    ),
    cand AS (
      SELECT c.u, c.cid, c.vm, t.channel,
             (1::BIGINT << ({_AD_LB_DAYS} - CAST((c.cus - t.tus) // 86400000000 AS INT)))
               AS w
      FROM conv c JOIN tch t ON t.u = c.u
      WHERE t.tus < c.cus AND t.tus >= c.cus - {_AD_LB_DAYS} * 86400000000
    ),
    cr AS (
      -- (u, cid): conversion ids need only be unique per user
      SELECT channel,
             (vm * w) // CAST(sum(w) OVER (PARTITION BY u, cid) AS BIGINT) AS credit
      FROM cand
    ),
    touched AS (
      SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
             CAST(sum(credit) AS BIGINT) AS credited_milli
      FROM cr GROUP BY channel
    ),
    direct AS (
      SELECT 'direct' AS channel, CAST(count(*) AS BIGINT) AS n_touches,
             CAST(coalesce(sum(vm), 0) AS BIGINT) AS credited_milli
      FROM conv c
      WHERE NOT EXISTS (SELECT 1 FROM cand a WHERE a.u = c.u AND a.cid = c.cid)
      HAVING count(*) > 0
    )
    SELECT * FROM touched UNION ALL SELECT * FROM direct
    ORDER BY channel
    """,
)
def events_attribution_decay(spark, sf_dir):
    """Time-decay multi-touch attribution
    (``operators/events.py::decay_attribution``): every purchase's
    milli-value split across its user's lookback touches with EXACT
    dyadic decay — a touch a whole days old weighs 2^({d} - a), so each
    older day is exactly half — one truncating division per touch; the
    middle ground between last-touch and the Markov removal effect.
    One band join + ONE conversion-keyed window + one channel
    groupBy."""
    ev = t(spark, sf_dir, "events")
    return _events.decay_attribution(
        ev, conversion_type="purchase", lookback_days=_AD_LB_DAYS
    ).orderBy("channel")


events_attribution_decay.__doc__ = events_attribution_decay.__doc__.format(
    d=_AD_LB_DAYS
)

# --- session dwell / bounce summary ---------------------------------------------------------

_DW_GAP_US = 30 * 60 * 1_000_000


@register(
    "events_dwell_bounce",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), f AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {_DW_GAP_US} THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM f
    ), per AS (
      SELECT user_id, session_id,
             CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, session_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           (CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // CAST(count(*) AS BIGINT) AS bounce_ppm,
           CAST(coalesce(sum(duration_us), 0) AS BIGINT) AS total_dwell_us,
           CAST(coalesce(sum(duration_us), 0) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS avg_dwell_us
    FROM per
    """,
)
def events_dwell_bounce(spark, sf_dir):
    """Session dwell/bounce readout
    (``operators/events.py::session_dwell_summary`` over the gap
    sessionizer): session count, single-event bounce count + ppm rate,
    total and truncating-average dwell — the engagement-quality split;
    the sessionize window + ONE aggregate, every number a BIGINT."""
    ev = t(spark, sf_dir, "events")
    return _events.session_dwell_summary(ev, gap_minutes=30)


# --- stratified k-fold ---------------------------------------------------------------------

_KF_K = 5


@register(
    "sample_stratified_kfold",
    oracle=f"""
    SELECT doc_id, lang,
           CAST((row_number() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % {_KF_K}
             AS BIGINT) AS fold
    FROM documents WHERE doc_id IS NOT NULL
    ORDER BY lang, doc_id
    """,
)
def sample_stratified_kfold(spark, sf_dir):
    """Deterministic stratified {k}-fold CV assignment
    (``operators/scale.py::stratified_kfold``; strata = lang):
    round-robin folds in the canonical md5 order, so every fold holds
    each stratum's count within +-1 — exactly balanced where
    hash-range bucketing is only balanced in expectation; ONE bounded
    per-stratum window."""
    docs = t(spark, sf_dir, "documents")
    return _scale.stratified_kfold(docs, ["lang"], k=_KF_K).orderBy(
        "lang", "doc_id"
    )


sample_stratified_kfold.__doc__ = sample_stratified_kfold.__doc__.format(k=_KF_K)

# --- directed-graph reciprocity ---------------------------------------------------------------


@register(
    "graph_reciprocity",
    oracle=f"""
    WITH e AS MATERIALIZED ({_O_KC_DIRECTED}),
    r AS (SELECT count(*) AS n_recip FROM e
          WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.s = e.d AND e2.d = e.s))
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST(r.n_recip AS BIGINT) AS n_reciprocal,
           CASE WHEN (SELECT count(*) FROM e) > 0 THEN
             (CAST(r.n_recip AS BIGINT) * 1000000)
               // CAST((SELECT count(*) FROM e) AS BIGINT)
           END AS reciprocity_ppm
    FROM r
    """,
)
def graph_reciprocity(spark, sf_dir):
    """Directed-graph reciprocity (``operators/web.py::reciprocity``):
    the fraction of distinct directed edges whose reverse edge exists —
    the mutual-vs-broadcast link-structure audit (link exchanges score
    high) run before trusting authority signals on a crawl graph.  One
    dedup + one reversed-key self-semi-join + one aggregate, BIGINT
    counts, truncating ppm."""
    return _web.reciprocity(_kc_edges(spark, sf_dir))


# --- inter-event-time histogram ------------------------------------------------------------------


@register(
    "events_inter_event_time",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST((us - lag(us) OVER (PARTITION BY user_id, event_type
                                      ORDER BY us, event_id)) // 1000000
               AS BIGINT) AS gap_s
      FROM e
    )
    SELECT event_type,
           CAST(length(bin(gap_s + 1)) - 1 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_s) AS BIGINT) AS min_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY event_type, length(bin(gap_s + 1)) - 1
    ORDER BY event_type, bucket
    """,
)
def events_inter_event_time(spark, sf_dir):
    """Inter-arrival-time histogram per event type
    (``operators/events.py::inter_event_histogram``): same-user
    same-type consecutive gaps on EXACT powers-of-2 second buckets —
    ``floor(log2(gap_s + 1))`` via binary-string length, no float log —
    the burstiness/cadence distribution; ONE lag window + ONE (type,
    bucket) groupBy."""
    ev = t(spark, sf_dir, "events")
    return _events.inter_event_histogram(ev).orderBy("event_type", "bucket")
