"""Suite wave 34 (round 8): evaluation + propagation surface — BFS hop
distances from a seed set, clustering-quality silhouette, calibration
reliability bins, Holt linear-trend smoothing, int8-vs-exact recall@k,
and deterministic contrastive negative sampling — registered after
``pipeline12`` (tier-1b order; r8 new-entry total 24 + 6 = 30, under
the 35 cap; registry-minus-driver-green stays <= the 50-slot window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import features as _features
from opteryx_spark.operators import scale as _scale
from opteryx_spark.operators import similarity as _similarity
from opteryx_spark.operators import timeseries as _ts
from opteryx_spark.operators import web as _web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t
from opteryx_spark.suite.pipeline8 import _KC_N, _O_DAILY, _O_KC_EDGES, _daily_counts
from opteryx_spark.suite.pipeline9 import _kc_edges

# --- multi-source BFS hop distances ----------------------------------------------

_HOP_ROUNDS = 4
_HOP_SEED_MOD = 53


def _hop_oracle() -> str:
    parts = [
        f"""WITH e AS MATERIALIZED ({_O_KC_EDGES}),
    nb AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b AS node, a AS nbr FROM e
    ),
    d0 AS MATERIALIZED (
      SELECT node, CAST(0 AS BIGINT) AS hops
      FROM (SELECT DISTINCT node FROM nb) WHERE node % {_HOP_SEED_MOD} = 0
    )"""
    ]
    for r in range(_HOP_ROUNDS):
        parts.append(
            f""",
    d{r + 1} AS MATERIALIZED (
      SELECT node, min(hops) AS hops FROM (
        SELECT node, hops FROM d{r}
        UNION ALL
        SELECT nb.node, d.hops + 1 FROM nb JOIN d{r} d ON d.node = nb.nbr
      ) GROUP BY node
    )"""
        )
    parts.append(
        f"""
    SELECT node, hops FROM d{_HOP_ROUNDS} ORDER BY node"""
    )
    return "".join(parts)


@register("graph_hop_distance", oracle=_hop_oracle())
def graph_hop_distance(spark, sf_dir):
    """Multi-source BFS hop distances
    (``operators/web.py::hop_distances``) from the seed set
    ``node % {mod} = 0`` over the shared doc-id graph, bounded at
    {rounds} hops: fixed-round Bellman-Ford relaxation (one node-keyed
    join + one min-groupBy per round, lineage re-rooted with eager
    release) — the seed-propagation primitive behind TrustRank-style
    audits and contamination blast-radius checks; the fixed round count
    is what makes the oracle unroll exactly."""
    edges = _kc_edges(spark, sf_dir)
    # seed population = graph nodes (self-loop-only nodes are not in the
    # canonical graph, so exclude them here too — matches the oracle's nb)
    ne = edges.filter(F.col("src") != F.col("dst"))
    seeds = (
        ne.select(F.col("src").alias("node"))
        .unionAll(ne.select(F.col("dst").alias("node")))
        .filter(F.col("node") % _HOP_SEED_MOD == 0)
        .distinct()
    )
    return _web.hop_distances(
        edges, seeds, max_hops=_HOP_ROUNDS
    ).orderBy("node")


graph_hop_distance.__doc__ = graph_hop_distance.__doc__.format(
    mod=_HOP_SEED_MOD, rounds=_HOP_ROUNDS
)

# --- simplified silhouette --------------------------------------------------------

_SIL_DIM = 64


def _silhouette_oracle() -> str:
    dims = range(_SIL_DIM)
    sums = ", ".join(f"CAST(sum(qv[{d + 1}]) AS BIGINT) AS s{d}" for d in dims)
    cdims = ", ".join(f"s{d} // n AS c{d}" for d in dims)
    d2 = " + ".join(
        f"(v.qv[{d + 1}] - c.c{d}) * (v.qv[{d + 1}] - c.c{d})" for d in dims
    )
    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      FROM embeddings
      WHERE vec_id IS NOT NULL AND label IS NOT NULL AND embedding IS NOT NULL
    ),
    cent AS MATERIALIZED (
      SELECT label AS cl, CAST(count(*) AS BIGINT) AS n, {sums}
      FROM q GROUP BY label
    ),
    centv AS MATERIALIZED (SELECT cl, {cdims} FROM cent),
    ab AS (
      SELECT v.vec_id, v.label,
             min(CASE WHEN c.cl = v.label THEN {d2} END) AS a2,
             min(CASE WHEN c.cl <> v.label THEN {d2} END) AS b2
      FROM q v, centv c GROUP BY v.vec_id, v.label
    ),
    s AS (
      SELECT label,
             CASE WHEN b2 IS NULL THEN NULL
                  WHEN greatest(a2, b2) = 0 THEN CAST(0 AS BIGINT)
                  ELSE ((b2 - a2) * 1000000) // greatest(a2, b2) END AS s_ppm
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CASE WHEN count(s_ppm) > 0
                THEN CAST(sum(s_ppm) AS BIGINT) // count(s_ppm) END AS mean_s_ppm
    FROM s GROUP BY label ORDER BY label
    """


@register("emb_silhouette_lite", oracle=_silhouette_oracle())
def emb_silhouette_lite(spark, sf_dir):
    """Simplified (centroid-form) silhouette per label cluster
    (``operators/similarity.py::silhouette_lite``): O(n·k) replacement
    for the O(n²) classic — ONE groupBy with fused per-dim sums for
    the centroids (the kmeans update shape), a broadcast of the k-row
    centroid frame, exact BIGINT squared distances and truncating-div
    ppm scores; the clustering-quality eval for any labeled embedding
    partition."""
    emb = t(spark, sf_dir, "embeddings")
    return _similarity.silhouette_lite(emb, dim=_SIL_DIM).orderBy("label")


# --- calibration reliability bins -------------------------------------------------

_ECE_BINS = 10


@register(
    "feat_calibration_ece",
    oracle=f"""
    WITH b AS (
      SELECT least(CAST({_ECE_BINS - 1} AS BIGINT), (s * {_ECE_BINS}) // 1000000) AS bin,
             s, y
      FROM (
        SELECT CAST(least(1000000, greatest(0,
                 CAST(floor(CAST(value AS DOUBLE) * 10000.0) AS BIGINT))) AS BIGINT) AS s,
               CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      )
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(s) AS BIGINT) // count(*) AS conf_ppm,
           (CAST(sum(y) AS BIGINT) * 1000000) // count(*) AS acc_ppm,
           abs(CAST(sum(s) AS BIGINT) // count(*)
               - (CAST(sum(y) AS BIGINT) * 1000000) // count(*)) AS gap_ppm
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def feat_calibration_ece(spark, sf_dir):
    """Reliability-diagram bins (``operators/features.py::
    calibration_bins``) for a pseudo-probability derived from the
    event value (clamped value·1e-2 as ppm) against the purchase
    indicator: per-bin mean confidence vs observed positive rate and
    the |gap| — the per-bin ECE terms; ONE {b}-group aggregate,
    map-side combinable, every number a BIGINT."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    scored = ev.select(
        F.least(
            F.lit(1000000).cast("bigint"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.floor(F.col("value").cast("double") * 10000.0).cast("bigint"),
            ),
        ).alias("score_ppm"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_pos"),
    )
    return _features.calibration_bins(
        scored, "score_ppm", "is_pos", n_bins=_ECE_BINS
    ).orderBy("bin")


feat_calibration_ece.__doc__ = feat_calibration_ece.__doc__.format(b=_ECE_BINS)

# --- Holt linear-trend smoothing ---------------------------------------------------


@register(
    "ts_holt_linear",
    oracle=f"""
    WITH RECURSIVE s AS (
      SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
             cnt
      FROM ({_O_DAILY})
    ),
    rec AS (
      SELECT event_type, i, cnt * 1000 AS l, CAST(0 AS BIGINT) AS b
      FROM s WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i,
             (s.cnt * 1000 + r.l + r.b) // 2 AS l,
             (((s.cnt * 1000 + r.l + r.b) // 2) - r.l + r.b) // 2 AS b
      FROM rec r JOIN s ON s.event_type = r.event_type AND s.i = r.i + 1
    )
    SELECT event_type, CAST(max(i) AS BIGINT) AS n_points,
           arg_max(l, i) AS level_q, arg_max(b, i) AS trend_q,
           arg_max(l, i) + arg_max(b, i) AS forecast_next_q
    FROM rec GROUP BY event_type ORDER BY event_type
    """,
)
def ts_holt_linear(spark, sf_dir):
    """Holt linear-trend smoothing of the per-type daily series
    (``operators/timeseries.py::holt_linear``): alpha = beta = 1/2 so
    every update is an exact truncating integer halving (``shiftright``
    of an evened numerator — full-int64 exact); ONE groupBy + an
    ``F.aggregate`` left fold per key; the oracle replays the
    recurrence as a recursive CTE.  Level + trend + one-step forecast
    per event type, milli-scaled BIGINTs."""
    return _ts.holt_linear(
        _daily_counts(spark, sf_dir),
        key_cols=["event_type"],
        t_col="d",
        value_col="cnt",
        qscale=1000,
    ).orderBy("event_type")


# --- int8-vs-exact recall@k ---------------------------------------------------------

_QR_K = 10
_QR_QMOD = 100


def _qrecall_oracle() -> str:
    dims = range(_SIL_DIM)
    se = " + ".join(f"q.qm[{d + 1}] * c.qm[{d + 1}]" for d in dims)
    s8 = " + ".join(f"q.q8[{d + 1}] * c.q8[{d + 1}]" for d in dims)
    return f"""
    WITH p AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qm,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)
                      * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END)
                      + 0.5) AS BIGINT)) AS q8
      FROM (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) AS mx
        FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
      )
    ),
    pairs AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS c_id,
             {se} AS se, {s8} AS s8
      FROM p q, p c
      WHERE q.vec_id % {_QR_QMOD} = 0 AND c.vec_id % {_QR_QMOD} <> 0
    ),
    r AS (
      SELECT query_id, c_id,
             row_number() OVER (PARTITION BY query_id ORDER BY se DESC, c_id) AS re,
             row_number() OVER (PARTITION BY query_id ORDER BY s8 DESC, c_id) AS r8
      FROM pairs
    )
    SELECT query_id,
           CAST(sum(CASE WHEN re <= {_QR_K} AND r8 <= {_QR_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           (CAST(sum(CASE WHEN re <= {_QR_K} AND r8 <= {_QR_K} THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000) // {_QR_K} AS recall_ppm
    FROM r GROUP BY query_id ORDER BY query_id
    """


@register("emb_quantization_recall", oracle=_qrecall_oracle())
def emb_quantization_recall(spark, sf_dir):
    """Recall@{k} of int8-quantized scoring vs exact scoring
    (``operators/similarity.py::quantization_recall``) over a
    ``vec_id % {m} = 0`` query panel: both rankings exact-integer
    (milli-quantized vs per-vector symmetric int8 codes), id
    tie-breaks, overlap in ppm — the quantization-loss eval run before
    shipping an SQ8 scan; query panel broadcast, one map pass, two
    windows, no corpus all-pairs."""
    emb = t(spark, sf_dir, "embeddings")
    return _similarity.quantization_recall(
        emb.filter(F.col("vec_id") % _QR_QMOD == 0),
        emb.filter(F.col("vec_id") % _QR_QMOD != 0),
        k=_QR_K,
        qscale=1000,
    ).orderBy("query_id")


emb_quantization_recall.__doc__ = emb_quantization_recall.__doc__.format(
    k=_QR_K, m=_QR_QMOD
)

# --- deterministic negative sampling ------------------------------------------------

_NS_SEED = "r8neg"
_NS_K = 4
_NS_B = 64


def _ns_bucket(hexpr: str) -> str:
    """First-8-hex-chars → BIGINT (the _O_ES_BUCKET idiom, parameterized)."""
    return f"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, 9), i ->
        CAST(strpos('0123456789abcdef', substring({hexpr}, i, 1)) - 1 AS BIGINT))),
      (a, c) -> a * 16 + c)"""


def _ns_oracle() -> str:
    bk = f"md5('{_NS_SEED}' || ':' || 'b' || ':' || CAST(id AS VARCHAR))"
    tk = (
        f"md5('{_NS_SEED}' || ':' || 'n' || ':' || CAST(anchor_id AS VARCHAR)"
        f" || ':' || CAST(j AS VARCHAR))"
    )
    return f"""
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id IS NOT NULL),
    bb AS (
      SELECT id, k, {_ns_bucket('k')} % {_NS_B} AS b
      FROM (SELECT id, {bk} AS k FROM ids)
    ),
    reps AS (
      SELECT b AS tb, id AS neg_id FROM (
        SELECT b, id, row_number() OVER (PARTITION BY b ORDER BY k, id) AS rn
        FROM bb
      ) WHERE rn = 1
    ),
    draws AS (
      SELECT id AS anchor_id, CAST(r.range AS BIGINT) AS j
      FROM ids, range(0, {_NS_K}) r
    ),
    tg AS (
      SELECT anchor_id, j, {_ns_bucket('tk')} % {_NS_B} AS tb
      FROM (SELECT anchor_id, j, {tk} AS tk FROM draws)
    )
    SELECT tg.anchor_id, tg.j, r.neg_id
    FROM tg JOIN reps r ON r.tb = tg.tb
    WHERE r.neg_id <> tg.anchor_id
    ORDER BY anchor_id, j
    """


@register("sample_negative_pairs", oracle=_ns_oracle())
def sample_negative_pairs(spark, sf_dir):
    """Deterministic contrastive negative sampling
    (``operators/scale.py::negative_sample``): {k} negatives per doc
    as a pure function of (seed, id, j) — bucket the corpus into {b}
    md5 buckets, elect a deterministic representative per bucket
    (bucket-keyed window, ~N/B rows each), route each draw to a
    pseudo-random bucket and join the BROADCAST {b}-row rep table; no
    global enumeration anywhere, so the shape survives 100 TB."""
    d = t(spark, sf_dir, "documents")
    return _scale.negative_sample(
        d, "doc_id", _NS_SEED, k=_NS_K, n_buckets=_NS_B
    ).orderBy("anchor_id", "j")


sample_negative_pairs.__doc__ = sample_negative_pairs.__doc__.format(
    k=_NS_K, b=_NS_B
)
