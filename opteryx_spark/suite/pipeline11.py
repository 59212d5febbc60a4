"""Suite wave 32 (round 8): KMV bottom-k distinct sketch with set
operations, nearest-direction as-of join, metadata-filtered exact ANN,
per-partition completeness trend, and per-label embedding centroid
drift — registered after ``pipeline10`` (tier-1b order; r8 new-entry
total stays under the 35-entry cap: 8 + 6 + 5 = 19)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import joins as _joins
from opteryx_spark.operators import profile as _profile
from opteryx_spark.operators import quality as _quality
from opteryx_spark.operators import similarity as _similarity
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t

_US_PER_DAY = 86_400_000_000

_KMV_K = 256


def _kmv_oracle() -> str:
    # the degski hash32 SQL twin (the agg_hll_portable / cms oracle recipe)
    def hash_chain(tag: str, pred: str) -> str:
        return f"""h0{tag} AS (SELECT CAST(user_id AS BIGINT) % 4294967296 AS h
                FROM events WHERE user_id IS NOT NULL AND {pred}),
    h1{tag} AS (SELECT (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h0{tag}),
    h2{tag} AS (SELECT (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h1{tag}),
    hf{tag} AS (SELECT xor(h >> 16, h) AS h FROM h2{tag})"""

    k = _KMV_K
    return f"""
    WITH {hash_chain('a', "event_type = 'click'")},
    {hash_chain('b', "event_type = 'purchase'")},
    m AS (
      SELECT h, max(ina) AS ina, max(inb) AS inb FROM (
        SELECT h, 1 AS ina, 0 AS inb FROM hfa
        UNION ALL SELECT h, 0, 1 FROM hfb
      ) GROUP BY h
    ),
    bka AS (SELECT h FROM m WHERE ina = 1 ORDER BY h LIMIT {k}),
    bkb AS (SELECT h FROM m WHERE inb = 1 ORDER BY h LIMIT {k}),
    bku AS (SELECT h, ina, inb FROM m ORDER BY h LIMIT {k}),
    ea AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS hk FROM bka),
    eb AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS hk FROM bkb),
    eu AS (SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS hk,
                  CAST(sum(ina * inb) AS BIGINT) AS both FROM bku),
    est AS (
      SELECT
        CASE WHEN ea.n < {k} THEN ea.n
             ELSE ({k} - 1) * 4294967296 // ea.hk END AS est_a,
        CASE WHEN eb.n < {k} THEN eb.n
             ELSE ({k} - 1) * 4294967296 // eb.hk END AS est_b,
        CASE WHEN eu.n < {k} THEN eu.n
             ELSE ({k} - 1) * 4294967296 // eu.hk END AS est_union,
        eu.both AS union_k_in_both, eu.n AS un
      FROM ea, eb, eu
    )
    SELECT CAST({k} AS BIGINT) AS k, est_a, est_b, est_union, union_k_in_both,
           (union_k_in_both * est_union) // least(un, CAST({k} AS BIGINT))
             AS est_intersection
    FROM est
    """


@register("agg_kmv_distinct", oracle=_kmv_oracle())
def agg_kmv_distinct(spark, sf_dir):
    """KMV bottom-k distinct sketch with SET operations
    (``operators/profile.py::kmv_distinct_ops``): distinct-user
    estimates for the click and purchase streams PLUS union /
    intersection estimates from side-membership flags on the union's
    bottom-k — the capability HLL lacks, fully deterministic (portable
    degski hash, truncating div), every number SQL-replayed."""
    ev = t(spark, sf_dir, "events")
    return _profile.kmv_distinct_ops(
        ev.filter(F.col("event_type") == "click").select("user_id"),
        ev.filter(F.col("event_type") == "purchase").select("user_id"),
        "user_id",
        k=_KMV_K,
    )


_ASOF_TOL = 7_200_000_000  # 2 hours in micros


@register(
    "join_asof_nearest",
    oracle=f"""
    WITH l AS (
      SELECT event_id, user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'click'
    ),
    r AS (
      SELECT event_id AS rid, user_id, epoch_us(ts) AS rt
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    cand AS (
      SELECT l.event_id, r.rid, r.rt,
             abs(r.rt - l.t) AS d,
             CASE WHEN r.rt <= l.t THEN 0 ELSE 1 END AS dir
      FROM l JOIN r ON r.user_id = l.user_id
                   AND abs(r.rt - l.t) <= {_ASOF_TOL}
    ),
    pick AS (
      SELECT event_id, rid, rt, dir,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY d, dir, rid) AS rn
      FROM cand
    )
    SELECT l.user_id, l.event_id, l.t,
           p.rid AS matched_rid, p.rt AS matched_rt,
           p.rt - l.t AS match_delta,
           CASE WHEN p.dir = 0 THEN 'backward'
                WHEN p.dir = 1 THEN 'forward' END AS match_direction
    FROM l LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p USING (event_id)
    ORDER BY l.event_id
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (``operators/joins.py::
    asof_join_nearest``): each click matches its CLOSEST purchase by
    the same user within ±2 h — pandas ``merge_asof(direction=
    'nearest')`` semantics via a band equi-join + ``min(struct(|Δ|,
    direction, id))`` keeper; ties prefer backward, then the lowest
    id.  No windowed union sort, no nested loop."""
    ev = t(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", us.alias("t")
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("rid"), "user_id", us.alias("rt")
    )
    return _joins.asof_join_nearest(
        left, right, ["user_id"], "t", "rt",
        tolerance=_ASOF_TOL, left_id="event_id", right_id="rid",
    ).orderBy("event_id")


_O_DOT_FILTERED = (
    "list_reduce(list_transform(range(1, len(q.embedding)+1), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), "
    "(x, y) -> x + y)"
)
_O_NORM2_F = (
    "list_reduce(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "(x, y) -> x + y)"
)


@register(
    "emb_ann_filtered",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT b.vec_id,
           {_O_DOT_FILTERED}
             / (sqrt({_O_NORM2_F.format(v='q.embedding')})
                * sqrt({_O_NORM2_F.format(v='b.embedding')})) AS cosim
    FROM q, embeddings b
    WHERE b.vec_id <> 0 AND b.label = 3
    ORDER BY cosim DESC, b.vec_id LIMIT 10
    """,
)
def emb_ann_filtered(spark, sf_dir):
    """Metadata-filtered exact vector search: brute cosine top-10
    restricted to ``label = 3`` — the filtered-ANN shape every vector
    store needs (predicate applied BEFORE scoring, so the scan prunes
    on the metadata column; with the IVF/SQ8/PQ artifacts the same
    filter composes onto the probe side).  Exact path doubles as the
    oracle baseline for filtered approximate variants."""
    emb = t(spark, sf_dir, "embeddings")
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    ]
    corpus = emb.filter((F.col("vec_id") != 0) & (F.col("label") == 3))
    return _similarity.cosine_topk(corpus, qvec, k=10)


_COMPLETENESS_COLS = ["user_id", "event_type", "value", "props"]


def _o_completeness_col(c: str) -> str:
    return f"""
      SELECT part, '{c}' AS col_name, n_rows, n_{c} AS n_nulls,
             CASE WHEN n_rows > 0 THEN (n_{c} * 1000000) // n_rows END AS null_ppm
      FROM g"""


@register(
    "quality_completeness_by_day",
    oracle=f"""
    WITH g AS (
      SELECT epoch_us(ts) // {_US_PER_DAY} AS part,
             CAST(count(*) AS BIGINT) AS n_rows,
             {", ".join(
                 f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_{c}"
                 for c in _COMPLETENESS_COLS
             )}
      FROM events GROUP BY epoch_us(ts) // {_US_PER_DAY}
    )
    {" UNION ALL ".join(_o_completeness_col(c) for c in _COMPLETENESS_COLS)}
    ORDER BY part, col_name
    """,
)
def quality_completeness_by_day(spark, sf_dir):
    """Per-day per-column completeness trend
    (``operators/quality.py::completeness_by_partition``): exact null
    counts for four columns from ONE fused groupBy(day) pass,
    struct-array-explode unpivoted — "which day did a field start
    going missing".  A NULL day (NULL ts) is a real partition."""
    ev = t(spark, sf_dir, "events")
    return _quality.completeness_by_partition(
        ev,
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_US_PER_DAY}"),
        _COMPLETENESS_COLS,
        part_alias="part",
    ).orderBy("part", "col_name")


_CD_DIM = 64


def _centroid_drift_oracle() -> str:
    dims = range(_CD_DIM)
    sums = ", ".join(
        f"CAST(sum(qv[{d + 1}]) AS BIGINT) AS s{d}" for d in dims
    )
    terms = " + ".join(
        f"(a.s{d} // a.n - b.s{d} // b.n) * (a.s{d} // a.n - b.s{d} // b.n)"
        for d in dims
    )
    return f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    a AS (SELECT label, CAST(count(*) AS BIGINT) AS n, {sums}
          FROM q WHERE vec_id % 2 = 0 GROUP BY label),
    b AS (SELECT label, CAST(count(*) AS BIGINT) AS n, {sums}
          FROM q WHERE vec_id % 2 = 1 GROUP BY label)
    SELECT coalesce(a.label, b.label) AS label,
           coalesce(a.n, 0) AS n_a, coalesce(b.n, 0) AS n_b,
           CASE WHEN a.n IS NOT NULL AND b.n IS NOT NULL
                THEN {terms} END AS drift2_q
    FROM a FULL OUTER JOIN b ON a.label = b.label
    ORDER BY label
    """


@register("emb_centroid_drift", oracle=_centroid_drift_oracle())
def emb_centroid_drift(spark, sf_dir):
    """Per-label centroid drift between the even- and odd-id embedding
    halves (``operators/similarity.py::centroid_drift``): milli-
    quantized BIGINT per-dim sums (ONE groupBy per side, the kmeans
    update shape), truncating-div centroids, exact integer squared-L2
    drift — the embedding-space monitoring primitive for model or
    corpus refreshes."""
    emb = t(spark, sf_dir, "embeddings")
    return _similarity.centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        label_col="label",
        vec_col="embedding",
        dim=_CD_DIM,
    ).orderBy("label")
