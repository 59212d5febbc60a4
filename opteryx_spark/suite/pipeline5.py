"""Round-6 sixth-wave suite entries: graph centrality over the domain
link graph, hybrid lexical+vector retrieval fusion, and portable
distributed k-means — each with a bit-exact DuckDB oracle.

The driver corpus has no link column, so the graph entries derive a
deterministic edge list from the round-5 URL fixture (same expression on
both sides): document ``i`` links its registered domain to the domain of
document ``(i*31 + 7) mod N`` — a fixed pseudo-random permutation that
yields a connected, weighted-degree multigraph over the fixture's
domains.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t
from opteryx_spark.suite.pipeline3 import _O_HOST, _O_URL_CTE, _o_domain, _with_urls

# --- domain-graph PageRank ---------------------------------------------------

_PR_SCALE = 1_000_000_000
_PR_ITERS = 3


def _pr_oracle() -> str:
    """Unrolled fixed-point PageRank: identical BIGINT truncating
    arithmetic as ``web.pagerank`` (all quantities non-negative, so
    DuckDB ``//`` == Spark ``div``)."""
    head = (
        _O_URL_CTE
        + f"""
    , nn AS (SELECT COUNT(*) AS nd FROM documents)
    , dmap AS (SELECT doc_id, {_o_domain(_O_HOST)} AS domain FROM u)
    , e AS (
        SELECT DISTINCT a.domain AS src, b.domain AS dst
        FROM dmap a CROSS JOIN nn
        JOIN dmap b ON b.doc_id = (a.doc_id * 31 + 7) % nn.nd
        WHERE a.domain IS NOT NULL AND b.domain IS NOT NULL
          AND a.domain <> b.domain)
    , nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
    , nz AS (SELECT COUNT(*) AS n FROM nodes)
    , od AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src)
    , r0 AS (
        SELECT nodes.node, coalesce(od.deg, 0) AS deg, nz.n AS n,
               ({_PR_SCALE} // nz.n) AS rank
        FROM nodes LEFT JOIN od USING (node) CROSS JOIN nz)
    """
    )
    iters = []
    for i in range(1, _PR_ITERS + 1):
        p = f"r{i - 1}"
        iters.append(
            f"""
    , dang{i} AS (SELECT coalesce(sum(rank), 0) AS dm FROM {p} WHERE deg = 0)
    , inc{i} AS (
        SELECT e.dst AS node, sum(r.rank // r.deg) AS inc
        FROM e JOIN {p} r ON r.node = e.src GROUP BY e.dst)
    , r{i} AS (
        SELECT p.node, p.deg, p.n,
               ((15 * ({_PR_SCALE} // p.n)) // 100)
               + ((85 * (coalesce(i.inc, 0) + (d.dm // p.n))) // 100) AS rank
        FROM {p} p LEFT JOIN inc{i} i USING (node) CROSS JOIN dang{i} d)
    """
        )
    return (
        head
        + "".join(iters)
        + f"""
    SELECT node, CAST(rank AS BIGINT) AS rank
    FROM r{_PR_ITERS} ORDER BY node
    """
    )


@register("web_domain_pagerank", oracle=_pr_oracle())
def web_domain_pagerank(spark, sf_dir):
    """Fixed-point PageRank over the registered-domain link graph
    (``operators/web.py::pagerank``) — the CommonCrawl-style domain
    authority signal curation pipelines weight sources by.  3 damped
    iterations, nano-rank BIGINT mass, dangling redistribution; every
    iteration is one src-keyed join + one dst-keyed map-side-combine SUM,
    and the result is bit-reproducible on any partitioning (truncating
    integer division only).  The oracle unrolls the identical arithmetic
    in SQL."""
    docs = _with_urls(t(spark, sf_dir, "documents"))
    dmap = web.parse_urls(docs).select("doc_id", "domain")
    nd = F.broadcast(docs.agg(F.count(F.lit(1)).alias("_nd")))
    a = dmap.select(F.col("doc_id").alias("_aid"), F.col("domain").alias("src"))
    b = dmap.select(F.col("doc_id").alias("_bid"), F.col("domain").alias("dst"))
    edges = (
        a.crossJoin(nd)
        .join(b, F.col("_bid") == (F.col("_aid") * 31 + 7) % F.col("_nd"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .select("src", "dst")
        .distinct()
    )
    return (
        web.pagerank(edges, iterations=_PR_ITERS, scale=_PR_SCALE)
        .select(F.col("node"), F.col("rank"))
        .orderBy("node")
    )


# --- hybrid lexical+vector retrieval (RRF) -----------------------------------

from opteryx_spark.operators import retrieval, similarity  # noqa: E402
from opteryx_spark.suite.pipeline import _O_DOT, _O_NORM2  # noqa: E402
from opteryx_spark.suite.pipeline4 import _BM25_TERMS, _O_BM25_BODY  # noqa: E402

_O_COSQ = (
    _O_DOT.replace("a.embedding", "q.embedding")
    + f" / (sqrt({_O_NORM2.format(v='q.embedding')})"
    + f" * sqrt({_O_NORM2.format(v='b.embedding')}))"
)


@register(
    "text_hybrid_rrf",
    oracle=_O_BM25_BODY
    + f"""
    , lr AS (
        SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
        FROM (SELECT * FROM scores ORDER BY bm25 DESC, doc_id LIMIT 20))
    , vq AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    , vs AS (
        SELECT b.vec_id AS doc_id, {_O_COSQ} AS cosim
        FROM vq q, embeddings b WHERE b.vec_id <> 0)
    , vr AS (
        SELECT doc_id, row_number() OVER (ORDER BY cosim DESC, doc_id) AS r
        FROM (SELECT * FROM vs ORDER BY cosim DESC, doc_id LIMIT 20))
    , allr AS (SELECT * FROM lr UNION ALL SELECT * FROM vr)
    SELECT doc_id,
           CAST(SUM(1000000000 // (60 + r)) AS BIGINT) AS rrf_score,
           CAST(COUNT(*) AS BIGINT) AS n_systems
    FROM allr GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
)
def text_hybrid_rrf(spark, sf_dir):
    """Hybrid search: BM25 top-20 (lexical) + exact-cosine top-20 over
    the aligned embedding table (vector), fused by fixed-point
    reciprocal-rank fusion (``operators/retrieval.py::rrf_fuse``) — the
    modern RAG retrieval stack end to end, value-verified.  Each leg is
    corpus-scale retrieval with a bounded top-k output; the fuse itself
    touches ≤ 40 rows."""
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    lex = retrieval.bm25_topk(docs, _BM25_TERMS, k=20)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()["embedding"]
    ]
    vec = similarity.cosine_topk(
        emb.filter(F.col("vec_id") != 0), qvec, k=20
    ).withColumnRenamed("vec_id", "doc_id")
    return retrieval.rrf_fuse(
        [(lex, "bm25", "asc"), (vec, "cosim", "asc")], id_col="doc_id", k=10
    )


# --- portable distributed k-means --------------------------------------------

_KM_K = 4
_KM_ITERS = 2
_KM_DIM = 64


def _km_oracle() -> str:
    """Unrolled fixed-point Lloyd k-means: identical quantization,
    BIGINT distances, truncating centroid division (DuckDB ``//`` ==
    Spark ``div`` — both truncate toward zero), lowest-index tiebreak."""
    dist = (
        f"list_reduce(list_transform(range(1, {_KM_DIM} + 1), "
        "i -> (q.qv[i] - c.c[i]) * (q.qv[i] - c.c[i])), (x, y) -> x + y)"
    )
    sql = f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ), cent0 AS (
      SELECT CAST(row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS j,
             qv AS c
      FROM (SELECT vec_id, qv FROM q
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_KM_K})
    )
    """
    for i in range(1, _KM_ITERS + 1):
        sql += f"""
    , a{i} AS (
      SELECT vec_id, j AS cluster FROM (
        SELECT q.vec_id, c.j,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {dist}, c.j) AS rn
        FROM q CROSS JOIN cent{i - 1} c) WHERE rn = 1
    ), u{i} AS (
      SELECT cluster AS j, list(sdiv ORDER BY dimn) AS c
      FROM (
        SELECT a.cluster, r.range AS dimn,
               sum(q.qv[r.range]) // count(*) AS sdiv
        FROM a{i} a JOIN q USING (vec_id), range(1, {_KM_DIM} + 1) r
        GROUP BY a.cluster, r.range)
      GROUP BY cluster
    ), cent{i} AS (
      SELECT p.j, coalesce(u.c, p.c) AS c
      FROM cent{i - 1} p LEFT JOIN u{i} u USING (j)
    )
    """
    sql += f"""
    SELECT vec_id, CAST(j AS BIGINT) AS cluster, CAST(d AS BIGINT) AS dist2
    FROM (
      SELECT q.vec_id, c.j, {dist} AS d,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {dist}, c.j) AS rn
      FROM q CROSS JOIN cent{_KM_ITERS} c) WHERE rn = 1
    ORDER BY vec_id
    """
    return sql


@register("emb_kmeans_portable", oracle=_km_oracle())
def emb_kmeans_portable(spark, sf_dir):
    """Distributed Lloyd k-means, bit-reproducible
    (``operators/similarity.py::kmeans_portable``): milli-unit quantized
    components, BIGINT distances, truncating centroid updates,
    md5-ordered deterministic seeds — every assignment and its squared
    distance value-verified against the unrolled SQL twin.  Assignment is
    a map-side distance fold against a one-row broadcast centroid frame;
    the update is one (cluster, pos)-keyed SUM/COUNT with map-side
    combine; only k*dim sum rows reach the driver per round."""
    emb = t(spark, sf_dir, "embeddings")
    assigned, _cents = similarity.kmeans_portable(
        emb, k=_KM_K, iterations=_KM_ITERS, dim=_KM_DIM
    )
    return assigned.orderBy("vec_id")


# --- blocked fuzzy-match join (entity resolution) ----------------------------

_FZ_NAME = (
    "source || '_rec_' || lpad(CAST((doc_id * 7919) % 100000 AS VARCHAR), 5, '0')"
)


@register(
    "join_fuzzy_blocked",
    oracle=f"""
    WITH canon AS (
      SELECT doc_id AS cid, {_FZ_NAME} AS cname FROM documents
    ), dirty AS (
      SELECT doc_id AS did,
        CASE doc_id % 4
          WHEN 0 THEN substr(cname, 1, 1) || substr(cname, 3)
          WHEN 1 THEN cname || 'x'
          WHEN 2 THEN 'q' || cname
          ELSE cname END AS dname
      FROM (SELECT doc_id, {_FZ_NAME} AS cname FROM documents)
    ), cand AS (
      SELECT DISTINCT did, dname, cid, cname
      FROM dirty d JOIN canon c
        ON substr(d.dname, 1, 4) = substr(c.cname, 1, 4)
        OR substr(d.dname, length(d.dname) - 3) =
           substr(c.cname, length(c.cname) - 3)
    )
    SELECT did, dname, cid, cname,
           CAST(levenshtein(dname, cname) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(dname, cname) <= 1
    ORDER BY did, cid
    """,
)
def join_fuzzy_blocked(spark, sf_dir):
    """Entity-resolution similarity join
    (``operators/joins.py::blocked_fuzzy_join``): a deterministically
    dirtied copy of a synthesized entity-name column (char drop / append /
    prepend by id class) re-linked to its canonical records within 1
    Levenshtein edit.  Prefix-OR-suffix blocking generates candidates via
    one tagged-key equi join — no cartesian at any scale (plan-asserted) — and the
    front-edit class specifically exercises the suffix block.  500/500
    dirty rows re-link to exactly their canonical record."""
    from opteryx_spark.operators import joins

    docs = t(spark, sf_dir, "documents")
    name = F.concat(
        F.col("source"),
        F.lit("_rec_"),
        F.lpad(((F.col("doc_id") * 7919) % 100000).cast("string"), 5, "0"),
    )
    canon = docs.select(F.col("doc_id").alias("cid"), name.alias("cname"))
    dirty = docs.select(F.col("doc_id").alias("did"), name.alias("_nm")).select(
        "did",
        F.when(F.col("did") % 4 == 0, F.expr("substr(_nm, 1, 1) || substr(_nm, 3)"))
        .when(F.col("did") % 4 == 1, F.concat(F.col("_nm"), F.lit("x")))
        .when(F.col("did") % 4 == 2, F.concat(F.lit("q"), F.col("_nm")))
        .otherwise(F.col("_nm"))
        .alias("dname"),
    )
    out = joins.blocked_fuzzy_join(dirty, canon, "dname", "cname", max_dist=1)
    return out.select(
        "did", "dname", "cid", "cname", F.col("dist").cast("long").alias("dist")
    ).orderBy("did", "cid")


# --- time-series gap fill + forward fill -------------------------------------

from opteryx_spark.operators import events as _events  # noqa: E402


@register(
    "events_gap_fill",
    oracle="""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS us, value
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ), a AS (
      SELECT event_type, (us // 3600000000) * 3600 AS bucket_start,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS value_sum
      FROM e GROUP BY 1, 2
    ), b AS (
      SELECT event_type, min(bucket_start) AS lo, max(bucket_start) AS hi
      FROM a GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket_start
      FROM b
    )
    SELECT s.event_type, s.bucket_start,
           coalesce(a.n_events, 0) AS n_events,
           a.n_events IS NULL AS is_gap,
           last_value(a.value_sum IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM spine s LEFT JOIN a USING (event_type, bucket_start)
    ORDER BY event_type, bucket_start
    """,
)
def events_gap_fill(spark, sf_dir):
    """Dense hourly per-type series with zero-filled gaps and
    forward-filled value sums (``operators/events.py::gap_fill_series``):
    the sparse stream becomes a calendar-complete time series — the
    missing-bucket/carry-forward primitive every monitoring rollup needs.
    Spine generation, join and fill all stay keyed by event_type; value
    sums use the DECIMAL exact-sum convention."""
    ev = t(spark, sf_dir, "events")
    return _events.gap_fill_series(ev, step_seconds=3600).orderBy(
        "event_type", "bucket_start"
    )


@register(
    "events_rolling_window",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS _us, value
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT event_id, user_id, _us,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) OVER w AS DOUBLE) AS value_win
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY _us
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def events_rolling_window(spark, sf_dir):
    """Per-event trailing-1h user-activity features
    (``operators/events.py::rolling_window_features``): count and exact
    value sum of the same user's events in (t-1h, t] via a time-RANGE
    window partitioned by the high-cardinality user key — equal-timestamp
    peers are frame-mates on both engines, so no tiebreak is needed for
    determinism."""
    ev = t(spark, sf_dir, "events")
    return (
        _events.rolling_window_features(ev, window_seconds=3600)
        .select("event_id", "user_id", "_us", "n_win", "value_win")
        .orderBy("event_id")
    )


# --- ML feature engineering ---------------------------------------------------

from opteryx_spark.operators import features as _feat  # noqa: E402
from opteryx_spark.operators import text as _text  # noqa: E402
from opteryx_spark.suite.pipeline3 import _O_TOKENS  # noqa: E402
from opteryx_spark.suite.pipeline4 import _O_POLY31  # noqa: E402


@register(
    "feat_winsorize_scale",
    oracle="""
    WITH s AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS plo,
             quantile_cont(value, 0.95) AS phi,
             quantile_cont(value, 0.5) AS med,
             quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value IS NOT NULL
                THEN least(greatest(e.value, s.plo), s.phi) END AS clipped,
           CASE WHEN e.value IS NOT NULL AND s.iqr <> 0
                THEN (least(greatest(e.value, s.plo), s.phi) - s.med) / s.iqr
           END AS scaled
    FROM events e LEFT JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
    ORDER BY e.event_id
    """,
)
def feat_winsorize_scale(spark, sf_dir):
    """Per-type winsorization + robust scaling of the event value
    (``operators/features.py::winsorize_robust_scale``): clip to the
    group's exact [p05, p95], scale by (x - median)/IQR — the
    outlier-robust feature normalizer.  Group stats are one aggregate
    broadcast back (never a low-cardinality window partition); NULL
    groups are a real stratum via null-safe join."""
    ev = t(spark, sf_dir, "events")
    return (
        _feat.winsorize_robust_scale(ev, "value", "event_type")
        .select("event_id", "event_type", "value", "clipped", "scaled")
        .orderBy("event_id")
    )


@register(
    "feat_hashed_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_O_TOKENS}) AS tk FROM documents
    ), hb AS (
      SELECT doc_id, {_O_POLY31.format(v='tk')} AS h FROM tok
    ), h1 AS (
      SELECT doc_id, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM hb
    ), h2 AS (
      SELECT doc_id, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h1
    ), hf AS (
      SELECT doc_id, xor(h >> 16, h) AS h FROM h2
    )
    SELECT doc_id, h % 64 AS feature_idx,
           CAST(SUM(CASE WHEN (h >> 7) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
             AS feature_val
    FROM hf GROUP BY doc_id, feature_idx
    ORDER BY doc_id, feature_idx
    """,
)
def feat_hashed_tokens(spark, sf_dir):
    """Hashing-trick featurization of document tokens
    (``operators/features.py::hash_features``): 64 signed buckets via the
    portable polynomial + degski hashes — dictionary-free fixed-width
    text features, every bucket index and sign value-verified.  Explode →
    map-side hash → one (doc, bucket) SUM with map-side combine."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _text.tokens("text").alias("tokens"))
    return _feat.hash_features(toks, "doc_id", "tokens", n_features=64).orderBy(
        "doc_id", "feature_idx"
    )


@register(
    "feat_target_encode",
    oracle="""
    WITH per AS (
      SELECT event_type, CAST(COUNT(value) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CAST(value AS DECIMAL(25,8))),
                           CAST(0 AS DECIMAL(25,8))) AS DOUBLE) AS s
      FROM events GROUP BY event_type
    ), g AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE)
               / CAST(COUNT(value) AS DOUBLE) AS gm
      FROM events
    )
    SELECT event_type, n,
           (s + 10.0 * gm) / (CAST(n AS DOUBLE) + 10.0) AS enc
    FROM per CROSS JOIN g ORDER BY event_type
    """,
)
def feat_target_encode(spark, sf_dir):
    """Smoothed target encoding of the event-type categorical
    (``operators/features.py::target_encode``): shrinks each category's
    mean toward the global mean with prior strength m=10 — exact DECIMAL
    sums, fixed division order, broadcast global mean."""
    ev = t(spark, sf_dir, "events")
    return _feat.target_encode(ev, "event_type", "value", m=10.0).orderBy(
        "event_type"
    )


# --- data-quality constraint report ------------------------------------------

from opteryx_spark.operators import quality as _quality  # noqa: E402


@register(
    "quality_constraint_report",
    oracle="""
    WITH rep AS (
      SELECT 'not_null(text)' AS chk, 'not_null' AS kind,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_violations
      FROM documents
      UNION ALL
      SELECT 'accepted_values(lang)', 'accepted_values',
             CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN lang IS NOT NULL
                    AND lang NOT IN ('en', 'fr', 'de') THEN 1 ELSE 0 END), 0)
                  AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'in_range(n_chars)', 'in_range',
             CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN n_chars IS NOT NULL
                    AND (n_chars < 1 OR n_chars > 400) THEN 1 ELSE 0 END), 0)
                  AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'matches_regex(source)', 'matches_regex',
             CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN source IS NOT NULL
                    AND NOT regexp_matches(source, '^src[0-9]+$')
                    THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'unique(doc_id)', 'unique',
             CAST(COALESCE(SUM(c), 0) AS BIGINT),
             CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
      FROM (SELECT COUNT(*) AS c FROM documents
            WHERE doc_id IS NOT NULL GROUP BY doc_id)
      UNION ALL
      SELECT 'unique(lang)', 'unique',
             CAST(COALESCE(SUM(c), 0) AS BIGINT),
             CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
      FROM (SELECT COUNT(*) AS c FROM documents
            WHERE lang IS NOT NULL GROUP BY lang)
      UNION ALL
      SELECT 'referential(user_id -> c_custkey)', 'referential',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM events
              WHERE user_id IS NOT NULL),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
              WHERE e.user_id IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
    )
    SELECT chk AS "check", kind, n_rows, n_violations,
           n_violations = 0 AS passed
    FROM rep ORDER BY "check"
    """,
)
def quality_constraint_report(spark, sf_dir):
    """Deequ-style declarative data-validation report
    (``operators/quality.py``): four row-level rules fused into ONE
    aggregate scan (not-null, accepted-values, range, regex), two
    uniqueness checks (one passing, one failing by construction — the
    violation arithmetic is what's verified), and a cross-table
    referential-integrity check via LEFT ANTI join.  Uniform report
    schema unions across batches."""
    docs = t(spark, sf_dir, "documents")
    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    rows = _quality.row_checks(
        docs,
        [
            ("not_null", "text"),
            ("accepted_values", "lang", ["en", "fr", "de"]),
            ("in_range", "n_chars", 1, 400),
            ("matches_regex", "source", "^src[0-9]+$"),
        ],
    )
    rep = (
        rows.unionByName(_quality.unique_check(docs, ["doc_id"]))
        .unionByName(_quality.unique_check(docs, ["lang"]))
        .unionByName(
            _quality.referential_check(ev, cust, "user_id", "c_custkey")
        )
    )
    return rep.orderBy("check")


_PSI_EDGES = [5.0, 15.0, 30.0, 60.0, 100.0, 200.0, 350.0]


def _psi_oracle() -> str:
    case = "CASE " + " ".join(
        f"WHEN value <= {e} THEN {i}" for i, e in enumerate(_PSI_EDGES)
    ) + f" ELSE {len(_PSI_EDGES)} END"
    nb = len(_PSI_EDGES) + 1
    return f"""
    WITH r AS (SELECT value FROM events
               WHERE event_id % 2 = 0 AND value IS NOT NULL),
    c AS (SELECT value FROM events
          WHERE event_id % 2 = 1 AND value IS NOT NULL),
    rb AS (SELECT {case} AS bin, CAST(COUNT(*) AS BIGINT) AS n
           FROM r GROUP BY 1),
    cb AS (SELECT {case} AS bin, CAST(COUNT(*) AS BIGINT) AS n
           FROM c GROUP BY 1),
    bins AS (SELECT CAST(b.range AS BIGINT) AS bin FROM range({nb}) b),
    counts AS (
      SELECT bins.bin,
             COALESCE(rb.n, 0) AS n_ref,
             COALESCE(cb.n, 0) AS n_cur
      FROM bins LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin)
    ), withp AS (
      SELECT bin, n_ref, n_cur,
             CAST(n_ref + 1 AS DOUBLE)
               / (CAST((SELECT COUNT(*) FROM r) AS DOUBLE) + {float(nb)})
               AS p_ref,
             CAST(n_cur + 1 AS DOUBLE)
               / (CAST((SELECT COUNT(*) FROM c) AS DOUBLE) + {float(nb)})
               AS p_cur
      FROM counts
    ), contribs AS (
      SELECT bin, n_ref, n_cur, p_ref, p_cur,
             (p_cur - p_ref)
               * (CAST(CAST(FLOOR(LN(p_cur / p_ref) * 1000.0 + 0.5) AS BIGINT)
                       AS DOUBLE) / 1000.0) AS contrib
      FROM withp
    )
    SELECT bin, n_ref, n_cur, p_ref, p_cur, contrib,
           CAST(SUM(CAST(contrib AS DECIMAL(25,8))) OVER () AS DOUBLE)
             AS psi_total
    FROM contribs ORDER BY bin
    """


@register("feat_psi_drift", oracle=_psi_oracle())
def feat_psi_drift(spark, sf_dir):
    """Population-stability-index drift monitor
    (``operators/features.py::psi_drift``) between the even- and
    odd-event halves of the value column: Laplace-smoothed bin shares,
    millinat-quantized log ratios, DECIMAL-exact PSI total — the
    batch-vs-batch feature-drift gate, value-verified per bin."""
    ev = t(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    return _feat.psi_drift(ref, cur, "value", _PSI_EDGES)


# --- BPE tokenizer training ---------------------------------------------------

_BPE_MERGES = 6


def _bpe_oracle() -> str:
    """Unrolled BPE training: word-frequency table once, then per round a
    weighted pair count, a (cnt DESC, pair) argmax and a greedy
    leading-separator replace — identical mechanics to ``text.bpe_train``."""
    sql = rf"""
    WITH w0 AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest({_O_TOKENS}) AS w FROM documents) GROUP BY w
    ), s0 AS (
      SELECT n, regexp_replace(w, '(.)', chr(31) || '\1', 'g') AS s FROM w0
    )
    """
    for i in range(1, _BPE_MERGES + 1):
        p = f"s{i - 1}"
        sql += f"""
    , p{i} AS (
      SELECT pr.a AS a, pr.b AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
        SELECT n, unnest(list_transform(range(1, len(sym)),
                 i -> {{'a': sym[i], 'b': sym[i+1]}})) AS pr
        FROM (SELECT n, list_filter(string_split(s, chr(31)), x -> x <> '')
                       AS sym
              FROM {p})
      ) GROUP BY pr.a, pr.b
    ), m{i} AS (
      SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1
    ), s{i} AS (
      SELECT n, replace(s,
               chr(31) || (SELECT a FROM m{i}) || chr(31) || (SELECT b FROM m{i}),
               chr(31) || (SELECT a || b FROM m{i})) AS s
      FROM {p}
    )
    """
    unions = "\n      UNION ALL ".join(
        f"SELECT CAST({i - 1} AS BIGINT) AS rank, a AS lhs, b AS rhs, cnt AS n FROM m{i}"
        for i in range(1, _BPE_MERGES + 1)
    )
    return sql + f"""
    SELECT * FROM ({unions}) ORDER BY rank
    """


@register("text_bpe_train_merges", oracle=_bpe_oracle(), oracle_cost_s=150.0)
def text_bpe_train_merges(spark, sf_dir):
    """BPE tokenizer TRAINING (``operators/text.py::bpe_train``): the top
    6 learned merges over the corpus word-frequency table — pair counts,
    argmax tiebreaks and the greedy leading-separator merge mechanics all
    value-verified against the unrolled SQL twin.  One corpus pass, then
    vocabulary-sized rounds."""
    docs = t(spark, sf_dir, "documents")
    return _text.bpe_train(docs, num_merges=_BPE_MERGES).orderBy("rank")


# --- interval overlap join ----------------------------------------------------

_CAMP_N = 12
_EPOCH_2024 = 1704067200  # 2024-01-01 00:00:00 UTC
_CAMP_STEP = 225000       # ~2.6 days between campaign starts
_CAMP_LEN = 172800        # 2-day campaigns


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH spans AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) // 1000000 AS BIGINT) AS span_start,
             CAST(max(epoch_us(ts)) // 1000000 + 1 AS BIGINT) AS span_end
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ), camps AS (
      SELECT CAST(c.range AS BIGINT) AS camp_id,
             CAST({_EPOCH_2024} + c.range * {_CAMP_STEP} AS BIGINT) AS camp_start,
             CAST({_EPOCH_2024} + c.range * {_CAMP_STEP} + {_CAMP_LEN} AS BIGINT)
               AS camp_end
      FROM range({_CAMP_N}) c
    )
    SELECT s.user_id, s.span_start, s.span_end,
           c.camp_id, c.camp_start, c.camp_end
    FROM spans s JOIN camps c
      ON s.span_start < c.camp_end AND c.camp_start < s.span_end
    ORDER BY s.user_id, c.camp_id
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval × interval overlap join
    (``operators/joins.py::interval_overlap_join``): per-user activity
    spans against synthesized campaign windows — the binned equi-join
    rewrite with the first-overlap-bin emission trick (one shuffle join,
    no distinct, no nested loop; the oracle is the plain theta join).
    Half-open [start, end) semantics on both sides."""
    from opteryx_spark.operators import joins

    ev = t(spark, sf_dir, "events")
    spans = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("_us"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("min(_us) div 1000000").alias("span_start"),
            (F.expr("max(_us) div 1000000") + 1).alias("span_end"),
        )
    )
    camps = spark.range(_CAMP_N).select(
        F.col("id").alias("camp_id"),
        (F.lit(_EPOCH_2024) + F.col("id") * _CAMP_STEP).alias("camp_start"),
        (F.lit(_EPOCH_2024) + F.col("id") * _CAMP_STEP + _CAMP_LEN).alias(
            "camp_end"
        ),
    )
    out = joins.interval_overlap_join(
        spans, camps, "span_start", "span_end", "camp_start", "camp_end",
        bin_width=86400,
    )
    return out.select(
        "user_id", "span_start", "span_end", "camp_id", "camp_start", "camp_end"
    ).orderBy("user_id", "camp_id")


# --- deterministic weighted sampling -----------------------------------------


@register(
    "sample_weighted_es",
    oracle=f"""
    WITH kx AS (
      SELECT doc_id, n_chars, 'wsamp' || CAST(doc_id AS VARCHAR) AS ks
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ), scored AS (
      SELECT doc_id, n_chars,
             CAST(CAST(FLOOR(-LN(({_O_POLY31.format(v='ks')} + 1)
                               / 2147483648.0) * 1000000.0 + 0.5) AS BIGINT)
                  AS DOUBLE)
               / (CAST(n_chars AS DOUBLE) * 1000000.0) AS es_key
      FROM kx
    )
    SELECT doc_id, n_chars, es_key
    FROM scored ORDER BY es_key, doc_id LIMIT 50
    """,
)
def sample_weighted_es(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (``operators/filtering.py::weighted_sample`` — Efraimidis-Spirakis
    exponential keys over portable-hash uniforms): 50 documents drawn
    proportionally to length weight, every key value-verified.  Map-side
    keys + TakeOrdered top-k; no global sort, no RNG state."""
    from opteryx_spark.operators import filtering

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        filtering.weighted_sample(docs, "n_chars", 50, salt="wsamp")
        .select("doc_id", "n_chars", "es_key")
        .orderBy("es_key", "doc_id")
    )


# --- SCD-2 state history ------------------------------------------------------


@register(
    "events_scd2_history",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), f AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                    OR event_type IS DISTINCT FROM lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), s AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS version
      FROM f
    ), per AS (
      SELECT user_id, version, min(event_type) AS state,
             CAST(min(us) AS BIGINT) AS valid_from_us
      FROM s GROUP BY 1, 2
    )
    SELECT user_id, state, version, valid_from_us,
           lead(valid_from_us) OVER w2 AS valid_to_us,
           lead(valid_from_us) OVER w2 IS NULL AS is_current
    FROM per WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
    ORDER BY user_id, version
    """,
)
def events_scd2_history(spark, sf_dir):
    """SCD type-2 dimension build from the event change stream
    (``operators/events.py::scd2_history``): consecutive duplicate states
    collapse into validity intervals with effective from/to and a current
    flag — the warehouse-dimension construction, two user-partitioned
    window passes + one aggregate, no self-join."""
    ev = t(spark, sf_dir, "events")
    return _events.scd2_history(ev).orderBy("user_id", "version")


# --- CDC snapshot diff --------------------------------------------------------

_O_DIG = (
    "md5(coalesce('v:' || CAST(text AS VARCHAR), 'null')"
    " || coalesce('v:' || CAST(lang AS VARCHAR), 'null')"
    " || coalesce('v:' || CAST(source AS VARCHAR), 'null')"
    " || coalesce('v:' || CAST(n_chars AS VARCHAR), 'null'))"
)


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH newsnap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 5 THEN text || ' [edited]' ELSE text END
               AS text,
             lang, source, n_chars
      FROM documents WHERE doc_id % 17 <> 3
      UNION ALL
      SELECT doc_id + 1000000, text, lang, source, n_chars
      FROM documents WHERE doc_id % 13 = 2
    ), o AS (SELECT doc_id, {_O_DIG} AS old_digest FROM documents),
    n AS (SELECT doc_id, {_O_DIG} AS new_digest FROM newsnap)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'insert'
                WHEN n.doc_id IS NULL THEN 'delete'
                WHEN old_digest <> new_digest THEN 'update' END AS op,
           old_digest, new_digest
    FROM o FULL OUTER JOIN n USING (doc_id)
    WHERE (o.doc_id IS NULL OR n.doc_id IS NULL OR old_digest <> new_digest)
    ORDER BY doc_id
    """,
)
def cdc_snapshot_diff(spark, sf_dir):
    """Snapshot-diff CDC (``operators/scale.py::snapshot_diff``): the old
    corpus vs a deterministically mutated new snapshot (every 17th key
    deleted, every 11th text edited, every 13th re-keyed as an insert) —
    one digest-carrying full outer join on the key, inserts/deletes/
    updates classified and unchanged keys dropped before projection."""
    from opteryx_spark.operators import scale as _scale

    docs = t(spark, sf_dir, "documents")
    newsnap = (
        docs.filter(F.col("doc_id") % 17 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 11 == 5, F.concat(F.col("text"), F.lit(" [edited]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 13 == 2).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    )
    return _scale.snapshot_diff(docs, newsnap, ["doc_id"]).orderBy("doc_id")


def _bpe_encode_oracle() -> str:
    """Train CTEs from ``_bpe_oracle`` + a cross-joined merge row so the
    apply lambda captures the learned pairs as outer columns."""
    base = _bpe_oracle()
    head = base[: base.rindex("SELECT * FROM (")]
    mm_cols = ", ".join(
        f"(SELECT a FROM m{i}) AS a{i}, (SELECT b FROM m{i}) AS b{i}"
        for i in range(1, _BPE_MERGES + 1)
    )
    rep = "regexp_replace(t, '(.)', chr(31) || '\\1', 'g')"
    for i in range(1, _BPE_MERGES + 1):
        rep = (
            f"replace({rep}, chr(31) || a{i} || chr(31) || b{i},"
            f" chr(31) || a{i} || b{i})"
        )
    return (
        head
        + f"""
    , mm AS (SELECT {mm_cols})
    , enc AS (
      SELECT doc_id,
             list_transform({_O_TOKENS}, t -> {rep}) AS syms
      FROM documents CROSS JOIN mm
    )
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(syms,
             s -> length(s) - length(replace(s, chr(31), '')))), 0) AS BIGINT)
             AS n_bpe
    FROM enc ORDER BY doc_id
    """
    )


@register("text_bpe_encode", oracle=_bpe_encode_oracle(), oracle_cost_s=750.0)
def text_bpe_encode(spark, sf_dir):
    """BPE tokenizer APPLICATION (``operators/text.py::bpe_encode_counts``):
    encode every document with the 6 merges learned by ``bpe_train`` and
    count resulting tokens — the train/apply pair closed end-to-end, all
    map-side (the oracle re-derives the merges and applies them with the
    same greedy string mechanics)."""
    docs = t(spark, sf_dir, "documents")
    merges = [
        (r.lhs, r.rhs)
        for r in _text.bpe_train(docs, num_merges=_BPE_MERGES).collect()
    ]
    return _text.bpe_encode_counts(docs, merges).orderBy("doc_id")
