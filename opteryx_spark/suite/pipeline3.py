"""Round-5 curation-pipeline suite entries: per-URL/domain operators
(C4/RefinedWeb-style), readability scores, and the unigram perplexity
gate.  Every entry carries a bit-exact DuckDB oracle.

The driver corpus has no URL column, so the web entries attach one
deterministically derived from ``doc_id``/``source`` (same expression on
both sides) — it exercises subdomains, multi-label public suffixes,
ports, querystrings, and malformed values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import filtering, text, web
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t

_O_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"


# --- deterministic URL fixture (Spark + SQL twins) ---------------------------


def _with_urls(docs):
    d = F.col("doc_id")
    host = (
        F.when(d % 6 == 0, F.lit("www.alpha-news.com"))
        .when(d % 6 == 1, F.lit("cdn.beta.co.uk"))
        .when(d % 6 == 2, F.lit("gamma.io"))
        .when(d % 6 == 3, F.lit("sub.delta.com.au"))
        .when(d % 6 == 4, F.lit("blog.epsilon.org"))
        .otherwise(F.lit("localhost:8080"))
    )
    url = F.concat(
        F.lit("http"),
        F.when(d % 2 == 0, F.lit("s")).otherwise(F.lit("")),
        F.lit("://"),
        host,
        F.lit("/"),
        F.col("source"),
        F.lit("/"),
        d.cast("string"),
        F.when(d % 7 == 0, F.lit("?ref=rss")).otherwise(F.lit("")),
    )
    return docs.withColumn("url", F.when(d % 13 == 3, F.lit("not a url")).otherwise(url))


_O_URL_CTE = """
    WITH u AS (
      SELECT *,
        CASE WHEN doc_id % 13 = 3 THEN 'not a url' ELSE
          'http' || CASE WHEN doc_id % 2 = 0 THEN 's' ELSE '' END || '://' ||
          CASE doc_id % 6
            WHEN 0 THEN 'www.alpha-news.com'
            WHEN 1 THEN 'cdn.beta.co.uk'
            WHEN 2 THEN 'gamma.io'
            WHEN 3 THEN 'sub.delta.com.au'
            WHEN 4 THEN 'blog.epsilon.org'
            ELSE 'localhost:8080' END ||
          '/' || source || '/' || CAST(doc_id AS VARCHAR) ||
          CASE WHEN doc_id % 7 = 0 THEN '?ref=rss' ELSE '' END
        END AS url
      FROM documents
    )
"""

# SQL twins of operators/web.py's component regexes (RE2-safe: explicit
# classes, no lookaround — identical semantics under Java regex and RE2)
_O_SCHEME = "NULLIF(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$', 1), '')"
_O_HOST = (
    "NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*).*$', 1), '')"
)
_O_PORT = (
    "CAST(NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+).*$', 1), '')"
    " AS BIGINT)"
)
_O_PATH = (
    "NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*).*$', 1), '')"
)
_O_QUERY = (
    "NULLIF(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*\\?([^#]*).*$', 1), '')"
)

_O_SUFFIX_LIST = ", ".join(f"'{s}'" for s in web.MULTI_SUFFIXES)


def _o_domain(host_expr: str) -> str:
    """SQL twin of web.registered_domain (DuckDB list ops)."""
    return f"""(
      SELECT CASE
        WHEN h IS NULL THEN NULL
        WHEN len(p) <= 2 THEN h
        WHEN (p[-2] || '.' || p[-1]) IN ({_O_SUFFIX_LIST})
          THEN p[-3] || '.' || p[-2] || '.' || p[-1]
        ELSE p[-2] || '.' || p[-1]
      END
      FROM (SELECT {host_expr} AS h, string_split({host_expr}, '.') AS p)
    )"""


@register(
    "web_parse_urls",
    oracle=_O_URL_CTE
    + f"""
    SELECT doc_id, url,
           {_O_SCHEME} AS scheme,
           {_O_HOST} AS host,
           {_O_PORT} AS port,
           {_O_PATH} AS path,
           {_O_QUERY} AS query,
           {_o_domain(_O_HOST)} AS domain
    FROM u ORDER BY doc_id
    """,
)
def web_parse_urls(spark, sf_dir):
    """URL component parsing + registered-domain reduction
    (``operators/web.py::parse_urls``): scheme/host/port/path/query via
    RE2-safe regexes, multi-label public-suffix handling, NULL components
    for malformed values.  Map-only."""
    docs = _with_urls(t(spark, sf_dir, "documents"))
    return (
        web.parse_urls(docs)
        .select("doc_id", "url", "scheme", "host", "port", "path", "query", "domain")
        .orderBy("doc_id")
    )


@register(
    "web_domain_quota",
    oracle=_O_URL_CTE
    + f"""
    , d AS (SELECT doc_id, {_o_domain(_O_HOST)} AS domain FROM u)
    SELECT doc_id, domain FROM (
      SELECT doc_id, domain,
             row_number() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM d) x
    WHERE rn <= 5 ORDER BY doc_id
    """,
)
def web_domain_quota(spark, sf_dir):
    """Per-domain document cap (``web.py::domain_quota``), the
    RefinedWeb-style anti-domination budget: at most 5 docs per
    registered domain, selected by the engine's canonical md5-of-id quota
    order (partition-invariant).  One per-domain window; unparseable URLs
    quota together under domain NULL by documented design."""
    docs = _with_urls(t(spark, sf_dir, "documents"))
    return web.domain_quota(docs, 5).select("doc_id", "domain").orderBy("doc_id")


@register(
    "web_domain_blocklist",
    oracle=_O_URL_CTE
    + f"""
    SELECT doc_id,
           coalesce({_o_domain(_O_HOST)} IN ('gamma.io', 'delta.com.au'), FALSE)
             AS blocked_domain
    FROM u ORDER BY doc_id
    """,
)
def web_domain_blocklist(spark, sf_dir):
    """Domain blocklist gate (``web.py::domain_blocklist``): flag docs
    whose registered domain is listed (C4-style badlist filtering);
    subdomains of a listed domain are caught because matching happens at
    the registered-domain level.  Literal IN — zero data movement."""
    docs = _with_urls(t(spark, sf_dir, "documents"))
    return (
        web.domain_blocklist(docs, ["gamma.io", "delta.com.au"])
        .select("doc_id", "blocked_domain")
        .orderBy("doc_id")
    )


@register(
    "text_readability",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             CASE WHEN text IS NOT NULL THEN greatest(CAST(1 AS BIGINT),
               CAST(len(regexp_extract_all(text, '([.!?]+)', 1)) AS BIGINT)) END
               AS n_sentences,
             CASE WHEN text IS NOT NULL THEN CAST(len({_O_TOKENS}) AS BIGINT) END
               AS n_words,
             CASE WHEN text IS NOT NULL THEN
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform({_O_TOKENS}, w -> greatest(CAST(1 AS BIGINT),
                   CAST(len(regexp_extract_all(lower(w), '([aeiouy]+)', 1)) AS BIGINT)))),
                 (a, b) -> a + b) END AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_sentences, n_words, n_syllables,
           CASE WHEN n_words > 0 THEN
             (206.835 - (1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))))
              - (84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
           END AS flesch_reading_ease,
           CASE WHEN n_words > 0 THEN
             ((0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)))
              + (11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))) - 15.59
           END AS fk_grade
    FROM c ORDER BY doc_id
    """,
)
def text_readability(spark, sf_dir):
    """Readability heuristics (``text.py::readability_scores``): integer
    sentence/word/vowel-group-syllable counts, Flesch reading ease and
    Flesch-Kincaid grade as single-op double arithmetic (bit-deterministic
    across engines).  Map-only, zero shuffle."""
    docs = t(spark, sf_dir, "documents")
    return text.readability_scores(docs).select(
        "doc_id", "n_sentences", "n_words", "n_syllables",
        "flesch_reading_ease", "fk_grade",
    ).orderBy("doc_id")


@register(
    "text_perplexity_filter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_O_TOKENS}) AS tok FROM documents
    ), tf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(tf) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM tf
    ), lp AS (
      SELECT tok,
             CAST(FLOOR((-LN((CAST(tf AS DOUBLE) + 0.5)
                 / (CAST(n AS DOUBLE) + (0.5 * CAST(v AS DOUBLE)))))
               * 1000.0 + 0.5) AS BIGINT) AS nll
      FROM tf, tot
    ), doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(nll) AS BIGINT) AS nll_millinats
      FROM tok JOIN lp USING (tok) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(doc.n_tokens, 0) AS n_tokens,
           coalesce(doc.nll_millinats, 0) AS nll_millinats,
           CASE WHEN coalesce(doc.n_tokens, 0) > 0 THEN
             CAST(doc.nll_millinats AS DOUBLE) / CAST(doc.n_tokens AS DOUBLE)
           END AS avg_nll_millinats,
           coalesce(CAST(doc.nll_millinats AS DOUBLE) / CAST(doc.n_tokens AS DOUBLE)
                      <= 4100.0, FALSE) AS passes_perplexity
    FROM documents d LEFT JOIN doc USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_perplexity_filter(spark, sf_dir):
    """Unigram perplexity gate (``filtering.py::unigram_perplexity``):
    additive-smoothed self-trained LM, per-token cost quantized to integer
    millinats (the fixed-point determinism strategy — exact BIGINT totals,
    engine-identical), threshold on the mean cost.  Threshold 4100 mn
    splits this corpus.  Word-count agg + broadcast cost join + per-doc
    reduce; no driver collect."""
    docs = t(spark, sf_dir, "documents")
    return filtering.unigram_perplexity(
        docs, max_avg_nll_millinats=4100, broadcast_costs=True
    ).select(
        "doc_id", "n_tokens", "nll_millinats", "avg_nll_millinats", "passes_perplexity"
    ).orderBy("doc_id")


@register(
    "sample_token_budget",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang, source,
             coalesce(CAST(len({_O_TOKENS}) AS BIGINT), CAST(0 AS BIGINT))
               AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, lang, source, n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tokens_before
      FROM c
    )
    SELECT doc_id, lang, source, n_tokens, tokens_before,
           (tokens_before + n_tokens) <= 500 AS in_budget
    FROM r ORDER BY doc_id
    """,
)
def sample_token_budget(spark, sf_dir):
    """Token-budget mixture sampling (``filtering.token_budget_sample``):
    per (lang, source) stratum, admit docs in the canonical md5 order
    while the running TOKEN total fits a 500-token budget — training
    mixtures weight tokens, not documents.  One per-stratum window."""
    docs = t(spark, sf_dir, "documents")
    return (
        filtering.token_budget_sample(docs, ["lang", "source"], 500)
        .select("doc_id", "lang", "source", "n_tokens", "tokens_before", "in_budget")
        .orderBy("doc_id")
    )


@register(
    "text_boilerplate_fraction",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len({_O_TOKENS})-1),
               i -> concat_ws(' ', {_O_TOKENS}[i], {_O_TOKENS}[i+1], {_O_TOKENS}[i+2]))))
               AS gram
      FROM documents
    ), hot AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 25
    ), per_doc AS (
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(h.gram) AS BIGINT) AS n_hot_grams
      FROM g LEFT JOIN hot h USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(p.n_hot_grams, 0) AS n_hot_grams,
           CASE WHEN coalesce(p.n_grams, 0) > 0 THEN
             CAST(p.n_hot_grams AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
           END AS boilerplate_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_boilerplate_fraction(spark, sf_dir):
    """Cross-document boilerplate signal
    (``filtering.boilerplate_ngram_fraction``): fraction of a doc's
    distinct trigrams appearing in more than 25 documents — the scalable
    cousin of exact substring dedup (Lee et al. 2021).  Word-count shape
    + broadcast hot-gram join; no all-pairs."""
    docs = t(spark, sf_dir, "documents")
    return (
        filtering.boilerplate_ngram_fraction(docs, k=3, max_df=25)
        .select("doc_id", "n_grams", "n_hot_grams", "boilerplate_frac")
        .orderBy("doc_id")
    )


@register(
    "dedup_chunk_fraction",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ), tk AS (
      SELECT doc_id, {_O_TOKENS} AS t FROM corpus
    ), ch AS (
      SELECT doc_id,
             array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ') AS chunk_text
      FROM tk, LATERAL unnest(range(0,
        greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS u(i)
    ), good AS (
      SELECT doc_id, chunk_text FROM ch
      WHERE len(list_filter(string_split(chunk_text, ' '), x -> x <> '')) >= 4
    ), dup AS (
      SELECT chunk_text FROM good GROUP BY chunk_text
      HAVING COUNT(DISTINCT doc_id) >= 2
    ), per_doc AS (
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(COUNT(d.chunk_text) AS BIGINT) AS n_dup_chunks
      FROM good g LEFT JOIN dup d USING (chunk_text) GROUP BY g.doc_id
    )
    SELECT c.doc_id,
           coalesce(p.n_chunks, 0) AS n_chunks,
           coalesce(p.n_dup_chunks, 0) AS n_dup_chunks,
           CASE WHEN coalesce(p.n_chunks, 0) > 0 THEN
             CAST(p.n_dup_chunks AS DOUBLE) / CAST(p.n_chunks AS DOUBLE)
           END AS dup_chunk_frac
    FROM corpus c LEFT JOIN per_doc p USING (doc_id)
    ORDER BY c.doc_id
    """,
)
def dedup_chunk_fraction(spark, sf_dir):
    """Window-level duplicate-chunk fraction
    (``dedup.duplicate_chunk_fraction``): share of a doc's 16-token
    windows that occur verbatim in another document — C4's
    line-frequency pass for corpora without line structure.  The fixture
    unions in copies of every 10th doc so both duplicated and clean
    windows are exercised.  Chunking is map-only; keys aggregate by md5
    digest (uniform); no all-pairs."""
    from opteryx_spark.operators import dedup as D

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return (
        D.duplicate_chunk_fraction(corpus, chunk_tokens=16, min_chunk_tokens=4)
        .select("doc_id", "n_chunks", "n_dup_chunks", "dup_chunk_frac")
        .orderBy("doc_id")
    )


# --- line-level boilerplate (C4 line-frequency pass) -------------------------
#
# The driver corpus has no newlines, so the entry synthesizes a
# line-structured twin deterministically in BOTH engines: a global
# boilerplate header (every doc), a per-group promo line (doc_id % 5),
# then the original text split into 4-token lines.  Same recipe as the
# URL fixture above.


def _with_lines(docs):
    d = F.col("doc_id")
    return docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.lit("engine generated do not edit"),
            F.concat(F.lit("promo block "), (d % 5).cast("string")),
            F.regexp_replace(F.col("text"), r"(\S+ \S+ \S+ \S+) ", "$1\n"),
        ),
    )


# concat_ws (not ||): Spark's F.concat_ws skips NULL pieces, so a
# NULL-text doc still gets the header+promo lines — the oracle must too
_O_LINES_SRC = r"""
    WITH src AS (
      SELECT doc_id,
             concat_ws(chr(10),
               'engine generated do not edit',
               'promo block ' || CAST(doc_id % 5 AS VARCHAR),
               regexp_replace(text, '(\S+ \S+ \S+ \S+) ', '\1' || chr(10), 'g'))
               AS text
      FROM documents
    )
"""


@register(
    "text_line_boilerplate",
    oracle=_O_LINES_SRC
    + """
    , lx AS (
      SELECT doc_id, pos, line FROM (
        SELECT doc_id, generate_subscripts(lines, 1) AS pos,
               trim(unnest(lines)) AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM src)
      ) WHERE line <> ''
    ), hot AS (
      SELECT md5(line) AS dg FROM lx
      GROUP BY md5(line) HAVING count(DISTINCT doc_id) >= 2
    ), m AS (
      SELECT l.doc_id, l.pos, l.line, (h.dg IS NOT NULL) AS bp
      FROM lx l LEFT JOIN hot h ON md5(l.line) = h.dg
    ), a AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate_lines,
             coalesce(string_agg(CASE WHEN NOT bp THEN line END,
                                 chr(10) ORDER BY pos), '') AS cleaned_text
      FROM m GROUP BY doc_id
    )
    SELECT s.doc_id,
           coalesce(a.n_lines, CAST(0 AS BIGINT)) AS n_lines,
           coalesce(a.n_boilerplate_lines, CAST(0 AS BIGINT))
             AS n_boilerplate_lines,
           CASE WHEN coalesce(a.n_lines, 0) > 0 THEN
             CAST(a.n_boilerplate_lines AS DOUBLE) / CAST(a.n_lines AS DOUBLE)
           END AS boilerplate_line_fraction,
           coalesce(a.cleaned_text, '') AS cleaned_text
    FROM src s LEFT JOIN a USING (doc_id)
    ORDER BY s.doc_id
    """,
)
def text_line_boilerplate(spark, sf_dir):
    """C4's line-frequency boilerplate pass
    (``filtering.remove_boilerplate_lines``): drop every line occurring
    in >= 2 distinct documents, rebuild the doc from the survivors in
    original order.  The global header and promo lines vanish from every
    doc; 4-token content lines vanish only where the small synthetic
    vocabulary collides across docs — both paths exercised.  Line
    frequency aggregates md5 digests; the hot set broadcasts; the rebuild
    is one id-keyed reduce."""
    docs = _with_lines(t(spark, sf_dir, "documents"))
    return (
        filtering.remove_boilerplate_lines(docs, min_doc_freq=2)
        .select(
            "doc_id",
            "n_lines",
            "n_boilerplate_lines",
            "boilerplate_line_fraction",
            "cleaned_text",
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_remove_chunks",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ), tk AS (
      SELECT doc_id, {_O_TOKENS} AS t FROM corpus
    ), ch AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ') AS chunk_text
      FROM tk, LATERAL unnest(range(0,
        greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS u(i)
    ), rm AS (
      SELECT doc_id, chunk_idx FROM (
        SELECT doc_id, chunk_idx,
               row_number() OVER (PARTITION BY chunk_text
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id, chunk_idx) AS rn
        FROM ch
        WHERE len(list_filter(string_split(chunk_text, ' '), x -> x <> '')) >= 4
      ) WHERE rn > 1
    ), agg AS (
      SELECT c.doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed_chunks,
             coalesce(string_agg(CASE WHEN r.doc_id IS NULL THEN c.chunk_text END,
                                 ' ' ORDER BY c.chunk_idx), '') AS cleaned_text
      FROM ch c LEFT JOIN rm r
        ON c.doc_id = r.doc_id AND c.chunk_idx = r.chunk_idx
      GROUP BY c.doc_id
    )
    SELECT co.doc_id,
           CASE WHEN co.text IS NOT NULL THEN
             coalesce(a.n_chunks, CAST(0 AS BIGINT)) END AS n_chunks,
           CASE WHEN co.text IS NOT NULL THEN
             coalesce(a.n_removed_chunks, CAST(0 AS BIGINT)) END
             AS n_removed_chunks,
           CASE WHEN co.text IS NOT NULL THEN
             coalesce(a.cleaned_text, '') END AS cleaned_text
    FROM corpus co LEFT JOIN agg a USING (doc_id)
    ORDER BY co.doc_id
    """,
)
def dedup_remove_chunks(spark, sf_dir):
    """Exact substring dedup that acts (``dedup.remove_duplicate_chunks``,
    the Lee et al. ExactSubstr analogue): keep ONE canonical occurrence of
    each duplicated 16-token window corpus-wide, drop the rest, rebuild
    docs from survivors.  Same copies-unioned fixture as
    ``dedup_chunk_fraction`` (its measuring twin): copied docs lose every
    window to the canonical keeper; partially-shared windows drop only
    where the small vocabulary collides.  One digest-keyed rank window
    (text stays out of the skew-prone exchange), per-(id, idx) removal
    join, id-keyed rebuild."""
    from opteryx_spark.operators import dedup as D

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return (
        D.remove_duplicate_chunks(corpus, chunk_tokens=16, min_chunk_tokens=4)
        .select("doc_id", "n_chunks", "n_removed_chunks", "cleaned_text")
        .orderBy("doc_id")
    )


@register(
    "curate_pipeline_v3",
    # full SQL twin of curate.curate_corpus_v3: line-frequency removal ->
    # exact-substring chunk dedup -> quality/length gates -> exact dedup,
    # with per-doc token accounting.  Composed from the proven
    # text_line_boilerplate and dedup_remove_chunks oracle shapes.  The
    # copies keep their content on ONE line so the line stage cannot see
    # them (different line hashes) but the chunk stage must (shared
    # 16-token windows) — each rewrite stage is exercised independently.
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             concat_ws(chr(10), 'engine generated do not edit',
               'promo block ' || CAST(doc_id % 5 AS VARCHAR),
               regexp_replace(text, '(\S+ \S+ \S+ \S+) ', '\1' || chr(10), 'g'))
               AS text
      FROM documents
    ), corpus AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT d.doc_id + 1000000 AS doc_id,
             concat_ws(chr(10), 'engine generated do not edit',
               'promo block ' || CAST(d.doc_id % 5 AS VARCHAR), d.text) AS text
      FROM documents d WHERE d.doc_id % 10 = 0
    ), lx AS (
      SELECT doc_id, pos, line FROM (
        SELECT doc_id, generate_subscripts(lines, 1) AS pos,
               trim(unnest(lines)) AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus)
      ) WHERE line <> ''
    ), hot AS (
      SELECT md5(line) AS dg FROM lx
      GROUP BY md5(line) HAVING count(DISTINCT doc_id) >= 2
    ), l1 AS (
      SELECT l.doc_id,
             string_agg(CASE WHEN h.dg IS NULL THEN l.line END,
                        ' ' ORDER BY l.pos) AS t1
      FROM lx l LEFT JOIN hot h ON md5(l.line) = h.dg
      GROUP BY l.doc_id
    ), s1 AS (
      SELECT c.doc_id,
             CAST(len(list_filter(string_split(replace(c.text, chr(10), ' '), ' '),
                  x -> x <> '')) AS BIGINT) AS n_tokens_raw,
             coalesce(l1.t1, '') AS t1
      FROM corpus c LEFT JOIN l1 USING (doc_id)
    ), tk AS (
      SELECT doc_id, n_tokens_raw,
             list_filter(string_split(t1, ' '), x -> x <> '') AS t
      FROM s1
    ), ch AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ') AS chunk_text
      FROM tk, LATERAL unnest(range(0,
        greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS u(i)
    ), rm AS (
      SELECT doc_id, chunk_idx FROM (
        SELECT doc_id, chunk_idx,
               row_number() OVER (PARTITION BY chunk_text
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id, chunk_idx) AS rn
        FROM ch
        WHERE len(list_filter(string_split(chunk_text, ' '), x -> x <> '')) >= 4
      ) WHERE rn > 1
    ), c2 AS (
      SELECT c.doc_id,
             coalesce(string_agg(CASE WHEN r.doc_id IS NULL THEN c.chunk_text END,
                                 ' ' ORDER BY c.chunk_idx), '') AS final_text
      FROM ch c LEFT JOIN rm r
        ON c.doc_id = r.doc_id AND c.chunk_idx = r.chunk_idx
      GROUP BY c.doc_id
    ), stats AS (
      SELECT tk.doc_id, tk.n_tokens_raw, c2.final_text,
             CAST(len(list_filter(string_split(c2.final_text, ' '),
                  x -> x <> '')) AS BIGINT) AS n_final
      FROM tk JOIN c2 USING (doc_id)
    ), q AS (
      SELECT *,
        CASE WHEN n_final > 0 THEN
          CAST(len(list_distinct(list_filter(string_split(final_text, ' '),
               x -> x <> ''))) AS DOUBLE) / CAST(n_final AS DOUBLE) * 0.5
          + (CASE WHEN n_final >= 20 THEN 1.0
                  ELSE CAST(n_final AS DOUBLE) / 20.0 END) * 0.5
        END AS quality,
        CASE WHEN n_final > 0 THEN md5(final_text) END AS digest
      FROM stats
    ), keep AS (
      SELECT digest, MIN(doc_id) AS keep_id
      FROM q WHERE digest IS NOT NULL GROUP BY digest
    )
    SELECT q.doc_id, q.n_tokens_raw, q.n_final AS n_tokens_final, q.final_text,
           CASE WHEN q.final_text IS NULL THEN 'invalid_text'
                WHEN q.n_final = 0 THEN 'all_removed'
                WHEN q.n_final < 10 THEN 'too_short'
                WHEN q.quality < 0.4 THEN 'low_quality'
                WHEN q.doc_id <> k.keep_id THEN 'exact_duplicate'
                ELSE 'kept' END AS outcome
    FROM q LEFT JOIN keep k ON k.digest = q.digest
    ORDER BY q.doc_id
    """,
)
def curate_pipeline_v3(spark, sf_dir):
    """The text-REWRITING curation pipeline (``curate.curate_corpus_v3``):
    C4-order composition of the acting operators — line-frequency
    boilerplate removal, then exact-substring chunk dedup, then quality/
    length gates and exact dedup over what REMAINS, with per-doc
    token-loss accounting.  Copies of every 10th doc carry their content
    on a single line, so the line stage strips only the shared chrome
    while the chunk stage catches the window-level duplication — the two
    rewrite stages are verified independently inside one composed run."""
    from opteryx_spark.operators import curate

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    base = _with_lines(docs).select("doc_id", "text")
    copies = docs.filter(d % 10 == 0).select(
        (d + 1000000).alias("doc_id"),
        F.concat_ws(
            "\n",
            F.lit("engine generated do not edit"),
            F.concat(F.lit("promo block "), (d % 5).cast("string")),
            F.col("text"),
        ).alias("text"),
    )
    corpus = base.unionByName(copies)
    return (
        curate.curate_corpus_v3(corpus)
        .select("doc_id", "n_tokens_raw", "n_tokens_final", "final_text", "outcome")
        .orderBy("doc_id")
    )


@register(
    "dedup_remove_corpus_chunks",
    oracle=f"""
    WITH newd AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
    ), ridx AS (
      SELECT DISTINCT md5(chunk_text) AS ck FROM (
        SELECT array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ')
          AS chunk_text
        FROM (SELECT {_O_TOKENS} AS t FROM documents WHERE doc_id < 250),
             LATERAL unnest(range(0,
               greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS u(i)
      ) WHERE len(list_filter(string_split(chunk_text, ' '), x -> x <> '')) >= 4
    ), ch AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ')
               AS chunk_text
      FROM (SELECT doc_id, {_O_TOKENS} AS t FROM newd),
           LATERAL unnest(range(0,
             greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS u(i)
    ), m AS (
      SELECT c.doc_id, c.chunk_idx, c.chunk_text,
             (len(list_filter(string_split(c.chunk_text, ' '), x -> x <> '')) >= 4
              AND r.ck IS NOT NULL) AS rm
      FROM ch c LEFT JOIN ridx r ON md5(c.chunk_text) = r.ck
    ), agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed_chunks,
             coalesce(string_agg(CASE WHEN NOT rm THEN chunk_text END,
                                 ' ' ORDER BY chunk_idx), '') AS cleaned_text
      FROM m GROUP BY doc_id
    )
    SELECT n.doc_id,
           CASE WHEN n.text IS NOT NULL THEN
             coalesce(a.n_chunks, CAST(0 AS BIGINT)) END AS n_chunks,
           CASE WHEN n.text IS NOT NULL THEN
             coalesce(a.n_removed_chunks, CAST(0 AS BIGINT)) END
             AS n_removed_chunks,
           CASE WHEN n.text IS NOT NULL THEN
             coalesce(a.cleaned_text, '') END AS cleaned_text
    FROM newd n LEFT JOIN agg a USING (doc_id)
    ORDER BY n.doc_id
    """,
)
def dedup_remove_corpus_chunks(spark, sf_dir):
    """Incremental exact-substring dedup that acts
    (``dedup.remove_chunks_in_corpus``): docs >= 250 are the new crawl,
    docs < 250 the accepted corpus; every 16-token window of a new doc
    already present in the corpus is removed (membership IS the verdict —
    the keeper lives in the corpus), docs rebuilt from survivors.  The
    window-level acting twin of ``dedup_incremental_exact``; one digest
    join against the offline index, per-doc rebuild."""
    from opteryx_spark.operators import dedup as D

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") >= 250)
    ref = docs.filter(F.col("doc_id") < 250)
    return (
        D.remove_chunks_in_corpus(new, ref, chunk_tokens=16, min_chunk_tokens=4)
        .select("doc_id", "n_chunks", "n_removed_chunks", "cleaned_text")
        .orderBy("doc_id")
    )


@register(
    "sample_split_no_leakage",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len({_O_TOKENS})),
        i -> concat_ws(' ', {_O_TOKENS}[i], {_O_TOKENS}[i+1])))) AS s
      FROM documents
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ), ov AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS ov
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id1, id2
      FROM ov JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
      WHERE CAST(ov AS DOUBLE) / CAST(sa.n + sb.n - ov AS DOUBLE) >= 0.8
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), walk(node, comp) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
      UNION
      SELECT e.a, w.comp FROM edges e JOIN walk w ON w.node = e.b
    ), labels AS (
      SELECT node, MIN(comp) AS comp FROM walk GROUP BY node
    ), keyed AS (
      SELECT d.doc_id, l.comp,
             CAST(coalesce(l.comp, d.doc_id) AS VARCHAR) AS skey
      FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
    ), b AS (
      SELECT doc_id, comp,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 9), i ->
                 CAST(strpos('0123456789abcdef',
                             substring(md5(skey), i, 1)) - 1 AS BIGINT))),
               (a, c) -> a * 16 + c) AS bucket
      FROM keyed
    )
    SELECT doc_id, comp,
           CASE WHEN bucket < {int(0.8 * 4294967296)} THEN 'train'
                WHEN bucket < {int(0.9 * 4294967296)} THEN 'val'
                ELSE 'test' END AS split
    FROM b ORDER BY doc_id
    """,
)
def sample_split_no_leakage(spark, sf_dir):
    """Leakage-safe splitting (``scale.split_assign_grouped``): near-dup
    clusters (exact bigram-Jaccard >= 0.8 pairs → connected components)
    key the md5-bucket split TOGETHER, so no near-duplicate pair ever
    straddles the train/test boundary.  Checked against a recursive-CTE
    components + bucket-arithmetic ground truth."""
    from opteryx_spark.operators import scale

    docs = t(spark, sf_dir, "documents")
    from opteryx_spark.operators import dedup as D

    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", k=2, threshold=0.8)
    return (
        scale.split_assign_grouped(
            docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        .select("doc_id", "comp", "split")
        .orderBy("doc_id")
    )


# features oracle body, shared by text_quality_features and the
# learned-gate entry (same matrix, different head)
_O_QF_BODY = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_O_TOKENS}) AS tk FROM documents
    ), tf AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY tk
    ), tot AS (
      SELECT CAST(SUM(tf) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM tf
    ), lp AS (
      SELECT tk,
             CAST(FLOOR((-LN((CAST(tf AS DOUBLE) + 0.5)
                 / (CAST(n AS DOUBLE) + (0.5 * CAST(v AS DOUBLE)))))
               * 1000.0 + 0.5) AS BIGINT) AS nll
      FROM tf, tot
    ), pdoc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS p_n,
             CAST(SUM(nll) AS BIGINT) AS nllm
      FROM tok JOIN lp USING (tk) GROUP BY doc_id
    ), rd AS (
      SELECT doc_id,
             CASE WHEN text IS NOT NULL THEN greatest(CAST(1 AS BIGINT),
               CAST(len(regexp_extract_all(text, '([.!?]+)', 1)) AS BIGINT)) END
               AS n_sentences,
             CASE WHEN text IS NOT NULL THEN CAST(len({_O_TOKENS}) AS BIGINT) END
               AS n_words,
             CASE WHEN text IS NOT NULL THEN
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform({_O_TOKENS}, w -> greatest(CAST(1 AS BIGINT),
                   CAST(len(regexp_extract_all(lower(w), '([aeiouy]+)', 1)) AS BIGINT)))),
                 (a, b) -> a + b) END AS n_syllables
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len({_O_TOKENS})-1),
               i -> concat_ws(' ', {_O_TOKENS}[i], {_O_TOKENS}[i+1],
                              {_O_TOKENS}[i+2])))) AS gram
      FROM documents
    ), hot AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 10
    ), bp AS (
      SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(h.gram) AS BIGINT) AS n_hot
      FROM g LEFT JOIN hot h USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.text IS NOT NULL THEN CAST(len({_O_TOKENS}) AS BIGINT) END
             AS n_tokens,
           CASE WHEN len({_O_TOKENS}) > 0 THEN
             CAST(len(list_distinct({_O_TOKENS})) AS DOUBLE)
               / CAST(len({_O_TOKENS}) AS DOUBLE) END AS ttr,
           CASE WHEN rd.n_words > 0 THEN
             (206.835 - (1.015 * (CAST(rd.n_words AS DOUBLE)
                                  / CAST(rd.n_sentences AS DOUBLE))))
              - (84.6 * (CAST(rd.n_syllables AS DOUBLE)
                         / CAST(rd.n_words AS DOUBLE)))
           END AS flesch_reading_ease,
           CASE WHEN rd.n_words > 0 THEN
             ((0.39 * (CAST(rd.n_words AS DOUBLE)
                       / CAST(rd.n_sentences AS DOUBLE)))
              + (11.8 * (CAST(rd.n_syllables AS DOUBLE)
                         / CAST(rd.n_words AS DOUBLE)))) - 15.59
           END AS fk_grade,
           CASE WHEN coalesce(p.p_n, 0) > 0 THEN
             CAST(p.nllm AS DOUBLE) / CAST(p.p_n AS DOUBLE) END
             AS avg_nll_millinats,
           CASE WHEN coalesce(bp.n_grams, 0) > 0 THEN
             CAST(bp.n_hot AS DOUBLE) / CAST(bp.n_grams AS DOUBLE) END
             AS boilerplate_frac,
           CASE WHEN len({_O_TOKENS}) > 0 THEN
             (CAST(len(list_distinct({_O_TOKENS})) AS DOUBLE)
                / CAST(len({_O_TOKENS}) AS DOUBLE)) * 0.5
             + (CASE WHEN len({_O_TOKENS}) >= 20 THEN 1.0
                     ELSE CAST(len({_O_TOKENS}) AS DOUBLE) / 20.0 END) * 0.5
           END AS quality_score
    FROM documents d
    LEFT JOIN pdoc p USING (doc_id)
    LEFT JOIN rd USING (doc_id)
    LEFT JOIN bp USING (doc_id)
"""


@register(
    "text_quality_features",
    oracle=_O_QF_BODY + " ORDER BY doc_id",
)
def text_quality_features(spark, sf_dir):
    """Quality-classifier featurization (``filtering.quality_features``):
    the per-doc feature matrix a DCLM/RefinedWeb-style learned quality
    gate trains on — lexical size/diversity, readability, unigram
    perplexity, corpus-hot boilerplate share, and the composite
    heuristic, stitched by id-keyed joins from four independent linear
    passes.  NULL text → NULL features (classifiers must see missing)."""
    docs = t(spark, sf_dir, "documents")
    return filtering.quality_features(docs).orderBy("doc_id")


# ONE weight definition drives BOTH the Spark gate and its SQL twin —
# the logit expressions are generated from this dict in identical sorted
# order, so the double fold is bit-identical by construction.
_QGATE_W = {
    "ttr": 2.0,
    "flesch_reading_ease": 0.01,
    "avg_nll_millinats": -0.0005,
    "boilerplate_frac": -1.5,
    "quality_score": 1.0,
}
_QGATE_BIAS = -1.2

_O_QGATE_LOGIT = "(" + repr(float(_QGATE_BIAS)) + "".join(
    f" + ({float(w)!r} * coalesce(CAST({name} AS DOUBLE), 0.0))"
    for name, w in sorted(_QGATE_W.items())
) + ")"


@register(
    "text_quality_gate",
    oracle=f"""
    WITH f AS ({_O_QF_BODY})
    SELECT doc_id, logit,
           coalesce(logit >= 0.0, FALSE) AS passes_quality
    FROM (
      SELECT doc_id,
             CASE WHEN n_tokens IS NOT NULL THEN {_O_QGATE_LOGIT} END AS logit
      FROM f
    ) ORDER BY doc_id
    """,
)
def text_quality_gate(spark, sf_dir):
    """Learned quality gate (``filtering.quality_classifier_gate``): a
    fixed linear model scored over the feature matrix in the LOG-ODDS
    domain (sorted-order double fold — no sigmoid, so no libm
    divergence); NULL features impute 0, NULL text fails.  The oracle
    generates its logit expression from the SAME weight dict."""
    docs = t(spark, sf_dir, "documents")
    return (
        filtering.quality_classifier_gate(docs, _QGATE_W, bias=_QGATE_BIAS)
        .select("doc_id", "logit", "passes_quality")
        .orderBy("doc_id")
    )


@register(
    "sample_token_mixture",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang,
             coalesce(CAST(len({_O_TOKENS}) AS BIGINT), CAST(0 AS BIGINT))
               AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, lang, n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tokens_before,
             CAST(CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 1000
                            WHEN 'es' THEN 500 ELSE 0 END AS BIGINT)
               AS budget_tokens
      FROM c
    )
    SELECT doc_id, lang, n_tokens, tokens_before, budget_tokens,
           (tokens_before + n_tokens) <= budget_tokens AS in_budget
    FROM r ORDER BY doc_id
    """,
)
def sample_token_mixture(spark, sf_dir):
    """Domain-weighted mixture sampling
    (``filtering.token_mixture_sample``): per-language token budgets
    (en 3000 / de 1000 / es 500, everything else excluded) admitted in
    the canonical md5 order — the DoReMi/Pile recipe where strata are
    weighted, not uniform.  One per-stratum window; budget lookup is a
    literal CASE."""
    docs = t(spark, sf_dir, "documents")
    return (
        filtering.token_mixture_sample(
            docs, ["lang"], {"en": 3000, "de": 1000, "es": 500}
        )
        .select("doc_id", "lang", "n_tokens", "tokens_before",
                "budget_tokens", "in_budget")
        .orderBy("doc_id")
    )
