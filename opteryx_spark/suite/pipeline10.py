"""Suite wave 31 (round 8): text-quality signals (character-class
script profile, lexical diversity / hapax), temperature-scaled mixture
weights, per-user path n-grams, IGNORE-NULLS / default-argument window
parity, and the exact weighted median — registered after ``pipeline9``
(tier-1b order; the r8 cap bookkeeping lives in pipeline9's header)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opteryx_spark.operators import events as _events
from opteryx_spark.operators import filtering as _filtering
from opteryx_spark.operators import profile as _profile
from opteryx_spark.operators import text as _text
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t

_SCRIPT_COLS = [
    "n_chars", "n_letters", "n_digits", "n_spaces", "n_other",
    "letters_ppm", "digits_ppm", "spaces_ppm", "other_ppm",
]


@register(
    "text_script_profile",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  AS BIGINT) AS n_letters,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS n_digits,
             CAST(length(text) - length(regexp_replace(text, '[ \\t\\n\\r]', '', 'g'))
                  AS BIGINT) AS n_spaces
      FROM documents
    )
    SELECT doc_id, n_chars, n_letters, n_digits, n_spaces,
           n_chars - n_letters - n_digits - n_spaces AS n_other,
           CASE WHEN n_chars > 0 THEN (1000000 * n_letters) // n_chars END AS letters_ppm,
           CASE WHEN n_chars > 0 THEN (1000000 * n_digits) // n_chars END AS digits_ppm,
           CASE WHEN n_chars > 0 THEN (1000000 * n_spaces) // n_chars END AS spaces_ppm,
           CASE WHEN n_chars > 0
                THEN (1000000 * (n_chars - n_letters - n_digits - n_spaces)) // n_chars
           END AS other_ppm
    FROM m ORDER BY doc_id
    """,
)
def text_script_profile(spark, sf_dir):
    """Per-document character-class profile
    (``operators/text.py::script_profile``): letter/digit/whitespace/
    other counts and truncating ppm shares from pure
    ``regexp_replace`` length arithmetic — map-only, zero shuffle, the
    cheap script/garbage screen beside ``char_entropy``.  NULL text
    propagates NULL (never silent zeros)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return _text.script_profile(d).select("doc_id", *_SCRIPT_COLS).orderBy("doc_id")


@register(
    "text_lexical_diversity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t AS tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE text IS NOT NULL
      ) WHERE t <> ''
    ),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    per AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      FROM tc GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(p.n_tokens, 0) END AS n_tokens,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(p.n_types, 0) END AS n_types,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(p.hapax, 0) END AS hapax,
           CASE WHEN coalesce(p.n_tokens, 0) > 0
                THEN (1000000 * p.n_types) // p.n_tokens END AS ttr_ppm,
           CASE WHEN coalesce(p.n_types, 0) > 0
                THEN (1000000 * p.hapax) // p.n_types END AS hapax_ppm
    FROM documents d LEFT JOIN per p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_lexical_diversity(spark, sf_dir):
    """Per-document type-token ratio and hapax share
    (``operators/text.py::lexical_diversity``): zero-shuffle — both
    counts fall out of neighbor comparisons over the per-row SORTED
    token array (the ``repetition_metrics`` strategy), no explode, no
    groupBy; the oracle derives the same numbers relationally."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        _text.lexical_diversity(d)
        .select("doc_id", "n_tokens", "n_types", "hapax", "ttr_ppm", "hapax_ppm")
        .orderBy("doc_id")
    )


@register(
    "sample_temperature_weights",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    i AS (
      SELECT lang, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS isqrt_n
      FROM c
    ),
    tt AS (SELECT CAST(sum(isqrt_n) AS BIGINT) AS tot FROM i)
    SELECT lang, n_docs, isqrt_n,
           (1000000 * isqrt_n) // tot AS weight_ppm
    FROM i, tt ORDER BY lang
    """,
)
def sample_temperature_weights(spark, sf_dir):
    """Temperature-scaled (α = 1/2) mixture weights per language
    (``operators/filtering.py::temperature_weights``): sampling shares
    ∝ √n upweight low-resource strata (the multilingual balancing
    rule).  α is pinned at 1/2 because IEEE ``sqrt`` is correctly
    rounded — ``floor(sqrt(n))`` is the exact integer square root in
    any engine, so the whole computation is integer ``div`` arithmetic.
    NULL lang is a real stratum."""
    d = t(spark, sf_dir, "documents")
    return _filtering.temperature_weights(d, "lang").orderBy("lang")


@register(
    "events_top_paths",
    oracle="""
    WITH b AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id,
             coalesce(CAST(event_type AS VARCHAR), '∅') AS et
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
    ),
    s AS (
      SELECT et, lead(et, 1) OVER w AS e2, lead(et, 2) OVER w AS e3
      FROM b WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    ),
    p AS (
      SELECT et || '>' || e2 || '>' || e3 AS path FROM s WHERE e3 IS NOT NULL
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_paths
    FROM p GROUP BY path
    ORDER BY n_paths DESC, path ASC LIMIT 10
    """,
)
def events_top_paths(spark, sf_dir):
    """Top-10 per-user event-type trigram paths
    (``operators/events.py::path_ngrams``): ONE user-partitioned window
    (both leads share its sort) + one count aggregate; NULL types
    become an explicit '∅' step, NULL user/ts/event_id rows are
    excluded (the order key must be total for cross-engine
    determinism).  The (count DESC, path) order makes the LIMIT
    boundary unique."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    out = _events.path_ngrams(
        ev,
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))"),
        "event_type",
        n=3,
        tiebreak_col="event_id",
    )
    return out.orderBy(F.col("n_paths").desc(), F.col("path").asc()).limit(10)


@register(
    "window_value_functions",
    oracle="""
    WITH b AS (
      SELECT event_id, event_type, value,
             CASE WHEN value >= 500 THEN value END AS v2
      FROM events WHERE event_id IS NOT NULL
    )
    SELECT event_id, event_type, v2,
           first_value(v2 IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_hi,
           last_value(v2 IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_hi,
           lead(event_id, 2, -1) OVER (
             PARTITION BY event_type ORDER BY event_id) AS next2_id,
           lag(event_id, 3, -999) OVER (
             PARTITION BY event_type ORDER BY event_id) AS prev3_id
    FROM b ORDER BY event_id
    """,
)
def window_value_functions(spark, sf_dir):
    """Value-family window parity: FIRST_VALUE / LAST_VALUE with IGNORE
    NULLS over running/reversed frames, LEAD/LAG with explicit
    defaults — completing §2.5 beside the rank family
    (``window_rank_variants``).  Unique non-NULL order key by contract
    (NULL order placement is engine-dependent)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    v2 = F.when(F.col("value") >= 500, F.col("value"))
    w = Window.partitionBy("event_type").orderBy("event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # r11 (registry-wide sweep): LAST_VALUE IGNORE NULLS over
    # [CURRENT ROW, UNBOUNDED FOLLOWING] hits Spark's
    # UnboundedFollowingWindowFunctionFrame, which RE-SCANS the whole
    # suffix per row — O(rows²) per partition, 111 s at sf0.1.  The
    # identical value (order key unique by this entry's contract) is
    # FIRST_VALUE IGNORE NULLS over the DESCENDING running frame, which
    # Spark processes incrementally — O(rows); measured 61 s -> 3.9 s,
    # row-identical on the full sf0.1 output.  Same SQL text for the
    # oracle (DuckDB computes the reversed-frame form in O(n) natively).
    wd = (
        Window.partitionBy("event_type")
        .orderBy(F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("event_id", "event_type", v2.alias("v2"))
        .select(
            "event_id",
            "event_type",
            "v2",
            F.first("v2", ignorenulls=True).over(run).alias("first_hi"),
            F.first("v2", ignorenulls=True).over(wd).alias("last_hi"),
            F.lead("event_id", 2, -1).over(w).alias("next2_id"),
            F.lag("event_id", 3, -999).over(w).alias("prev3_id"),
        )
        .orderBy("event_id")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH b AS (
      SELECT event_type, value AS v, (event_id % 5) + 1 AS w
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
    ),
    c AS (
      SELECT event_type, v,
             CAST(sum(w) OVER (PARTITION BY event_type ORDER BY v
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
             CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      FROM b
    )
    SELECT event_type, CAST(min(tot) AS BIGINT) AS total_weight,
           min(v) AS weighted_median
    FROM c WHERE 2 * cumw >= tot
    GROUP BY event_type ORDER BY event_type
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Exact per-type weighted (lower) median of the event value with
    deterministic integer weights (``operators/profile.py::
    weighted_median``): RANGE-frame cumulative weight (tie rows share
    their run, so the result is a function of the VALUE) + a min keeper
    over qualifying rows — the weighted aggregate Spark lacks natively,
    exact integer arithmetic end to end."""
    ev = t(spark, sf_dir, "events")
    weighted = ev.select(
        "event_type",
        "value",
        ((F.col("event_id") % 5) + 1).alias("w"),
    )
    return _profile.weighted_median(
        weighted, ["event_type"], "value", "w"
    ).orderBy("event_type")
