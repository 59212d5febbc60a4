"""Curation-pipeline suite entries, round 4 second wave: benchmark
decontamination, Gopher quality gates, stratified quota sampling,
vocabulary/document-frequency statistics, characteristic terms, and
cluster-bounded semantic dedup.

Every entry carries a bit-exact DuckDB oracle: all ratios are integer
numerator/denominator divisions, cosine folds left-to-right in doubles
(the same arithmetic the existing embedding oracles pin), and every
tie-break is total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import dedup, filtering, similarity, text
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t

_O_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"
_O_TRIGRAMS = (
    "list_distinct(list_transform(range(1, len({tk})-1), "
    "i -> concat_ws(' ', {tk}[i], {tk}[i+1], {tk}[i+2])))"
).format(tk=_O_TOKENS)
_O_2GRAMS_ALL = (
    "list_transform(range(1, len({tk})), i -> concat_ws(' ', {tk}[i], {tk}[i+1]))"
).format(tk=_O_TOKENS)

# embedding arithmetic twins (same folds as suite/pipeline.py)
_O_DOT = (
    "list_reduce(list_transform(range(1, len(a.embedding)+1), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), "
    "(x, y) -> x + y)"
)
_O_NORM2 = (
    "list_reduce(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "(x, y) -> x + y)"
)


@register(
    "decontaminate_benchmark",
    oracle=f"""
    WITH bg AS (
      SELECT DISTINCT unnest({_O_TRIGRAMS}) AS gram
      FROM documents WHERE source = 'src0'
    ), cg AS (
      SELECT doc_id, unnest({_O_TRIGRAMS}) AS gram
      FROM documents WHERE source <> 'src0'
    ), hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM cg JOIN bg USING (gram) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(h.n, 0) AS n_contaminated_ngrams,
           coalesce(h.n, 0) >= 3 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.source <> 'src0' ORDER BY d.doc_id
    """,
)
def decontaminate_benchmark(spark, sf_dir):
    """GPT-3-style benchmark decontamination
    (``operators/filtering.py::decontaminate``): docs from src1..srcN are
    the training corpus, src0 plays the held-out benchmark; any doc
    sharing >= 3 distinct word trigrams with the benchmark is flagged.
    One broadcast-eligible semi-join + per-doc count — no all-pairs."""
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return (
        filtering.decontaminate(corpus, bench, k=3, min_overlap=3)
        .select("doc_id", "n_contaminated_ngrams", "contaminated")
        .orderBy("doc_id")
    )


_O_GOPHER_TEMPLATE = f"""
    WITH base AS (
      SELECT doc_id, {_O_TOKENS} AS tk, {_O_2GRAMS_ALL} AS grams FROM documents
    ), stats AS (
      SELECT doc_id,
        CAST(len(tk) AS BIGINT) AS n_words,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(tk, x -> CAST(length(x) AS BIGINT))), (a,b) -> a+b)
          AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS mean_word_len,
        CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
          AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS alpha_word_frac,
        CAST(len(list_filter(tk,
          x -> list_contains([{{stops}}], x)))
          AS BIGINT) AS stop_hits,
        list_transform(list_distinct(grams),
          g -> struct_pack(cnt := CAST(len(list_filter(grams, x -> x = g)) AS BIGINT),
                           ln := CAST(length(g) AS BIGINT))) AS st
      FROM base
    ), rep AS (
      SELECT doc_id, n_words, mean_word_len, alpha_word_frac, stop_hits,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(st, s -> CASE WHEN s.cnt > 1 THEN s.cnt*s.ln ELSE 0 END)),
          (a,b) -> a+b) AS dup_2gram_chars,
        coalesce(list_max(list_transform(st, s -> s.cnt*s.ln)), 0) AS top_2gram_chars,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(st, s -> s.cnt*s.ln)), (a,b) -> a+b) AS total_2gram_chars
      FROM stats
    )
"""

from opteryx_spark.operators.text import STOPWORDS as _SW

def _o_gopher_stats(langs):
    stops = sorted({w for lg in langs for w in _SW[lg]})
    return _O_GOPHER_TEMPLATE.format(stops=", ".join(f"'{w}'" for w in stops))

_O_GOPHER_STATS = _o_gopher_stats(["en"])


@register(
    "text_gopher_quality",
    oracle=_O_GOPHER_STATS
    + """
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, stop_hits,
           dup_2gram_chars, top_2gram_chars, total_2gram_chars,
           CAST(dup_2gram_chars AS DOUBLE) / CAST(total_2gram_chars AS DOUBLE)
             AS dup_2gram_frac,
           CAST(top_2gram_chars AS DOUBLE) / CAST(total_2gram_chars AS DOUBLE)
             AS top_2gram_frac,
           coalesce(n_words >= 5 AND n_words <= 100000
            AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
            AND alpha_word_frac >= 0.8 AND stop_hits >= 2
            AND coalesce(
              CAST(dup_2gram_chars AS DOUBLE) / CAST(total_2gram_chars AS DOUBLE) <= 0.2,
              TRUE)
            AND coalesce(
              CAST(top_2gram_chars AS DOUBLE) / CAST(total_2gram_chars AS DOUBLE) <= 0.12,
              TRUE), FALSE)
             AS passes_gopher
    FROM rep ORDER BY doc_id
    """,
)
def text_gopher_quality(spark, sf_dir):
    """Gopher quality gates (``operators/filtering.py::gopher_quality``):
    word-count/word-length bands, alphabetic fraction, stopword evidence,
    and the duplicate/top 2-gram character-fraction repetition signals —
    all integer-exact, map-only.  Thresholds tightened vs the defaults so
    every gate fires on part of this corpus."""
    docs = t(spark, sf_dir, "documents")
    return (
        filtering.gopher_quality(
            docs,
            thresholds={"max_dup_2gram_frac": 0.2, "max_top_2gram_frac": 0.12},
        )
        .select(
            "doc_id", "n_words", "mean_word_len", "alpha_word_frac", "stop_hits",
            "dup_2gram_chars", "top_2gram_chars", "total_2gram_chars",
            "dup_2gram_frac", "top_2gram_frac", "passes_gopher",
        )
        .orderBy("doc_id")
    )


@register(
    "sample_quota_stratified",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) x
    WHERE rn <= 3 ORDER BY doc_id
    """,
)
def sample_quota_stratified(spark, sf_dir):
    """Stratified quota sampling (``filtering.py::quota_sample``): at most
    3 docs per (lang, source) stratum, chosen by the md5-of-id total
    order — reproducible on any cluster/partitioning.  Per-group window,
    no global sort."""
    docs = t(spark, sf_dir, "documents")
    return (
        filtering.quota_sample(docs, ["lang", "source"], 3)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "text_vocab_topk",
    oracle=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest({_O_TOKENS}) AS token FROM documents)
    GROUP BY token ORDER BY tf DESC, token LIMIT 50
    """,
)
def text_vocab_topk(spark, sf_dir):
    """Corpus vocabulary head (``text.py::token_document_frequency``):
    term + document frequency, top 50 by frequency with total tie-break.
    The word-count shape: explode -> partial-agg -> bounded reduce."""
    docs = t(spark, sf_dir, "documents")
    return (
        text.token_document_frequency(docs)
        .orderBy(F.desc("tf"), "token")
        .limit(50)
    )


@register(
    "text_characteristic_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_O_TOKENS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, token),
    dfq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
            FROM tok GROUP BY token),
    sc AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.doc_freq,
                  (tf.tf * 1000000) // dfq.doc_freq AS score
           FROM tf JOIN dfq USING (token)),
    rk AS (SELECT *, CAST(row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rank
           FROM sc)
    SELECT doc_id, token, tf, doc_freq, score, rank
    FROM rk WHERE rank <= 3 ORDER BY doc_id, rank
    """,
)
def text_characteristic_terms(spark, sf_dir):
    """Per-document characteristic terms
    (``text.py::characteristic_terms``): integer-exact TF-IDF analogue
    ``floor(tf*1e6/doc_freq)`` — frequent-in-doc, rare-in-corpus terms
    first, no float log.  Vocabulary aggregate + per-doc window."""
    docs = t(spark, sf_dir, "documents")
    return text.characteristic_terms(docs, topn=3).orderBy("doc_id", "rank")


@register(
    "emb_semantic_dedup",
    oracle=f"""
    WITH dropped AS (
      SELECT DISTINCT b.vec_id
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_O_DOT} / (sqrt({_O_NORM2.format(v='a.embedding')})
                        * sqrt({_O_NORM2.format(v='b.embedding')})) >= 0.38
    )
    SELECT vec_id, label,
           vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
    FROM embeddings ORDER BY vec_id
    """,
)
def emb_semantic_dedup(spark, sf_dir):
    """Cluster-bounded semantic dedup (SemDeDup shape;
    ``similarity.py::semantic_dedup``): cosine pairs only within a
    cluster (here the label column stands in for k-means assignments),
    keep-lowest-id.  Emits every vector with its kept/dropped verdict so
    the oracle checks both sides of the partition."""
    emb = t(spark, sf_dir, "embeddings")
    kept = similarity.semantic_dedup(emb, "label", threshold=0.38).select(
        "vec_id", F.lit(True).alias("kept")
    )
    return (
        emb.select("vec_id", "label")
        .join(kept, "vec_id", "left")
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(False)))
        .orderBy("vec_id")
    )


# coalesce: DuckDB array_to_string([]) is NULL while Spark array_join([])
# is '' — empty-token docs must fingerprint as md5(''); NULL text stays
# NULL via the CASE (the operator contract: missing != empty)
_O_FP = (
    "CASE WHEN text IS NOT NULL THEN "
    f"md5(coalesce(array_to_string(list_sort(list_distinct({_O_TOKENS})), ' '), '')) "
    "END"
)


@register(
    "dedup_incremental_exact",
    oracle=f"""
    WITH refk AS (SELECT DISTINCT {_O_FP} AS k FROM documents WHERE doc_id < 250)
    SELECT doc_id,
           coalesce({_O_FP} IN (SELECT k FROM refk), FALSE) AS already_in_corpus
    FROM documents WHERE doc_id >= 250 ORDER BY doc_id
    """,
)
def dedup_incremental_exact(spark, sf_dir):
    """Incremental corpus dedup (``dedup.py::dedup_against_corpus``):
    docs >= 250 are the new crawl, docs < 250 the accepted corpus; flag
    new docs whose token-set fingerprint already exists.  One key-set
    join over the delta — never re-dedupes the full corpus."""
    docs = t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") >= 250)
    ref = docs.filter(F.col("doc_id") < 250)
    return (
        dedup.dedup_against_corpus(new, ref, method="fingerprint")
        .select("doc_id", "already_in_corpus")
        .orderBy("doc_id")
    )


def _profile_oracle() -> str:
    cols = {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "varchar",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "varchar",
    }
    parts = []
    for c, dt in cols.items():
        # render AFTER aggregating: numeric min/max must order numerically
        def conv(agg: str) -> str:
            if dt == "double":
                return f"CAST(CAST({agg}({c}) AS DECIMAL(38,6)) AS VARCHAR)"
            return f"CAST({agg}({c}) AS VARCHAR)"

        parts.append(
            f"""
        SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               {conv("MIN")} AS min_value, {conv("MAX")} AS max_value
        FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY 1"


@register("profile_orders", oracle=_profile_oracle())
def profile_orders(spark, sf_dir):
    """One-pass table profiling (``operators/profile.py::profile_table``):
    count / non-null / exact distinct / min / max per column, computed in
    a single scan + aggregate and unpivoted driver-free.  Doubles render
    through DECIMAL(25,6) so min/max text is engine-identical."""
    from opteryx_spark.operators import profile

    orders = t(spark, sf_dir, "orders")
    return profile.profile_table(orders, exact_distinct=True).orderBy("column")


# DuckDB twin of "byte k of sha256(p)" (hex chars 2k+1, 2k+2 as an int)
def _o_sha_byte(k: int, expr: str = "sha256(p)") -> str:
    return (
        f"((strpos('0123456789abcdef', substring({expr}, {2*k+1}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substring({expr}, {2*k+2}, 1)) - 1))"
    )


_O_MEDIA = """
    WITH m AS (
      SELECT CAST(i AS BIGINT) AS media_id,
             repeat(sha256(CAST(i AS VARCHAR)), 4) AS p
      FROM range(0, 200) t(i)
    )
"""


@register(
    "multimodal_audio_features",
    oracle=_O_MEDIA
    + f"""
    SELECT media_id,
           CAST(8000 * (1 + {_o_sha_byte(0)} % 5) AS BIGINT) AS sample_rate,
           CAST(8000 * (1 + {_o_sha_byte(0)} % 5) * (1 + {_o_sha_byte(1)} % 30) AS BIGINT) AS n_samples,
           CAST(1 + {_o_sha_byte(1)} % 30 AS BIGINT) AS duration_s,
           CAST(length(p) AS BIGINT) AS n_bytes,
           sha256(p) AS content_sha
    FROM m ORDER BY media_id
    """,
)
def multimodal_audio_features(spark, sf_dir):
    """mapInPandas audio-feature extraction (``multimodal.py::
    audio_features``): sample rate / sample count / integer duration from
    the deterministic stub probe, value-reproduced by DuckDB — the
    Arrow-batch plumbing and schema are the real, tested surface."""
    from opteryx_spark.operators import multimodal

    media = multimodal.synthetic_media(spark, 200)
    return multimodal.audio_features(media, fake=True).orderBy("media_id")


_O_DIMS = f"""
    dims AS (
      SELECT media_id, p,
             CAST(64 + {_o_sha_byte(0)} % 192 AS BIGINT) AS w,
             CAST(64 + {_o_sha_byte(1)} % 192 AS BIGINT) AS h
      FROM m
    )
"""


@register(
    "multimodal_resize_images",
    oracle=_O_MEDIA.rstrip()
    + ", "
    + _O_DIMS
    + """
    , scaled AS (
      SELECT media_id, p, w, h,
             CASE WHEN greatest(w, h) <= 128 THEN w
                  ELSE greatest(1, (w * 128) // greatest(w, h)) END AS ow,
             CASE WHEN greatest(w, h) <= 128 THEN h
                  ELSE greatest(1, (h * 128) // greatest(w, h)) END AS oh
      FROM dims
    )
    SELECT media_id, w AS width, h AS height,
           ow AS out_width, oh AS out_height,
           sha256(sha256(p) || ':' || CAST(ow AS VARCHAR) || 'x' || CAST(oh AS VARCHAR))
             AS resized_sha
    FROM scaled ORDER BY media_id
    """,
)
def multimodal_resize_images(spark, sf_dir):
    """mapInPandas aspect-preserving resize (``multimodal.py::
    resize_images``): the integer floor-scale arithmetic (never
    upscales, min 1px) and the derived resized-artifact id are exact in
    DuckDB; the pixel resample is the declared codec stub."""
    from opteryx_spark.operators import multimodal

    media = multimodal.synthetic_media(spark, 200)
    return multimodal.resize_images(media, max_side=128, fake=True).orderBy("media_id")


# v2 runs the multilingual stopword gate (every corpus language), so its
# oracle inlines the union stop list
_O_G2 = _o_gopher_stats(sorted(_SW)).replace("FROM documents", "FROM corpus")


@register(
    "curate_pipeline_v2",
    oracle=f"""
    WITH corpus AS (
      SELECT * FROM documents WHERE source <> 'src0'
    ), bg AS (
      SELECT DISTINCT unnest({_O_TRIGRAMS}) AS gram
      FROM documents WHERE source = 'src0'
    ), cg AS (
      SELECT doc_id, unnest({_O_TRIGRAMS}) AS gram FROM corpus
    ), hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM cg JOIN bg USING (gram) GROUP BY doc_id
    ), {_O_G2.strip().removeprefix('WITH ')}, keepers AS (
      SELECT sha256(text) AS dg, MIN(doc_id) AS keep_id FROM corpus GROUP BY 1
    ), staged AS (
      SELECT c.doc_id, c.lang, c.source, r.n_words,
             r.mean_word_len, r.alpha_word_frac, r.stop_hits,
             CAST(r.dup_2gram_chars AS DOUBLE)
               / CAST(r.total_2gram_chars AS DOUBLE) AS dup_frac,
             CAST(r.top_2gram_chars AS DOUBLE)
               / CAST(r.total_2gram_chars AS DOUBLE) AS top_frac,
             coalesce(h.n, 0) >= 3 AS contaminated,
             c.doc_id = k.keep_id AS exact_keep
      FROM corpus c
      JOIN rep r USING (doc_id)
      LEFT JOIN hits h USING (doc_id)
      JOIN keepers k ON k.dg = sha256(c.text)
    ), gated AS (
      SELECT *,
             (n_words >= 5 AND n_words <= 100000
              AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
              AND alpha_word_frac >= 0.8 AND stop_hits >= 2
              AND dup_frac <= 0.2 AND top_frac <= 0.12) AS passes_gopher
      FROM staged
    ), surv_ranks AS (
      SELECT doc_id,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrank
      FROM gated
      WHERE n_words >= 10 AND passes_gopher AND NOT contaminated AND exact_keep
    ), ranked AS (
      SELECT g.*, s.qrank FROM gated g LEFT JOIN surv_ranks s USING (doc_id)
    ), outcomes AS (
      SELECT CASE WHEN n_words < 10 THEN 'too_short'
                  WHEN NOT passes_gopher THEN 'fails_gopher'
                  WHEN contaminated THEN 'contaminated'
                  WHEN NOT exact_keep THEN 'exact_duplicate'
                  WHEN qrank > 5 THEN 'over_quota'
                  ELSE 'kept' END AS outcome,
             n_words
      FROM ranked
    )
    SELECT outcome, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM outcomes GROUP BY outcome ORDER BY outcome
    """,
)
def curate_pipeline_v2(spark, sf_dir):
    """The modern curation pipeline composed end-to-end
    (``operators/curate.py::curate_corpus_v2``): Gopher gates →
    benchmark decontamination (src0 as the held-out set) → exact dedup →
    per-(lang, source) quota of 5, with drop-reason precedence.  The
    oracle reproduces every stage and the precedence CASE — the
    composition, not just the stages, sits under the hard signal."""
    from opteryx_spark.operators import curate

    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    out = curate.curate_corpus_v2(
        corpus,
        bench,
        gopher_thresholds={"max_dup_2gram_frac": 0.2, "max_top_2gram_frac": 0.12},
        stopword_langs=sorted(text.STOPWORDS),
    )
    return (
        out.groupBy(F.coalesce("drop_reason", F.lit("kept")).alias("outcome"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
        .orderBy("outcome")
    )


_O_MD5_BUCKET = """
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, 9), i ->
        CAST(strpos('0123456789abcdef',
                    substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
             AS BIGINT))),
      (a, c) -> a * 16 + c)
"""


# thresholds precomputed with the operator's EXACT arithmetic (float
# accumulation then int() truncation) — a SQL-side CAST would round and
# disagree on boundary buckets
_SPLIT_T1 = int(0.8 * 4294967296)
_SPLIT_T2 = int((0.8 + 0.1) * 4294967296)


@register(
    "sample_split_assign",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_O_MD5_BUCKET} AS bucket FROM documents)
    SELECT doc_id,
           CASE WHEN bucket < {_SPLIT_T1} THEN 'train'
                WHEN bucket < {_SPLIT_T2} THEN 'val'
                ELSE 'test' END AS split
    FROM h ORDER BY doc_id
    """,
)
def sample_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment
    (``operators/scale.py::split_assign``): 80/10/10 by md5 bucket of
    the id — reproducible across runs/engines/partitionings and
    consistent across tables sharing the key (no split leakage through
    joins).  Map-only."""
    from opteryx_spark.operators import scale

    docs = t(spark, sf_dir, "documents")
    return (
        scale.split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, CAST(len({_O_TOKENS}) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS before_tokens
      FROM n
    )
    SELECT doc_id, n_tokens, before_tokens // 512 AS bin_id
    FROM c ORDER BY doc_id
    """,
)
def text_pack_sequences(spark, sf_dir):
    """Deterministic sequence packing (``text.py::pack_sequences``):
    contiguous fill of 512-token training bins by cumulative token
    position (overflow bounded by one document) — the pre-training
    sequence-prep step after chunking.  Oracle reproduces the exclusive
    cumulative sum exactly."""
    docs = t(spark, sf_dir, "documents")
    return (
        text.pack_sequences(docs, budget=512)
        .select("doc_id", "n_tokens", "bin_id")
        .orderBy("doc_id")
    )
