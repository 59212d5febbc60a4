"""Suite wave 26 (round 7): the incremental-curation composition and the
persisted-ANN probe paths — registered AFTER every earlier wave so the
round-6 backlog drains through the driver window first (VERDICT r6 #1:
new entries must not displace never-verified ones in tier 1b order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import similarity
from opteryx_spark.suite import register
from opteryx_spark.suite._util import t
from opteryx_spark.suite.pipeline import _O_TOKENS, _PERM_VALUES
from opteryx_spark.suite.pipeline2 import _O_FP
from opteryx_spark.suite.pipeline6 import _PQ_K, _pq_oracle

# --- end-to-end incremental curation (artifact-only corpus side) ---------------


@register(
    "curate_incremental",
    # Composition of the three PROVEN incremental oracles — byte-exact
    # fingerprint membership (dedup_incremental_exact), window removal
    # (dedup_remove_corpus_chunks), LSH best-match (dedup_minhash_
    # incremental) — plus the v3 gate shapes over the rewritten text.
    oracle=f"""
    WITH newd AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
    ), refk AS (
      SELECT DISTINCT {_O_FP} AS k FROM documents WHERE doc_id < 250
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
    ), mrk AS (
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
      FROM mrk GROUP BY doc_id
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len({_O_TOKENS})),
        i -> concat_ws(' ', {_O_TOKENS}[i], {_O_TOKENS}[i+1])))) AS s
      FROM documents
    ), hs AS (
      SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(s)+1),
                              i -> CAST(ascii(s[i]) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 2147483647) AS h
      FROM sh
    ), perms(idx, a, b) AS (VALUES {_PERM_VALUES}),
    mins AS (
      SELECT doc_id, idx, MIN((a * h + b) % 2147483647) AS mh
      FROM hs CROSS JOIN perms GROUP BY doc_id, idx
    ), sigs AS (
      SELECT doc_id, list(mh ORDER BY idx) AS sig FROM mins GROUP BY doc_id
    ), bnd AS (
      SELECT doc_id, band,
             list_reduce(list_prepend(CAST(0 AS BIGINT), comps),
                         (acc, c) -> (acc * 1000003 + c) % 2147483647) AS bh
      FROM (
        SELECT doc_id, idx // 4 AS band, list(mh ORDER BY idx) AS comps
        FROM mins GROUP BY doc_id, idx // 4
      )
    ), cok AS (
      SELECT band, bh FROM bnd WHERE doc_id < 250
      GROUP BY band, bh HAVING COUNT(*) <= 1000
    ), cand AS (
      SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid
      FROM bnd n JOIN bnd c ON n.band = c.band AND n.bh = c.bh
      JOIN cok ON cok.band = n.band AND cok.bh = n.bh
      WHERE n.doc_id >= 250 AND c.doc_id < 250
    ), scored AS (
      SELECT nid, cid,
             CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i]))
                  AS DOUBLE) / 64.0 AS est
      FROM cand JOIN sigs sa ON sa.doc_id = nid JOIN sigs sb ON sb.doc_id = cid
    ), best AS (
      SELECT nid, cid AS best_match_id, est AS est_jaccard,
             row_number() OVER (PARTITION BY nid ORDER BY est DESC, cid) AS rn
      FROM scored WHERE est >= 0.5
    ), g AS (
      SELECT n.doc_id, n.text,
             coalesce({_O_FP} IN (SELECT k FROM refk), FALSE)
               AS already_in_corpus,
             CASE WHEN n.text IS NOT NULL THEN
               coalesce(a.n_chunks, CAST(0 AS BIGINT)) END AS n_chunks,
             CASE WHEN n.text IS NOT NULL THEN
               coalesce(a.n_removed_chunks, CAST(0 AS BIGINT)) END
               AS n_removed_chunks,
             CASE WHEN n.text IS NOT NULL THEN
               coalesce(a.cleaned_text, '') END AS final_text
      FROM newd n LEFT JOIN agg a USING (doc_id)
    ), q AS (
      SELECT g.*,
             CASE WHEN final_text IS NOT NULL THEN
               CAST(len(list_filter(string_split(final_text, ' '),
                    x -> x <> '')) AS BIGINT) END AS n_tokens_final
      FROM g
    ), q2 AS (
      SELECT q.*,
        CASE WHEN n_tokens_final > 0 THEN
          CAST(len(list_distinct(list_filter(string_split(final_text, ' '),
               x -> x <> ''))) AS DOUBLE) / CAST(n_tokens_final AS DOUBLE) * 0.5
          + (CASE WHEN n_tokens_final >= 20 THEN 1.0
                  ELSE CAST(n_tokens_final AS DOUBLE) / 20.0 END) * 0.5
        END AS quality
      FROM q
    )
    SELECT q2.doc_id, q2.already_in_corpus, b.best_match_id, b.est_jaccard,
           q2.n_chunks, q2.n_removed_chunks, q2.n_tokens_final, q2.final_text,
           CASE WHEN q2.text IS NULL THEN 'invalid_text'
                WHEN q2.already_in_corpus THEN 'exact_in_corpus'
                WHEN b.best_match_id IS NOT NULL THEN 'near_dup_in_corpus'
                WHEN q2.n_tokens_final = 0 THEN 'all_removed'
                WHEN q2.n_tokens_final < 10 THEN 'too_short'
                WHEN q2.quality < 0.4 THEN 'low_quality'
                ELSE 'kept' END AS outcome
    FROM q2 LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.nid = q2.doc_id
    ORDER BY q2.doc_id
    """,
)
def curate_incremental(spark, sf_dir):
    """End-to-end incremental curation (``curate.curate_incremental``):
    docs < 250 are the accepted corpus, reduced OFFLINE to its three
    dedup artifacts (fingerprint digest set, window digest index,
    MinHash-LSH index); docs >= 250 are the new crawl, judged and
    rewritten against the artifacts only — byte-exact membership,
    near-dup best-match, exact-substring window removal, then quality/
    length gates on the rewritten text, with one audited outcome per
    doc.  The deploy shape of a recurring crawl: the corpus is never
    re-read (plan-asserted in tests/test_curate_incremental.py)."""
    from opteryx_spark.operators import curate as C
    from opteryx_spark.operators import dedup as D

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    cd = D.corpus_digests(corpus, method="fingerprint")
    wd = D.window_digests(corpus, "text", chunk_tokens=16, min_chunk_tokens=4)
    idx = D.minhash_index(corpus, portable_hash=True)
    return (
        C.curate_incremental(new, cd, wd, idx)
        .select(
            "doc_id",
            "already_in_corpus",
            "best_match_id",
            "est_jaccard",
            "n_chunks",
            "n_removed_chunks",
            "n_tokens_final",
            "final_text",
            "outcome",
        )
        .orderBy("doc_id")
    )


# --- persisted-ANN probe paths (SQ8 / PQ indexed) ------------------------------


@register(
    "emb_ann_sq8_indexed",
    # Index-only probe twin: shortlist by the exact INTEGER quantized
    # dot, rescore over the DEQUANTIZED (qvec/scale) vectors — the
    # original floats never appear after the index build.
    oracle="""
    WITH qrow AS (
      SELECT embedding AS qe FROM embeddings WHERE vec_id = 1
    ), qq AS (
      SELECT qe,
             list_transform(qe, x -> CAST(floor(CAST(x AS DOUBLE) *
               (127.0 / list_max(list_transform(qe, y -> abs(CAST(y AS DOUBLE)))))
               + 0.5) AS BIGINT)) AS qv
      FROM qrow
    ), c8 AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * sc + 0.5) AS BIGINT)) AS bq,
             sc
      FROM (
        SELECT vec_id, embedding,
               CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS sc
        FROM (SELECT vec_id, embedding,
                list_max(list_transform(embedding,
                  y -> abs(CAST(y AS DOUBLE)))) AS mx
              FROM embeddings WHERE vec_id <> 1 AND embedding IS NOT NULL)
      ) WHERE sc > 0
    ), sl AS (
      SELECT c8.vec_id, c8.bq, c8.sc
      FROM c8, qq
      ORDER BY list_reduce(list_transform(range(1, 65),
                 i -> c8.bq[i] * qq.qv[i]), (x, y) -> x + y) DESC,
               c8.vec_id
      LIMIT 32
    )
    SELECT s.vec_id,
           list_reduce(list_transform(range(1, 65),
             i -> (CAST(s.bq[i] AS DOUBLE) / s.sc) * CAST(q.qe[i] AS DOUBLE)),
             (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(range(1, 65),
                i -> (CAST(s.bq[i] AS DOUBLE) / s.sc)
                     * (CAST(s.bq[i] AS DOUBLE) / s.sc)), (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(q.qe,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))
             AS cosim
    FROM sl s, qrow q
    ORDER BY cosim DESC, s.vec_id LIMIT 10
    """,
)
def emb_ann_sq8_indexed(spark, sf_dir):
    """SQ8 ANN probing the persisted index ONLY (``similarity.sq8_probe``
    over a ``quantize_int8`` artifact — the ``sq8_topk_indexed`` hot
    path): integer-dot shortlist (32 candidates), dequantized-cosine
    rescore to top-10.  Unlike ``emb_ann_sq8_topk`` the original float
    corpus is never consulted after the build — the 4x-smaller artifact
    answers the whole query (parquet roundtrip identity in
    tests/test_ann_persist.py)."""
    emb = t(spark, sf_dir, "embeddings")
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 1).select("embedding").first()["embedding"]
    ]
    art = similarity.quantize_int8(emb.filter(F.col("vec_id") != 1))
    return similarity.sq8_probe(art, qvec, k=10, shortlist=32)


@register("emb_ann_pq_indexed", oracle=_pq_oracle(qid=1))
def emb_ann_pq_indexed(spark, sf_dir):
    """PQ-ADC ANN probing the encoded-codes artifact (``similarity.
    pq_train`` -> ``pq_encode`` -> ``pq_adc_probe`` — the
    ``pq_adc_topk_indexed`` hot path): the ADC scan touches only the m
    stored code longs per vector, never the vectors; the query's m
    distance tables are rebuilt driver-side from the codebook sidecar.
    Query = vec 1 (vec 0 exercises the non-indexed twin
    ``emb_pq_adc_topk``); parquet roundtrip identity in
    tests/test_ann_persist.py."""
    emb = t(spark, sf_dir, "embeddings")
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 1).select("embedding").first()["embedding"]
    ]
    base, books = similarity.pq_train(emb.filter(F.col("vec_id") != 1))
    codes = similarity.pq_encode(base, books)
    return similarity.pq_adc_probe(codes, books, qvec, k=_PQ_K).orderBy("rank")
