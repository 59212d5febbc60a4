"""Full-text retrieval scoring over the document corpus: BM25.

The reference engine exposes boolean full-text matching
(``MATCH (col) AGAINST (...)`` — /root/reference/opteryx/managers/expression/
formatter.py surface, mirrored by ``functions.match_against`` here) but no
RANKED retrieval.  A training-data pipeline needs ranking — "find the
documents most like this probe query" is the workhorse for targeted
decontamination audits, seed-document expansion, and eyeballing what a
filter kept.  BM25 (Robertson/Spärck Jones; the SQLite FTS5 / Lucene
default) is the standard lexical ranker.

Determinism strategy (same as ``filtering.unigram_perplexity``): the only
transcendental is the per-term IDF, quantized once to integer millinats
(``floor(idf·1000 + 0.5)``); per-document accumulation across query terms
is a fixed-point BIGINT sum (``suite/_util.fsum`` trick), so scores are
bit-identical in any engine whose ``ln`` agrees to ~1e-13.

Scale shape (100 TB): the exploded corpus is filtered to the query's terms
BEFORE any aggregation, so the postings frame carries only matching
(doc, term) rows; per-term document frequencies reduce that tiny frame; the
term-stats side of the final join is bounded by |query| rows and always
broadcast.  Document lengths are one map-side projection aggregated by id.
No corpus-sized shuffle carries anything wider than (id, term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opteryx_spark.operators import text

__all__ = ["bm25_scores", "bm25_topk"]

_FP = 10000.0  # fixed-point scale for the cross-term score sum


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (whitespace tokens).

    Returns one row per document that matches ≥1 query term: ``id_col``,
    ``n_matched`` (BIGINT, distinct query terms present), ``bm25``
    (double; fixed-point sum of per-term partial scores).  Documents with
    NULL text or no matching terms are absent — the standard sparse
    postings contract.

    Per term t:  idf_millinats = floor(ln((N − df + 0.5)/(df + 0.5) + 1)·1000 + 0.5)
    partial(d,t) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with N = |corpus| (all docs), dl = token count (NULL text → 0),
    avgdl = Σdl/N.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))

    toks = text.tokens(text_col)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(text._nsize(toks), F.lit(0)).cast("long").alias("_dl"),
        toks.alias("_toks"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_N"), F.sum("_dl").alias("_sumdl")
    )

    postings = (
        base.select("_id", "_dl", F.explode("_toks").alias("_tk"))
        .filter(F.col("_tk").isin(terms))
        .groupBy("_id", "_dl", "_tk")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )

    dfreq = postings.groupBy("_tk").agg(F.count(F.lit(1)).alias("_df"))
    # |terms| rows — always broadcastable, independent of corpus size
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "_tk",
        F.floor(
            F.log(
                (F.col("_N").cast("double") - F.col("_df").cast("double") + F.lit(0.5))
                / (F.col("_df").cast("double") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(1000.0)
            + F.lit(0.5)
        ).alias("_idf_milli"),
        (F.col("_sumdl").cast("double") / F.col("_N").cast("double")).alias("_avgdl"),
    )

    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    tf = F.col("_tf").cast("double")
    norm = tf + k1c * (F.lit(1.0) - bc + bc * F.col("_dl").cast("double") / F.col("_avgdl"))
    partial = (F.col("_idf_milli").cast("double") / F.lit(1000.0)) * (
        tf * (k1c + F.lit(1.0)) / norm
    )

    return (
        postings.join(F.broadcast(idf), "_tk")
        .select("_id", F.floor(partial * F.lit(_FP) + F.lit(0.5)).alias("_p"))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            (F.sum("_p") / F.lit(_FP)).alias("bm25"),
        )
        .withColumnRenamed("_id", id_col)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25, deterministic tiebreak on the id."""
    scores = bm25_scores(df, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b)
    return scores.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
