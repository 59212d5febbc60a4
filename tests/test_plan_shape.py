"""Physical-plan assertions: the 100 TB scale properties of suite queries.

Correctness at scale is a *plan* property: dim joins must broadcast,
scans must push filters/prune columns, top-k must not global-sort.
These tests pin those properties so a regression shows up before bench.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opteryx_spark.plans import broadcast_join_count, explain_text
from opteryx_spark.suite import load_all

REG = load_all()


def test_q3_broadcasts_customer(spark, sf_dir):
    df = REG["tpch_q3_shipping_priority"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= 1


def test_q5_broadcasts_all_dims(spark, sf_dir):
    df = REG["tpch_q5_local_supplier_volume"].spark(spark, sf_dir)
    # supplier, customer, nation, region all broadcast; only fact-fact shuffles
    assert broadcast_join_count(df) >= 3


def test_q6_pushes_filters_and_prunes_columns(spark, sf_dir):
    df = REG["tpch_q6_forecast_revenue"].spark(spark, sf_dir)
    text = explain_text(df)
    assert "PushedFilters: [" in text
    assert "IsNotNull(l_shipdate)" in text or "GreaterThanOrEqual(l_shipdate" in text
    # projection pruning: untouched wide columns never read
    assert "l_comment" not in text
    read_schema = [ln for ln in text.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_returnflag" not in read_schema[0]


def test_topk_uses_take_ordered(spark, sf_dir):
    df = REG["sort_limit_offset"].spark(spark, sf_dir)
    text = explain_text(df)
    assert "TakeOrderedAndProject" in text


def test_partial_final_aggregation(spark, sf_dir):
    # map-side combine: partial HashAggregate below the Exchange, final above
    df = REG["tpch_q1_pricing_summary"].spark(spark, sf_dir)
    text = explain_text(df)
    assert "partial_sum" in text  # map-side partial aggregation
    assert text.count("HashAggregate") >= 2
    assert "Exchange" in text


def test_semi_join_planned(spark, sf_dir):
    df = REG["join_left_semi"].spark(spark, sf_dir)
    assert "LeftSemi" in explain_text(df)


def test_scan_filter_pushdown_json(spark, sf_dir):
    # filters on a scanned column reach the parquet reader
    from opteryx_spark.suite._util import t

    df = t(spark, sf_dir, "orders").filter(F.col("o_custkey") == 7).select("o_orderkey")
    text = explain_text(df)
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]" in text


@pytest.mark.slow  # walks all 300 entry plans (~6 min) - full tier only
def test_no_cartesian_in_suite(spark, sf_dir):
    # every suite query except the explicit cross/non-equi joins must avoid
    # CartesianProduct (at scale a cartesian is a non-starter)
    # (tpch_q14 was allowlisted in r1 but has planned a broadcast
    # equi-join since — keep the allowlist tight so a real cartesian
    # can't hide behind a stale entry)
    allowed = {"join_cross", "join_non_equi", "emb_cosine_pairs"}
    for name, qd in REG.items():
        if name in allowed:
            continue
        df = qd.spark(spark, sf_dir)
        text = explain_text(df)
        assert "CartesianProduct" not in text, f"{name} plans a cartesian product"


def test_q7_q8_q9_broadcast_dims(spark, sf_dir):
    for name, expected in [("tpch_q7_volume_shipping", 4), ("tpch_q8_market_share", 5), ("tpch_q9_product_profit", 3)]:
        df = REG[name].spark(spark, sf_dir)
        assert broadcast_join_count(df) >= expected, name


def test_fingerprint_ops_are_map_only(spark):
    # winnowing and BPE tokenization are per-row array math: their plans
    # must contain no Exchange beyond the input's own partitioning — at
    # 100 TB a shuffle here would dominate the whole pipeline
    from opteryx_spark.operators.text import bpe_token_count, winnow_fingerprints

    df = spark.range(0, 1000, 1, 4).selectExpr("id", "repeat(uuid(), 4) AS text")
    for expr in (winnow_fingerprints("text"), bpe_token_count("text")):
        text = explain_text(df.select("id", expr.alias("out")))
        assert "Exchange" not in text, "fingerprint stage must not shuffle"


def test_copy_group_expansion_no_cartesian(spark, sf_dir):
    # gid-keyed expansion joins must stay keyed (hash/broadcast), never
    # degenerate to a cartesian
    from opteryx_spark.operators import dedup
    from opteryx_spark.suite._util import t

    docs = t(spark, sf_dir, "documents")
    df = dedup.minhash_lsh_pairs(docs, k=2)
    text = explain_text(df)
    assert "CartesianProduct" not in text


def test_chunk_and_sample_are_map_only(spark):
    # chunking and hash sampling are per-row: no Exchange in their plans
    from opteryx_spark.operators.scale import hash_sample
    from opteryx_spark.operators.text import chunk_documents

    df = spark.range(0, 500, 1, 4).selectExpr("id AS doc_id", "repeat(uuid(), 8) AS text")
    assert "Exchange" not in explain_text(chunk_documents(df, max_tokens=16, overlap=2))
    assert "Exchange" not in explain_text(hash_sample(df, "doc_id", 10.0))


def test_gopher_quality_is_map_only(spark, sf_dir):
    # quality gates are per-row expressions: no shuffle at any corpus size
    from opteryx_spark.operators import filtering

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = explain_text(filtering.gopher_quality(docs))
    assert "Exchange" not in text


def test_decontaminate_and_semdedup_no_cartesian(spark, sf_dir):
    from opteryx_spark.operators import filtering, similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    corp = docs.filter(F.col("source") != "src0")
    t1 = explain_text(filtering.decontaminate(corp, bench, k=3))
    assert "CartesianProduct" not in t1 and "BroadcastNestedLoop" not in t1

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t2 = explain_text(similarity.semantic_dedup(emb, "label", threshold=0.9))
    assert "CartesianProduct" not in t2 and "BroadcastNestedLoop" not in t2


def test_quota_sample_no_global_sort(spark, sf_dir):
    from opteryx_spark.operators import filtering

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = explain_text(filtering.quota_sample(docs, ["lang", "source"], 3))
    assert "rangepartitioning" not in text.lower()  # per-group window only


def test_curate_v2_no_cartesian_no_global_sort(spark, sf_dir):
    from opteryx_spark.operators import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    text = explain_text(curate.curate_corpus_v2(corpus, bench))
    assert "CartesianProduct" not in text and "BroadcastNestedLoop" not in text
    assert "rangepartitioning" not in text.lower()


def test_web_ops_plan_shapes(spark, sf_dir):
    # parse/blocklist are per-row expressions (map-only); the per-domain
    # quota shuffles once to co-locate domains, never range-partitions
    from opteryx_spark.operators import web

    docs = spark.range(0, 500, 1, 4).selectExpr(
        "id AS doc_id", "concat('https://sub.ex', id % 7, '.co.uk/p/', id) AS url"
    )
    assert "Exchange" not in explain_text(web.parse_urls(docs))
    assert "Exchange" not in explain_text(web.domain_blocklist(docs, ["ex1.co.uk"]))
    qt = explain_text(web.domain_quota(docs, 5))
    assert "rangepartitioning" not in qt.lower()
    assert "CartesianProduct" not in qt


def test_readability_is_map_only(spark, sf_dir):
    from opteryx_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "Exchange" not in explain_text(T.readability_scores(docs))


def test_perplexity_no_cartesian_broadcast_costs(spark, sf_dir):
    # the vocabulary cost table must broadcast onto the exploded corpus;
    # no cartesian, no global sort anywhere
    from opteryx_spark.operators import filtering

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = explain_text(filtering.unigram_perplexity(docs, broadcast_costs=True))
    assert "CartesianProduct" not in text
    assert "rangepartitioning" not in text.lower()
    assert "BroadcastExchange" in text
    # default (no hint): AQE size-gates — must not force a broadcast of a
    # potentially unbounded web-scale vocabulary
    default = explain_text(filtering.unigram_perplexity(docs))
    assert "CartesianProduct" not in default


def test_token_budget_and_boilerplate_shapes(spark, sf_dir):
    from opteryx_spark.operators import filtering

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tb = explain_text(filtering.token_budget_sample(docs, ["lang"], 1000))
    assert "rangepartitioning" not in tb.lower()  # per-stratum window only
    bp = explain_text(filtering.boilerplate_ngram_fraction(docs))
    assert "CartesianProduct" not in bp
    assert "BroadcastExchange" in bp  # hot-gram set broadcasts


def test_curate_v3_shape(spark, sf_dir):
    # composed rewrite pipeline: digest-keyed aggregates throughout,
    # no cartesian, no global sort
    from opteryx_spark.operators import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    txt = explain_text(curate.curate_corpus_v3(docs))
    assert "CartesianProduct" not in txt
    assert "rangepartitioning" not in txt.lower()


def test_remove_duplicate_chunks_shape(spark, sf_dir):
    # ExactSubstr-style removal: digest-keyed rank window + (id, idx)
    # removal join + id-keyed rebuild — no cartesian, no global sort
    from opteryx_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    txt = explain_text(dedup.remove_duplicate_chunks(docs, chunk_tokens=16))
    assert "CartesianProduct" not in txt
    assert "rangepartitioning" not in txt.lower()


def test_remove_corpus_chunks_shape(spark, sf_dir):
    # incremental ExactSubstr: one digest join against the offline index,
    # id-keyed rebuild — no cartesian, no global sort
    from opteryx_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter("doc_id >= 250")
    ref = docs.filter("doc_id < 250")
    txt = explain_text(dedup.remove_chunks_in_corpus(new, ref, chunk_tokens=16))
    assert "CartesianProduct" not in txt
    assert "rangepartitioning" not in txt.lower()


def test_line_boilerplate_shape(spark, sf_dir):
    # C4 line-frequency pass: explode + digest-keyed freq + hot-set
    # broadcast + id-keyed rebuild — no cartesian, no global sort
    from opteryx_spark.operators import filtering

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lb = explain_text(filtering.remove_boilerplate_lines(docs))
    assert "CartesianProduct" not in lb
    assert "rangepartitioning" not in lb.lower()
    assert "BroadcastExchange" in lb  # hot-line digest set broadcasts


def test_duplicate_chunk_fraction_no_cartesian(spark, sf_dir):
    from opteryx_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = explain_text(dedup.duplicate_chunk_fraction(docs))
    assert "CartesianProduct" not in text
    assert "rangepartitioning" not in text.lower()
