"""Tests for the scale utilities (salted join, bucketing, shuffle counting)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators import scale


def _skewed_frames(spark):
    # 90% of left rows share key 0 (hot key), right is a small dim
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k").groupBy("k").count()
    salted = scale.salted_join(left, right, "k").groupBy("k").count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salted_join_left_outer(spark):
    left, right = _skewed_frames(spark)
    missing = right.filter(F.col("k") < 50)  # unmatched left keys exist
    plain = left.join(missing, "k", "left").groupBy("k").agg(F.count("w").alias("n"))
    salted = scale.salted_join(left, missing, "k", how="left").groupBy("k").agg(
        F.count("w").alias("n")
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_broadcast_threshold_join_hints(spark):
    left, right = _skewed_frames(spark)
    df = scale.broadcast_threshold_join(left, right, "k", right_rows_estimate=100)
    from opteryx_spark.plans import explain_text

    assert "BroadcastHashJoin" in explain_text(df)


def test_shuffle_count(spark):
    left, right = _skewed_frames(spark)
    one_shuffle = left.groupBy("k").count()
    assert scale.explain_shuffle_count(one_shuffle) >= 1


def test_bucketed_write_read_no_shuffle_agg(spark):
    # uses the default spark-warehouse/ dir (gitignored)
    import shutil

    left, _ = _skewed_frames(spark)
    spark.sql("DROP TABLE IF EXISTS bucketed_left")
    shutil.rmtree("spark-warehouse/bucketed_left", ignore_errors=True)
    try:
        scale.write_bucketed(left, "bucketed_left", "k", buckets=8)
        back = scale.read_bucketed(spark, "bucketed_left")
        agg = back.groupBy("k").count()
        # bucketed source: groupBy on the bucket key needs no Exchange
        assert scale.explain_shuffle_count(agg) == 0
        assert agg.count() == 10  # keys {0, 10, 20, ..., 90}
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_left")


def test_salted_join_rejects_right_and_full(spark):
    import pytest as _pytest

    left, right = _skewed_frames(spark)
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError):
            scale.salted_join(left, right, "k", how=how)


def test_split_assign_consistent_and_complete(spark, sf_dir):
    from opteryx_spark.operators import scale

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = scale.split_assign(docs, "doc_id")
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # total partition, no loss
    # consistent across tables sharing the key: same ids -> same splits
    again = scale.split_assign(docs.repartition(7), "doc_id")
    a = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in again.select("doc_id", "split").collect()}
    assert a == b
    # train is the bulk at 90/5/5 defaults
    assert counts.get("train", 0) > counts.get("val", 0)


def test_pack_sequences_bins_fill_to_budget(spark):
    from opteryx_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * 100)) for i in range(10)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r.bin_id for r in T.pack_sequences(df, budget=250).collect()}
    # 100 tokens/doc, 250 budget: docs 0,1,2 start under 250 (bin 0),
    # docs 3,4 bin 1 (300..), doc 5 starts at 500 -> bin 2, etc.
    assert rows[0] == 0 and rows[1] == 0 and rows[2] == 0
    assert rows[3] == 1 and rows[4] == 1
    assert rows[5] == 2


def test_pack_sequences_sharded_is_parallel_and_per_shard(spark, sf_dir):
    from opteryx_spark.operators import text as T
    from opteryx_spark.plans import explain_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = T.pack_sequences(docs, budget=512, shard_col="source")
    # per-shard windows: each shard's bins start at 0
    first_bins = {r.source: r.bin_id for r in
                  out.groupBy("source").agg(F.min("bin_id").alias("bin_id")).collect()}
    assert all(v == 0 for v in first_bins.values())
    # the window shuffles by the shard key, never into one global partition
    assert "SinglePartition" not in explain_text(out)


def test_salted_join_rejects_no_underscore_spellings(spark):
    from opteryx_spark.operators import scale

    import pytest

    l = spark.createDataFrame([(1, "a")], ["k", "v"])
    r = spark.createDataFrame([(1, "b")], ["k", "w"])
    for how in ("rightouter", "fullouter", "RIGHT_OUTER"):
        with pytest.raises(ValueError):
            scale.salted_join(l, r, "k", how=how)


def test_split_assign_null_key_unassigned(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from opteryx_spark.operators import scale

    schema = StructType([StructField("doc_id", LongType())])
    df = spark.createDataFrame([(1,), (None,)], schema)
    rows = {r.doc_id: r.split for r in scale.split_assign(df, "doc_id").collect()}
    assert rows[1] in ("train", "val", "test")
    assert rows[None] is None  # never silently concentrated in one split


def test_explain_shuffle_count_sees_left_branch(spark, sf_dir):
    from opteryx_spark.operators import scale

    a = spark.read.parquet(f"{sf_dir}/orders.parquet")
    b = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    joined = a.repartition(8, "o_orderkey").join(
        b.repartition(8, "l_orderkey"), a.o_orderkey == b.l_orderkey
    )
    # both sides repartition: the count must see the ':'-prefixed left
    # branch of the formatted plan, not just the '+-' right branch
    assert scale.explain_shuffle_count(joined) >= 2
