"""Schema-on-read drift tolerance (reference ``read_node.py:90-155``:
missing columns padded with typed nulls, supersets merged)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opteryx_spark.sources.registry import read_any


@pytest.fixture(scope="module")
def drift_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drift"))
    old = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    new = spark.createDataFrame([(3, "c", 9.5), (4, "d", 7.25)], ["id", "name", "score"])
    old.write.parquet(os.path.join(d, "part=old"))
    new.write.parquet(os.path.join(d, "part=new"))
    return d


def test_merge_schema_pads_missing_columns(spark, drift_dir):
    df = read_any(spark, drift_dir)
    assert set(df.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None and rows[2] is None  # old files: typed-null padding
    assert rows[3] == 9.5


def test_filter_on_drifted_column(spark, drift_dir):
    df = read_any(spark, drift_dir)
    assert df.filter(F.col("score").isNotNull()).count() == 2
    assert df.filter(F.col("score").isNull()).count() == 2


def test_ragged_jsonl(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ragged"))
    path = os.path.join(d, "docs.jsonl")
    with open(path, "w") as f:
        f.write('{"id": 1, "text": "hello"}\n')
        f.write('{"id": 2, "text": "world", "lang": "en"}\n')
        f.write('{"id": 3, "meta": {"k": 5}}\n')
    df = read_any(spark, path)
    assert set(df.columns) == {"id", "text", "lang", "meta"}
    assert df.count() == 3
    assert df.filter(F.col("lang").isNull()).count() == 2
    assert df.filter(F.col("meta.k") == 5).count() == 1
