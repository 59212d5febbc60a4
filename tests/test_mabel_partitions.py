"""Tests for the Mabel year_/month_/day_ partition scheme resolver."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from opteryx_spark.sources import mabel_partitions as mp


@pytest.fixture(scope="module")
def mabel_root(spark, sf_dir, tmp_path_factory):
    """events table re-written into year_YYYY/month_MM/day_DD dirs."""
    from pyspark.sql import functions as F

    from opteryx_spark.catalog import load_table

    root = str(tmp_path_factory.mktemp("mabel"))
    ev = load_table(spark, sf_dir, "events")
    days = [r["d"] for r in ev.select(F.to_date("ts").alias("d")).distinct().limit(4).collect()]
    for day in days:
        part = ev.filter(F.to_date("ts") == F.lit(day))
        part.write.mode("overwrite").parquet(mp.partition_path(root, day))
    return root, sorted(days)


def test_partition_path_layout():
    p = mp.partition_path("/data/events", dt.date(2024, 3, 7))
    assert p == "/data/events/year_2024/month_03/day_07"
    p = mp.partition_path("/data/events", dt.date(2024, 3, 7), hour=5)
    assert p.endswith("day_07/by_hour/hour=05")


def test_resolve_skips_missing_days(mabel_root):
    root, days = mabel_root
    paths = mp.resolve_partition_paths(root, days[0], days[-1] + dt.timedelta(days=30))
    assert len(paths) == len(days)
    for p in paths:
        assert os.path.isdir(p)


def test_read_partitioned_range(spark, mabel_root):
    root, days = mabel_root
    two = mp.read_partitioned(spark, root, days[0], days[1])
    all_days = mp.read_partitioned(spark, root, days[0], days[-1])
    assert 0 < two.count() < all_days.count()


def test_read_partitioned_empty_range_raises(spark, mabel_root):
    root, _ = mabel_root
    with pytest.raises(FileNotFoundError):
        mp.read_partitioned(spark, root, dt.date(1999, 1, 1), dt.date(1999, 1, 2))
