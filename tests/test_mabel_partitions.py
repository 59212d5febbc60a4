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


def test_frame_selection_and_hour_segments(spark):
    """Reference fixture layouts: latest complete non-ignored frame wins,
    by_hour segments restrict to the FOR hour, foreign by_* raises."""
    import opteryx_spark as ox
    from opteryx_spark import errors
    from opteryx_spark.sources.registry import register_store

    register_store("reftest", root="/root/reference/testdata")
    conn = ox.connect(spark=spark)
    n = conn.cursor().execute(
        "SELECT COUNT(*) AS n FROM reftest.partitioned.framed FOR '2021-03-28'"
    ).fetchone()[0]
    assert n == 100000  # one complete frame, not both
    # day 30's frames are all frame.ignore'd: contributes nothing
    n = conn.cursor().execute(
        "SELECT COUNT(*) AS n FROM reftest.partitioned.framed "
        "FOR DATES BETWEEN '2021-03-29' AND '2021-03-30'"
    ).fetchone()[0]
    assert n == 100000
    one_hour = conn.cursor().execute(
        "SELECT COUNT(*) AS n FROM reftest.partitioned.hourly FOR '2024-01-01 01:00'"
    ).fetchone()[0]
    whole_day = conn.cursor().execute(
        "SELECT COUNT(*) AS n FROM reftest.partitioned.hourly FOR '2024-01-01'"
    ).fetchone()[0]
    assert (one_hour, whole_day) == (1, 2)
    with pytest.raises(errors.Error):
        conn.cursor().execute(
            "SELECT * FROM reftest.partitioned.mixed FOR '2020-02-03'"
        ).fetchall()
    with pytest.raises(errors.Error):  # no partitions for today
        conn.cursor().execute("SELECT * FROM reftest.partitioned.dated").fetchall()
