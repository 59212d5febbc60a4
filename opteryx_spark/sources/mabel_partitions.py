"""Mabel date-partitioned path scheme resolver.

The reference resolves time-travel (`FOR DATES ...`) against blob stores
laid out as ``root/year_YYYY/month_MM/day_DD[/by_hour/hour=HH]``
(``opteryx/managers/schemes/mabel_partitions.py:60-140``).  Spark's Hive
partition discovery doesn't understand that dialect, so this module maps
a date range to the concrete existing paths and hands them to one
``spark.read`` call — partition pruning happens here, before any I/O.

At scale this is exactly how the reference prunes too: path enumeration
against the store listing, not data inspection.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession


def partition_path(root: str, day: dt.date, hour: int | None = None) -> str:
    p = os.path.join(root, f"year_{day.year:04d}", f"month_{day.month:02d}", f"day_{day.day:02d}")
    if hour is not None:
        p = os.path.join(p, "by_hour", f"hour={hour:02d}")
    return p


def resolve_partition_paths(
    root: str,
    start: dt.date,
    end: dt.date,
    existing_only: bool = True,
) -> list[str]:
    """All partition directories for [start, end] (inclusive)."""
    out = []
    day = start
    while day <= end:
        p = partition_path(root, day)
        if not existing_only or os.path.isdir(p):
            out.append(p)
        day += dt.timedelta(days=1)
    return out


def read_partitioned(
    spark: SparkSession,
    root: str,
    start: dt.date,
    end: dt.date,
    fmt: str = "parquet",
    **options: str,
) -> DataFrame:
    """Read a date range of a Mabel-partitioned dataset as one DataFrame.

    Missing days are skipped (the reference tolerates absent partitions);
    an empty range raises, matching the reference's DatasetNotFound.
    """
    paths = resolve_partition_paths(root, start, end)
    if not paths:
        raise FileNotFoundError(f"no partitions for {root} in [{start}, {end}]")
    reader = spark.read.format(fmt).options(**options)
    if fmt in ("parquet", "orc"):
        reader = reader.option("mergeSchema", "true")
    return reader.load(paths)
