"""Shared helpers for the query suite: deterministic float aggregation."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from opteryx_spark.catalog import load_table
from opteryx_spark.session import tune_session

DEC = "decimal(25,8)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


def dsum(col: Column) -> Column:
    """Order-independent exact sum of a double column → double."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """avg = double(decimal sum)/double(count): deterministic in any engine."""
    return dsum(col) / F.count(col).cast("double")


def osum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,8))) AS DOUBLE)"


def oavg(expr: str) -> str:
    return f"({osum(expr)} / CAST(COUNT({expr}) AS DOUBLE))"
