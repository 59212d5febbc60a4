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


# Fixed-point deterministic sums: the cheap alternative to DECIMAL(25,8).
#
# Why this is hash-exact across engines: the per-row products, the
# ``* 1e4 + 0.5`` and the ``floor`` are all IEEE-754 operations —
# bit-identical in Spark and DuckDB for identical parquet inputs, whatever
# they compute — the BIGINT sum is exact and order-independent, and the
# final long→double divide is again a deterministic IEEE op.  (floor(z+0.5)
# rather than ROUND(z): Spark's Round allocates a BigDecimal per row; floor
# stays inside whole-stage-codegen long arithmetic — measured another ~2x
# on q1 over the Round form, ~4x over DECIMAL sums.)
#
# Bound: per-group Σ|x|·1e4 must stay under 2^63 ⇒ Σ|x| < 9.2e14 per group
# (TPC-H q1's largest group sum is ~2.8e10 at sf1 ⇒ safe beyond sf10000);
# larger groups should use :func:`dsum`.
_FP = 10000.0


def fsum(col: Column) -> Column:
    """Order-independent deterministic fixed-point (1e-4) sum → double."""
    return F.sum(F.floor(col * F.lit(_FP) + F.lit(0.5))) / F.lit(_FP)


def favg(col: Column) -> Column:
    return fsum(col) / F.count(col).cast("double")


def ofsum(expr: str) -> str:
    """DuckDB oracle twin of :func:`fsum` (same association, same scale)."""
    return f"(SUM(CAST(FLOOR(({expr}) * 10000.0 + 0.5) AS BIGINT)) / 10000.0)"


def ofavg(expr: str) -> str:
    return f"({ofsum(expr)} / CAST(COUNT({expr}) AS DOUBLE))"
