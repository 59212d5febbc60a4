"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (TPC-H q1 pricing summary) at sf0.001.
- ``queries()`` — every implemented operator/query from SURVEY.md §2 and
  the training-data pipeline extensions, as (spark, sf_dir) callables.
- ``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted only
  for probabilistic / hash-seeded operators, which get rows-only checks).

Implementations live in ``opteryx_spark/suite/`` (registry pattern).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opteryx_spark.suite import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_all()
    return reg["tpch_q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
