"""Query suite: every claimed capability as a (Spark impl, DuckDB oracle) pair.

This is the engine's correctness gate (SURVEY.md §5 tier-4: engine-oracle
comparison, mirroring the reference's DuckDB verifier
``tests/verifiers/what_would_duckdb_do.py``).  Each entry is:

- a callable ``(spark, sf_dir) -> DataFrame`` — the Spark-first
  implementation (DataFrame API, broadcast hints, no collect()), and
- optionally an ANSI-SQL oracle string DuckDB runs on the same parquet.

Determinism rules (so value-hashes match bit-for-bit):
- float aggregates are summed as DECIMAL(25,8) then cast to DOUBLE —
  exact, order-independent, identical in both engines;
- averages are computed as double(sum_decimal)/double(count);
- every computed column is aliased identically on both sides;
- top-k queries order by a deterministic tiebreaker before LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, None => rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(spark=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    # import side-effect-registered modules
    from opteryx_spark.suite import (  # noqa: F401
        battery,
        battery2,
        battery3,
        clickbench,
        ops,
        pipeline,
        tpch,
    )

    return REGISTRY
