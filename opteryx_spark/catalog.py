"""Table catalog: lazy registration of parquet datasets as temp views.

The reference resolves dataset names through its connector registry at plan
time (``opteryx/operators/read_node.py:158-284``).  Here a ``Catalog`` maps
names to Spark temp views so ``spark.sql`` sees them; scans stay lazy and
Catalyst applies pushdown/pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from opteryx_spark.session import tune_session

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't read them
    natively; we read them as long (``legacy.parquet.nanosAsLong``) and
    convert to microsecond timestamps (DuckDB-equivalent truncation)."""
    import pyarrow.dataset as pads
    import pyarrow.types as pat

    try:
        # pyarrow.dataset resolves single files AND directory-of-parts
        # datasets (pq.read_schema raises OSError on a directory, which
        # would silently skip the ns->us conversion)
        schema = pads.dataset(path, format="parquet").schema
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


# (applicationId, path) -> DataFrame: a DataFrame is just a plan, so reuse
# skips the per-call footer read + JVM schema inference (~100 ms/query of
# pure planning overhead).  Keyed by applicationId so a stopped session's
# plans are never reused.  LRU-capped so a long-lived session touching
# many distinct paths holds a bounded set of plan objects.
from collections import OrderedDict  # noqa: E402

_TABLE_CACHE: OrderedDict[tuple[str, str], DataFrame] = OrderedDict()
_TABLE_CACHE_MAX = 256


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    path = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    key = (spark.sparkContext.applicationId, path)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        _TABLE_CACHE.move_to_end(key)
        return cached
    ns_cols = _nanos_ts_columns(path)
    df = spark.read.parquet(path)
    for col in ns_cols:
        # backtick-escaped identifier (names may themselves contain `)
        esc = col.replace("`", "``")
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{esc}` div 1000")))
    _TABLE_CACHE[key] = df
    while len(_TABLE_CACHE) > _TABLE_CACHE_MAX:
        _TABLE_CACHE.popitem(last=False)
    return df


def register_sf_dir(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> dict[str, DataFrame]:
    """Register every parquet table under ``sf_dir`` as a temp view."""
    tune_session(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
