"""Dataset profiling: one-pass per-column statistics.

The data-engineering counterpart of the reference's ``SHOW EXTENDED
COLUMNS`` surface (reference ``opteryx/operators/show_columns_node.py``
collects per-column counts/min/max), re-expressed as a single Spark
aggregate a 100 TB table can afford: every statistic for every column is
computed in ONE scan + one aggregate row, then unpivoted driver-free.

``exact_distinct=True`` uses exact ``count(DISTINCT)`` (Spark plans one
expand — rows x columns — still a single pass); the default uses
``approx_count_distinct`` (HLL, no expand), which is the 100 TB setting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _render(c: Column, dtype: str) -> Column:
    """Render an aggregated min/max as a string deterministically across
    engines: doubles route through DECIMAL(25,6) (float repr differs
    between engines; fixed-scale decimal text does not).  Rendering
    happens AFTER aggregation so numeric columns keep numeric ordering
    (string min/max would be lexicographic — '9' > '10')."""
    if dtype in ("double", "float"):
        return c.cast("decimal(25,6)").cast("string")
    return c.cast("string")


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nonnull, n_distinct,
    min_value, max_value), one row per column, ordered by column name.

    One scan, one aggregate, no collect: the wide single-row aggregate is
    unpivoted with ``inline`` on a literal-indexed struct array — the
    plan stays a partial/final aggregate regardless of table size.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.countDistinct(F.col(c)) if exact_distinct else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            _render(F.min(F.col(c)), dtypes[c]).alias(f"__mn_{c}"),
            _render(F.max(F.col(c)), dtypes[c]).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nn_{c}").cast("long").alias("n_nonnull"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in sorted(cols)
        ]
    )
    return row.select(F.inline(entries))
