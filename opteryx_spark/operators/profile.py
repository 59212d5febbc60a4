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
    engines: finite doubles route through DECIMAL(38,6) (float repr
    differs between engines; fixed-scale decimal text does not), while
    NaN/Inf/out-of-range values fall back to the plain cast instead of
    the decimal cast's silent NULL.  Rendering happens AFTER aggregation
    so numeric columns keep numeric ordering (string min/max would be
    lexicographic — '9' > '10')."""
    if dtype in ("double", "float"):
        dec = c.cast("decimal(38,6)").cast("string")
        return F.coalesce(dec, c.cast("string"))
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
    cols = sorted(cols or df.columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    # index-keyed aliases + df[c] references: column names containing
    # dots/backticks profile correctly (F.col would parse dots as
    # struct-field access)
    for i, c in enumerate(cols):
        distinct = (
            F.countDistinct(df[c]) if exact_distinct else F.approx_count_distinct(df[c])
        )
        aggs += [
            F.count(df[c]).alias(f"__nn_{i}"),
            distinct.alias(f"__nd_{i}"),
            _render(F.min(df[c]), dtypes[c]).alias(f"__mn_{i}"),
            _render(F.max(df[c]), dtypes[c]).alias(f"__mx_{i}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nn_{i}").cast("long").alias("n_nonnull"),
                F.col(f"__nd_{i}").cast("long").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_value"),
                F.col(f"__mx_{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.inline(entries))
