"""Data-quality constraint checking (Deequ / Great Expectations-style):
declarative rules evaluated engine-side, reported as one row per rule —
the admission gate a production data pipeline runs before letting a new
batch touch training data.  Beyond-reference surface (the reference
engine has no validation operators).

Scale design: all ROW-LEVEL rules (not-null, accepted-values, range,
regex) fuse into ONE aggregate pass — a single scan with one conditional
SUM per rule, map-side combined, no matter how many rules are declared.
Uniqueness is one (key-count) aggregate; referential integrity is one
LEFT ANTI join against the (broadcastable) parent key set.  Every check
returns the same report schema so reports union/append across batches:
``check`` (STRING), ``kind`` (STRING), ``n_rows`` (BIGINT),
``n_violations`` (BIGINT), ``passed`` (BOOLEAN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["row_checks", "unique_check", "referential_check"]

_REPORT_COLS = ("check", "kind", "n_rows", "n_violations", "passed")


def row_checks(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """Evaluate row-level constraints in ONE fused aggregate pass.

    ``checks`` is a list of tuples:

    - ``("not_null", col)`` — NULL values violate;
    - ``("accepted_values", col, [v1, v2, ...])`` — non-NULL values
      outside the list violate (NULL passes; add a not_null rule to
      forbid it);
    - ``("in_range", col, lo, hi)`` — non-NULL values outside
      [lo, hi] violate;
    - ``("matches_regex", col, pattern)`` — non-NULL values not fully
      matching violate.

    Returns one report row per rule (see module docstring).  The plan is
    a single scan + one aggregate regardless of rule count.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    names: list[tuple[str, str]] = []
    for spec in checks:
        kind, col = spec[0], spec[1]
        c = F.col(col)
        if kind == "not_null":
            bad = c.isNull()
        elif kind == "accepted_values":
            bad = c.isNotNull() & ~c.isin(list(spec[2]))
        elif kind == "in_range":
            bad = c.isNotNull() & ((c < F.lit(spec[2])) | (c > F.lit(spec[3])))
        elif kind == "matches_regex":
            bad = c.isNotNull() & ~c.rlike(str(spec[2]))
        else:
            raise ValueError(f"unknown row check kind: {kind!r}")
        alias = f"_v{len(names)}"
        names.append((f"{kind}({col})", kind))
        aggs.append(F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(alias))
    agg = df.agg(*aggs)
    reports = []
    for i, (label, kind) in enumerate(names):
        reports.append(
            agg.select(
                F.lit(label).alias("check"),
                F.lit(kind).alias("kind"),
                F.col("_n").cast("long").alias("n_rows"),
                F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("long").alias(
                    "n_violations"
                ),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)


def unique_check(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Uniqueness constraint over a key: a violation is every row beyond
    the first of a duplicated (non-NULL-free) key; rows with any NULL key
    part are excluded (SQL UNIQUE semantics).  One groupBy(key) aggregate
    + one tiny reduce."""
    if not cols:
        raise ValueError("cols must be non-empty")
    cond = None
    for c in cols:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    keyed = df.filter(cond).groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
    rep = keyed.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).cast("long").alias(
            "n_violations"
        ),
    )
    label = name or f"unique({', '.join(cols)})"
    return rep.select(
        F.lit(label).alias("check"),
        F.lit("unique").alias("kind"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    name: str | None = None,
) -> DataFrame:
    """Referential integrity: non-NULL ``child.fk`` values missing from
    ``parent.pk`` violate (NULL FKs pass, SQL FK semantics).  One LEFT
    ANTI join against the distinct parent key set — broadcast when the
    parent side is dimension-sized, shuffle-hash otherwise (AQE
    decides)."""
    base = child.filter(F.col(fk).isNotNull())
    orphans = base.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    n = base.agg(F.count(F.lit(1)).alias("n")).withColumn("_j", F.lit(1))
    v = orphans.agg(F.count(F.lit(1)).alias("v")).withColumn("_j", F.lit(1))
    label = name or f"referential({fk} -> {pk})"
    return (
        n.join(v, "_j")
        .select(
            F.lit(label).alias("check"),
            F.lit("referential").alias("kind"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("v").cast("long").alias("n_violations"),
            (F.col("v") == 0).alias("passed"),
        )
    )
