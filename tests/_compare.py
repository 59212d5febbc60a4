"""Local twin of the driver's t2 comparison: row-count + schema + value
comparison between a Spark DataFrame and a DuckDB oracle result.

Values are compared exactly (order-insensitive, columns sorted by name) —
the same bar the driver's value-hash sets, so a pass here predicts a pass
in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_canon_value(row[i]) for i in order))
    return sorted(out, key=repr)


def compare(spark_df, duck_con, oracle: str, name: str = "") -> None:
    sp_cols = spark_df.columns
    sp_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(oracle)
    du_cols = [d[0] for d in res.description]
    du_rows = res.fetchall()
    assert sorted(sp_cols) == sorted(du_cols), (
        f"{name}: column mismatch spark={sorted(sp_cols)} duck={sorted(du_cols)}"
    )
    assert len(sp_rows) == len(du_rows), (
        f"{name}: rowcount mismatch spark={len(sp_rows)} duck={len(du_rows)}"
    )
    a = _canon_rows(sp_cols, sp_rows)
    b = _canon_rows(du_cols, du_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
