"""The driver contract file: shape and a mimicked driver run."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 85
    assert set(oracles) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in oracles.values())


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) >= 5


def test_mimic_driver_compare(spark, duck, sf_dir):
    """Exactly the driver's per-query flow for a sample of queries."""
    from tests._compare import compare

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ["tpch_q1_pricing_summary", "join_full_outer", "dedup_fingerprint"]:
        compare(qs[name](spark, sf_dir), duck, oracles[name], name)
