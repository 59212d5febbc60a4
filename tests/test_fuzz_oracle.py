"""Randomized single-table SELECT fuzzer compared against DuckDB.

Models the reference's engine-comparison fuzzers (SURVEY.md §5 tier-4:
``tests/fuzzing/test_sql_fuzzer_single_table_select.py`` — generate random
projections/filters/aggregations, run on both engines, compare).  Seeded
RNG keeps runs deterministic; every generated statement is valid in both
dialects by construction (ints/strings only, decimal-protected sums).
"""

from __future__ import annotations

import random

import pytest

from tests._compare import compare

# (table, int columns, string columns)
TABLES = [
    ("nation", ["n_nationkey", "n_regionkey"], ["n_name"]),
    ("customer", ["c_custkey", "c_nationkey"], ["c_name", "c_mktsegment"]),
    ("part", ["p_partkey", "p_size"], ["p_brand", "p_type"]),
    ("orders", ["o_orderkey", "o_custkey"], ["o_orderstatus", "o_orderpriority"]),
]


def gen_query(rng: random.Random) -> str:
    table, int_cols, str_cols = rng.choice(TABLES)
    ic = rng.choice(int_cols)
    sc = rng.choice(str_cols)
    preds = []
    if rng.random() < 0.7:
        preds.append(f"{ic} % {rng.randint(2, 7)} = {rng.randint(0, 1)}")
    if rng.random() < 0.5:
        preds.append(f"length({sc}) > {rng.randint(3, 10)}")
    if rng.random() < 0.3:
        preds.append(f"{sc} LIKE '%{rng.choice('AEIOU')}%'")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    mode = rng.random()
    if mode < 0.4:
        return (
            f"SELECT {sc}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({ic} AS DECIMAL(25,8))) AS DOUBLE) AS s, "
            f"CAST(MIN({ic}) AS BIGINT) AS mn, CAST(MAX({ic}) AS BIGINT) AS mx "
            f"FROM {table}{where} GROUP BY {sc} ORDER BY {sc}"
        )
    if mode < 0.7:
        return (
            f"SELECT {ic}, {sc} FROM {table}{where} "
            f"ORDER BY {ic}, {sc} LIMIT {rng.randint(5, 50)}"
        )
    return (
        f"SELECT DISTINCT {sc} FROM {table}{where} ORDER BY {sc} "
        f"LIMIT {rng.randint(5, 30)}"
    )


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_single_table(spark, duck, sf_dir, seed):
    from opteryx_spark.catalog import register_sf_dir

    register_sf_dir(spark, sf_dir)
    rng = random.Random(1000 + seed)
    sql = gen_query(rng)
    compare(spark.sql(sql), duck, sql, name=f"fuzz[{seed}]: {sql}")
