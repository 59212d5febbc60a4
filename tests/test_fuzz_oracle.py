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

# ---------------------------------------------------------------------------
# r10 widening (VERDICT r9 #4): the reference fuzzes joins too
# (tests/fuzzing/test_sql_fuzzer_join.py) and this fuzzer never left
# single-table SELECTs.  Four more grammars — equi-joins, window
# functions, NULL-heavy derived columns, DECIMAL arithmetic — at >= 200
# seeds total.  Every statement is valid in BOTH dialects by
# construction, and deterministic: unique-key ORDER BY everywhere, any
# float reduced through integer quantization first (DuckDB's window
# aggregation uses a segment tree, so cross-engine float sums are only
# reproducible when the addition is exact).
# ---------------------------------------------------------------------------

# (left, right, join cond, left int col, left str col, right int col, right str col)
JOINS = [
    ("customer", "nation", "c_nationkey = n_nationkey",
     "c_custkey", "c_mktsegment", "n_regionkey", "n_name"),
    ("orders", "customer", "o_custkey = c_custkey",
     "o_orderkey", "o_orderpriority", "c_nationkey", "c_mktsegment"),
    ("lineitem", "orders", "l_orderkey = o_orderkey",
     "l_suppkey", "l_returnflag", "o_custkey", "o_orderstatus"),
    ("supplier", "nation", "s_nationkey = n_nationkey",
     "s_suppkey", "s_name", "n_regionkey", "n_name"),
]


def gen_join_query(rng: random.Random) -> str:
    lt, rt, cond, lic, lsc, ric, rsc = rng.choice(JOINS)
    jt = rng.choice(["JOIN", "LEFT JOIN"])
    preds = []
    if rng.random() < 0.6:
        preds.append(f"{lic} % {rng.randint(2, 9)} = {rng.randint(0, 1)}")
    if rng.random() < 0.4:
        preds.append(f"length({lsc}) > {rng.randint(3, 12)}")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    frm = f"FROM {lt} {jt} {rt} ON {cond}"
    mode = rng.random()
    if mode < 0.5:
        # grouped: COUNT(right col) exercises LEFT-join NULL counting
        gb = rng.choice([lsc, rsc])
        return (
            f"SELECT {gb} AS g, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT({ric}) AS BIGINT) AS n_r, "
            f"CAST(MIN({lic}) AS BIGINT) AS mn, CAST(MAX({lic}) AS BIGINT) AS mx "
            f"{frm}{where} GROUP BY {gb} ORDER BY g NULLS FIRST"
        )
    if mode < 0.8:
        return (
            f"SELECT {lic} AS a, {lsc} AS b, {rsc} AS c {frm}{where} "
            f"ORDER BY a, b, c NULLS FIRST LIMIT {rng.randint(10, 60)}"
        )
    return (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST({lic} AS DECIMAL(25, 2))) AS DOUBLE) AS s "
        f"{frm}{where}"
    )


def gen_window_query(rng: random.Random) -> str:
    table, part, okey, icol = rng.choice([
        ("orders", "o_orderpriority", "o_orderkey", "o_custkey"),
        ("customer", "c_mktsegment", "c_custkey", "c_nationkey"),
        ("lineitem", "l_returnflag", "l_orderkey * 10 + l_linenumber", "l_suppkey"),
        ("events", "event_type", "event_id", "user_id"),
    ])
    fn = rng.choice([
        "row_number()",
        "rank()",
        "dense_rank()",
        f"CAST(count(*) OVER w AS BIGINT)",
        f"CAST(sum({icol}) OVER w AS BIGINT)",
        f"lag({icol}) OVER w",
        f"lead({icol}) OVER w",
    ])
    expr = fn if "OVER" in fn else f"{fn} OVER w"
    k = rng.randint(2, 8)
    return (
        f"SELECT g, k, v FROM ("
        f"SELECT {part} AS g, {okey} AS k, {expr} AS v, "
        f"row_number() OVER w AS rn "
        f"FROM {table} WINDOW w AS (PARTITION BY {part} ORDER BY {okey}) "
        f") t WHERE rn <= {k} ORDER BY g, k"
    )


def gen_null_query(rng: random.Random) -> str:
    table, ic, sc = rng.choice([
        ("customer", "c_custkey", "c_mktsegment"),
        ("orders", "o_orderkey", "o_orderpriority"),
        ("part", "p_partkey", "p_brand"),
        ("events", "event_id", "event_type"),
    ])
    m = rng.randint(3, 9)
    z = rng.randint(0, m - 1)
    nic = f"NULLIF({ic} % {m}, {z})"  # NULL-heavy derived int
    nsc = f"NULLIF({sc}, (SELECT MIN({sc}) FROM {table}))"  # NULL-heavy str
    mode = rng.random()
    if mode < 0.4:
        # COUNT(col) vs COUNT(*) and a NULL group
        return (
            f"SELECT {nic} AS g, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT({nsc}) AS BIGINT) AS n_s "
            f"FROM {table} GROUP BY {nic} ORDER BY g NULLS "
            f"{rng.choice(['FIRST', 'LAST'])}"
        )
    if mode < 0.7:
        # 3VL in CASE / IS NULL filters
        return (
            f"SELECT CAST(SUM(CASE WHEN {nic} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_null, "
            f"CAST(SUM(CASE WHEN {nic} > {z} THEN 1 ELSE 0 END) AS BIGINT) AS n_gt, "
            f"CAST(COUNT(COALESCE({nic}, -1)) AS BIGINT) AS n_co FROM {table}"
        )
    return (
        f"SELECT {ic} AS k, {nic} AS v FROM {table} "
        f"WHERE {nic} IS {rng.choice(['NULL', 'NOT NULL'])} "
        f"ORDER BY k LIMIT {rng.randint(5, 40)}"
    )


def gen_decimal_query(rng: random.Random) -> str:
    p = rng.choice(["l_quantity", "l_extendedprice"])
    gb = rng.choice(["l_returnflag", "l_linestatus"])
    s = rng.randint(1, 3)
    mode = rng.random()
    if mode < 0.5:
        return (
            f"SELECT {gb} AS g, "
            f"CAST(SUM(CAST({p} AS DECIMAL(18, {s}))) AS DOUBLE) AS s1, "
            f"CAST(SUM(CAST({p} AS DECIMAL(12, 2)) * CAST(l_discount AS DECIMAL(6, 4)))"
            f" AS DOUBLE) AS s2, "
            f"CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM lineitem GROUP BY {gb} ORDER BY g"
        )
    return (
        f"SELECT l_returnflag AS g, "
        f"CAST(MIN(CAST({p} AS DECIMAL(18, {s}))) AS DOUBLE) AS mn, "
        f"CAST(MAX(CAST({p} AS DECIMAL(18, {s}))) AS DOUBLE) AS mx "
        f"FROM lineitem WHERE l_suppkey % {rng.randint(2, 5)} = 0 "
        f"GROUP BY l_returnflag ORDER BY g"
    )


def _run_fuzz(spark, duck, sf_dir, gen, seed):
    from opteryx_spark.catalog import register_sf_dir

    register_sf_dir(spark, sf_dir)
    rng = random.Random(seed)
    sql = gen(rng)
    compare(spark.sql(sql), duck, sql, name=f"fuzz[{seed}]: {sql}")


@pytest.mark.parametrize("seed", range(2000, 2075))
def test_fuzz_join(spark, duck, sf_dir, seed):
    _run_fuzz(spark, duck, sf_dir, gen_join_query, seed)


@pytest.mark.parametrize("seed", range(3000, 3060))
def test_fuzz_window(spark, duck, sf_dir, seed):
    _run_fuzz(spark, duck, sf_dir, gen_window_query, seed)


@pytest.mark.parametrize("seed", range(4000, 4060))
def test_fuzz_null(spark, duck, sf_dir, seed):
    _run_fuzz(spark, duck, sf_dir, gen_null_query, seed)


@pytest.mark.parametrize("seed", range(5000, 5040))
def test_fuzz_decimal(spark, duck, sf_dir, seed):
    _run_fuzz(spark, duck, sf_dir, gen_decimal_query, seed)
