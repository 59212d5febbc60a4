"""Operator battery: one suite entry per operator family from SURVEY.md §2.

Mirrors the reference's operator inventory (``opteryx/operators/*`` —
joins ``inner/outer/cross/filter_join/non_equi``, distinct, union, sort,
limit/offset, unnest, aggregates) plus the places we deliberately exceed
the reference: window functions (§2.5 "absent in reference"),
INTERSECT/EXCEPT (§2.7 unsupported there), ROLLUP (§2.4).

Each query is written DataFrame-first with broadcast hints on dimension
tables so the physical plan at 100 TB is BroadcastHashJoin for dims and
shuffle-hash/sort-merge only on fact-fact keys.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opteryx_spark.suite import register
from opteryx_spark.suite._util import dsum, osum, t

# --- joins ------------------------------------------------------------------


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    cust, orders = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT n_name, CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_right_outer(spark, sf_dir):
    supp, nation = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        .orderBy("n_name")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust_nations AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer WHERE c_acctbal > 9000.0 GROUP BY c_nationkey
    ), supp_nations AS (
      SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supplier WHERE s_acctbal > 9000.0 GROUP BY s_nationkey
    )
    SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM cust_nations FULL OUTER JOIN supp_nations ON c_nationkey = s_nationkey
    ORDER BY nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000.0)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 200000.0)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_left_semi(spark, sf_dir):
    cust, orders = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000.0)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_left_anti(spark, sf_dir):
    cust, orders = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def join_cross(spark, sf_dir):
    region, nation = t(spark, sf_dir, "region"), t(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "join_non_equi",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE a.n_regionkey = b.n_regionkey
    ORDER BY n1, n2
    """,
)
def join_non_equi(spark, sf_dir):
    a = t(spark, sf_dir, "nation").alias("a")
    b = t(spark, sf_dir, "nation").alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2"))
        .orderBy("n1", "n2")
    )


# --- set operations ---------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT 'cust' AS kind, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supp' AS kind, s_nationkey AS nationkey FROM supplier
    ) u GROUP BY kind ORDER BY kind
    """,
)
def set_union_all(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select(
        F.lit("cust").alias("kind"), F.col("c_nationkey").alias("nationkey")
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("kind"), F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).groupBy("kind").agg(F.count(F.lit(1)).alias("n")).orderBy("kind")


@register(
    "set_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900.0
      UNION
      SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9900.0
    ) u ORDER BY nationkey
    """,
)
def set_union_distinct(spark, sf_dir):
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900.0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9900.0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return cust.union(supp).distinct().orderBy("nationkey")


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500.0
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9500.0
    ORDER BY nationkey
    """,
)
def set_intersect(spark, sf_dir):
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500.0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500.0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return cust.intersect(supp).orderBy("nationkey")


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500.0
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9500.0
    ORDER BY nationkey
    """,
)
def set_except(spark, sf_dir):
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500.0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500.0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    # subtract == EXCEPT DISTINCT (set semantics); exceptAll would be
    # multiset difference and can keep values present on both sides
    return cust.subtract(supp).orderBy("nationkey")


# --- distinct / sort / limit ------------------------------------------------


@register(
    "distinct_on_latest_order",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) x WHERE rn = 1 ORDER BY o_custkey
    """,
)
def distinct_on_latest_order(spark, sf_dir):
    """Reference ``DISTINCT ON (cols)`` (``operators/distinct_node.py:24-66``)
    re-expressed as a ranking window — the scalable Spark form."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy("o_custkey")
    )


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def sort_limit_offset(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
    )


# --- aggregates -------------------------------------------------------------


@register(
    "agg_global",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(MIN(l_shipdate) AS DATE) AS min_ship,
           CAST(MAX(l_shipdate) AS DATE) AS max_ship,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_shipdate").cast("date").alias("min_ship"),
        F.max("l_shipdate").cast("date").alias("max_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_array_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_name), '|') AS names
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_array_agg(spark, sf_dir):
    """Reference ``ARRAY_AGG [ORDER BY]`` (``aggregate_node.py:29-48``).

    The aggregate is a real array (sort_array(collect_list(...))); it is
    serialized with array_join in the final projection because the driver's
    canonicalizer can't sort/hash array cells."""
    nation = t(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("names"))
        .orderBy("n_regionkey")
    )


@register(
    "agg_variance_stddev",
    oracle="""
    SELECT l_returnflag,
           (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,8))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE) - 1.0) AS var_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_variance_stddev(spark, sf_dir):
    """Sample variance via exact decimal moment sums (deterministic across
    engines, unlike streaming Welford implementations)."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(F.lit(1)).cast("double")
    s1 = dsum(q)
    s2 = dsum(q * q)
    return (
        li.groupBy("l_returnflag")
        .agg(((s2 - s1 * s1 / n) / (n - F.lit(1.0))).alias("var_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1 ORDER BY bucket
    """,
)
def agg_histogram(spark, sf_dir):
    """Reference ``HISTOGRAM`` aggregate (``aggregate_node.py:29-48``) as a
    bucketed groupBy — the shuffle-partial-agg form that scales."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 10.0).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT n_regionkey, n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_cust
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_regionkey, n_name)
    ORDER BY n_regionkey NULLS FIRST, n_name NULLS FIRST
    """,
)
def agg_rollup(spark, sf_dir):
    nation, cust = t(spark, sf_dir, "nation"), t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_regionkey", "n_name")
        .agg(F.count("c_custkey").alias("n_cust"))
        .orderBy(F.asc_nulls_first("n_regionkey"), F.asc_nulls_first("n_name"))
    )


# --- window functions (exceeds reference: SURVEY §2.5 "absent") ------------


@register(
    "window_topn_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) x WHERE rn <= 2 ORDER BY c_custkey, rn
    """,
)
def window_topn_per_group(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .orderBy("c_custkey", "rn")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8)))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(25,8)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_rank",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS bal_rank,
           LAG(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS prev_supp
    FROM supplier ORDER BY s_nationkey, bal_rank
    """,
)
def window_lag_rank(spark, sf_dir):
    supp = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.lag("s_suppkey").over(w).alias("prev_supp"),
    ).orderBy("s_nationkey", "bal_rank")


# --- scalar expression batteries -------------------------------------------


@register(
    "expr_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 250000.0 THEN 'high'
                WHEN o_totalprice >= 100000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2 ORDER BY price_band, o_orderstatus
    """,
)
def expr_case_when(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 250000.0, "high")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("low")
    )
    return (
        orders.groupBy(band.alias("price_band"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("price_band", "o_orderstatus")
    )


@register(
    "expr_string_funcs",
    oracle="""
    SELECT n_name,
           lower(n_name) AS lname,
           upper(substring(n_name, 1, 3)) AS pre3,
           reverse(n_name) AS rname,
           CAST(length(n_name) AS BIGINT) AS name_len,
           lpad(n_name, 20, '.') AS padded,
           replace(n_name, 'A', '@') AS subbed,
           concat(n_name, '-', CAST(n_nationkey AS VARCHAR)) AS tagged,
           CAST(levenshtein(n_name, 'CHINA') AS BIGINT) AS lev,
           starts_with(n_name, 'U') AS starts_u,
           CAST(strpos(n_name, 'AN') AS BIGINT) AS an_pos,
           trim(concat('  ', n_name, '  ')) AS trimmed
    FROM nation ORDER BY n_name
    """,
)
def expr_string_funcs(spark, sf_dir):
    nation = t(spark, sf_dir, "nation")
    n = F.col("n_name")
    return nation.select(
        n,
        F.lower(n).alias("lname"),
        F.upper(F.substring(n, 1, 3)).alias("pre3"),
        F.reverse(n).alias("rname"),
        F.length(n).cast("long").alias("name_len"),
        F.lpad(n, 20, ".").alias("padded"),
        F.regexp_replace(n, "A", "@").alias("subbed"),
        F.concat(n, F.lit("-"), F.col("n_nationkey").cast("string")).alias("tagged"),
        F.levenshtein(n, F.lit("CHINA")).cast("long").alias("lev"),
        n.startswith("U").alias("starts_u"),
        F.instr(n, "AN").cast("long").alias("an_pos"),
        F.trim(F.concat(F.lit("  "), n, F.lit("  "))).alias("trimmed"),
    ).orderBy("n_name")


@register(
    "expr_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS min_days_since
    FROM orders
    GROUP BY 1, 2, 3, 4 ORDER BY o_year, o_month
    """,
)
def expr_date_funcs(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.groupBy(
            F.year(d).cast("long").alias("o_year"),
            F.quarter(d).cast("long").alias("o_quarter"),
            F.month(d).cast("long").alias("o_month"),
            F.date_trunc("month", d).cast("date").alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")))
            .cast("long")
            .alias("min_days_since"),
        )
        .orderBy("o_year", "o_month")
    )


@register(
    "expr_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           floor(l_extendedprice) AS flr,
           ceil(l_extendedprice) AS cl,
           abs(l_extendedprice - 50000.0) AS dist,
           sqrt(l_extendedprice) AS rt,
           l_extendedprice * l_extendedprice AS sq,
           round(ln(l_extendedprice), 6) AS lg
    FROM lineitem WHERE l_orderkey <= 500
    ORDER BY l_orderkey, l_linenumber
    """,
)
def expr_math_funcs(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    x = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(x, 1).alias("r1"),
        F.floor(x).cast("double").alias("flr"),
        F.ceil(x).cast("double").alias("cl"),
        F.abs(x - 50000.0).alias("dist"),
        F.sqrt(x).alias("rt"),
        (x * x).alias("sq"),
        F.round(F.log(x), 6).alias("lg"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "expr_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def expr_json_extract(spark, sf_dir):
    """Reference ``->``/``->>`` JSONB operators
    (``managers/expression/binary_operators.py:25-80``) over a JSON string
    column, via JVM-side ``get_json_object`` (no Python UDF)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "tvf_generate_series",
    oracle="""
    SELECT CAST(SUM(g) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN g % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS div7
    FROM generate_series(1, 100000) AS s(g)
    """,
)
def tvf_generate_series(spark, sf_dir):
    """Reference ``GENERATE_SERIES`` table function
    (``operators/function_dataset_node.py:70-139``) via ``spark.range`` —
    a parallel, partitioned source (not a driver-side list)."""
    g = spark.range(1, 100001).select(F.col("id").alias("g"))
    return g.agg(
        F.sum("g").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("g") % 7 == 0, 1).otherwise(0)).alias("div7"),
    )


@register(
    "unnest_tokens",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) u
    WHERE token <> ''
    GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
)
def unnest_tokens(spark, sf_dir):
    """Reference ``CROSS JOIN UNNEST`` (``operators/unnest_join_node.py``)
    as explode() — Spark's lateral-view, fully parallel."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


# --- skew-aware join demonstration ------------------------------------------

_SKEW_ORACLE = f"""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {osum('value')} AS total_value
    FROM (SELECT CASE WHEN event_id % 10 <> 0 THEN 7 ELSE user_id END AS user_id,
                 value
          FROM events) e
    JOIN customer ON c_custkey = e.user_id
    GROUP BY c_mktsegment ORDER BY segment
    """


def _skewed_events(spark, sf_dir):
    """90% of events re-keyed onto one hot user — the classic celebrity/
    default-value skew that overwhelms a hash-partitioned join."""
    ev = t(spark, sf_dir, "events")
    hot = F.when(F.col("event_id") % 10 != 0, F.lit(7)).otherwise(F.col("user_id"))
    return ev.select(hot.alias("user_id"), "value")


def _user_dim(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    return cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")


def _skew_agg(joined):
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .orderBy("segment")
    )


@register("skew_join_naive", oracle=_SKEW_ORACLE)
def skew_join_naive(spark, sf_dir):
    """Baseline: hash-shuffle join on the skewed key (shuffle_hash hint
    models the 100 TB case where the dim exceeds broadcast range; one
    reducer owns the hot key)."""
    joined = _skewed_events(spark, sf_dir).join(
        _user_dim(spark, sf_dir).hint("shuffle_hash"), "user_id"
    )
    return _skew_agg(joined)


@register("skew_join_salted", oracle=_SKEW_ORACLE)
def skew_join_salted(spark, sf_dir):
    """Same join through :func:`opteryx_spark.operators.scale.salted_join`:
    the hot key spreads over 16 salt buckets so no single reducer owns it.
    Identical results (same oracle) — only the physical plan differs."""
    from opteryx_spark.operators import scale

    joined = scale.salted_join(
        _skewed_events(spark, sf_dir),
        _user_dim(spark, sf_dir).hint("shuffle_hash"),
        "user_id",
        salt=16,
    )
    return _skew_agg(joined)
