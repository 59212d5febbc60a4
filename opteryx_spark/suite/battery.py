"""Expression batteries: null semantics, predicates, casts, arrays, windows.

Models the reference's shape/null-semantics batteries (SURVEY.md §5:
``test_null_semantics.py``, ``test_shapes_operators_expressions.py``) as
oracle-paired queries.  NULL-bearing boolean columns are synthesized from
the driver tables (CASE → true/false/NULL) so Kleene-logic behavior is
exercised on real data in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opteryx_spark.suite import register
from opteryx_spark.suite._util import t

# boolean with NULLs: true (>5000), false (2500..5000], NULL (<=2500)
_B = "CASE WHEN c_acctbal > 5000.0 THEN TRUE WHEN c_acctbal > 2500.0 THEN FALSE ELSE NULL END"
_C = "CASE WHEN c_nationkey % 3 = 0 THEN TRUE WHEN c_nationkey % 3 = 1 THEN FALSE ELSE NULL END"


def _b_col():
    return (
        F.when(F.col("c_acctbal") > 5000.0, F.lit(True))
        .when(F.col("c_acctbal") > 2500.0, F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def _c_col():
    return (
        F.when(F.col("c_nationkey") % 3 == 0, F.lit(True))
        .when(F.col("c_nationkey") % 3 == 1, F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


@register(
    "null_where_filters",
    oracle=f"""
    SELECT
      CAST((SELECT COUNT(*) FROM (SELECT {_B} AS b FROM customer) x WHERE b) AS BIGINT) AS n_true,
      CAST((SELECT COUNT(*) FROM (SELECT {_B} AS b FROM customer) x WHERE NOT b) AS BIGINT) AS n_false,
      CAST((SELECT COUNT(*) FROM (SELECT {_B} AS b FROM customer) x WHERE b IS NULL) AS BIGINT) AS n_null,
      CAST((SELECT COUNT(*) FROM (SELECT {_B} AS b FROM customer) x WHERE b IS NOT NULL) AS BIGINT) AS n_not_null
    """,
)
def null_where_filters(spark, sf_dir):
    """Kleene WHERE semantics: NULL rows are dropped by both ``b`` and
    ``NOT b`` (reference null battery, ``test_null_semantics.py``)."""
    cust = t(spark, sf_dir, "customer").select(_b_col().alias("b"))
    return (
        cust.agg(
            F.sum(F.when(F.col("b"), 1).otherwise(0)).alias("n_true"),
            F.sum(F.when(~F.col("b"), 1).otherwise(0)).alias("n_false"),
            F.sum(F.when(F.col("b").isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(F.col("b").isNotNull(), 1).otherwise(0)).alias("n_not_null"),
        )
    )


@register(
    "null_three_valued_logic",
    oracle=f"""
    WITH x AS (SELECT {_B} AS b, {_C} AS c FROM customer)
    SELECT
      CAST(SUM(CASE WHEN b AND c THEN 1 ELSE 0 END) AS BIGINT) AS n_and,
      CAST(SUM(CASE WHEN b OR c THEN 1 ELSE 0 END) AS BIGINT) AS n_or,
      CAST(SUM(CASE WHEN (b AND c) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_and_null,
      CAST(SUM(CASE WHEN (b OR c) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_or_null,
      CAST(SUM(CASE WHEN b IS NOT DISTINCT FROM c THEN 1 ELSE 0 END) AS BIGINT) AS n_same
    FROM x
    """,
)
def null_three_valued_logic(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select(_b_col().alias("b"), _c_col().alias("c"))
    b, c = F.col("b"), F.col("c")
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return cust.agg(
        one_if(b & c).alias("n_and"),
        one_if(b | c).alias("n_or"),
        one_if((b & c).isNull()).alias("n_and_null"),
        one_if((b | c).isNull()).alias("n_or_null"),
        one_if(b.eqNullSafe(c)).alias("n_same"),
    )


@register(
    "null_in_notin",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM customer WHERE c_nationkey IN (1, 2, 3)) AS BIGINT) AS n_in,
      CAST((SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN (1, 2, 3)) AS BIGINT) AS n_not_in,
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_nationkey IN (1, 2, NULL)) AS BIGINT) AS n_in_with_null,
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_nationkey NOT IN (1, 2, NULL)) AS BIGINT) AS n_not_in_with_null,
      CAST((SELECT COUNT(*) FROM customer
            WHERE NULLIF(c_nationkey, 5) IS NULL) AS BIGINT) AS n_nullif,
      CAST((SELECT COUNT(*) FROM customer
            WHERE COALESCE(NULLIF(c_nationkey, 5), 99) = 99) AS BIGINT) AS n_coalesce
    """,
)
def null_in_notin(spark, sf_dir):
    """IN/NOT IN with a NULL element: NOT IN (… NULL) matches nothing —
    classic SQL trap, identical in both engines."""
    cust = t(spark, sf_dir, "customer")
    k = F.col("c_nationkey")
    null_long = F.lit(None).cast("int")
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return cust.agg(
        one_if(k.isin(1, 2, 3)).alias("n_in"),
        one_if(~k.isin(1, 2, 3)).alias("n_not_in"),
        one_if(k.isin(F.lit(1), F.lit(2), null_long)).alias("n_in_with_null"),
        one_if(~k.isin(F.lit(1), F.lit(2), null_long)).alias("n_not_in_with_null"),
        one_if(F.nullif(k, F.lit(5)).isNull()).alias("n_nullif"),
        one_if(F.coalesce(F.nullif(k, F.lit(5)), F.lit(99)) == 99).alias("n_coalesce"),
    )


@register(
    "pred_like_battery",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN n_name LIKE 'U%' THEN 1 ELSE 0 END) AS BIGINT) AS like_prefix,
      CAST(SUM(CASE WHEN n_name LIKE '%IA' THEN 1 ELSE 0 END) AS BIGINT) AS like_suffix,
      CAST(SUM(CASE WHEN n_name LIKE '%AN%' THEN 1 ELSE 0 END) AS BIGINT) AS like_contains,
      CAST(SUM(CASE WHEN n_name LIKE '_R%' THEN 1 ELSE 0 END) AS BIGINT) AS like_underscore,
      CAST(SUM(CASE WHEN n_name NOT LIKE '%A%' THEN 1 ELSE 0 END) AS BIGINT) AS not_like,
      CAST(SUM(CASE WHEN lower(n_name) LIKE '%united%' THEN 1 ELSE 0 END) AS BIGINT) AS ilike_sub,
      CAST(SUM(CASE WHEN regexp_matches(n_name, '^[A-F]') THEN 1 ELSE 0 END) AS BIGINT) AS rlike_class
    FROM nation
    """,
)
def pred_like_battery(spark, sf_dir):
    """LIKE/ILIKE/RLIKE family (reference comparison ops,
    ``managers/expression/ops.py:138-381``)."""
    nation = t(spark, sf_dir, "nation")
    n = F.col("n_name")
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return nation.agg(
        one_if(n.like("U%")).alias("like_prefix"),
        one_if(n.like("%IA")).alias("like_suffix"),
        one_if(n.like("%AN%")).alias("like_contains"),
        one_if(n.like("_R%")).alias("like_underscore"),
        one_if(~n.like("%A%")).alias("not_like"),
        one_if(n.ilike("%united%")).alias("ilike_sub"),
        one_if(n.rlike("^[A-F]")).alias("rlike_class"),
    )


@register(
    "pred_between_casts",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN p_size BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_between,
      CAST(SUM(CASE WHEN p_size NOT BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_not_between,
      CAST(SUM(CASE WHEN TRY_CAST(p_brand AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable,
      CAST(SUM(TRY_CAST(substring(p_brand, 7) AS BIGINT)) AS BIGINT) AS sum_brand_num,
      CAST(SUM(CAST(CAST(CAST(p_retailprice AS VARCHAR) AS DOUBLE) AS DECIMAL(25,8)))
           AS BIGINT) AS roundtrip_trunc
    FROM part
    """,
)
def pred_between_casts(spark, sf_dir):
    """BETWEEN + permissive casts (reference TRY_* casts,
    ``functions/__init__.py:520-541``; non-ANSI Spark cast == TRY_CAST)."""
    part = t(spark, sf_dir, "part")
    sz = F.col("p_size")
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return part.agg(
        one_if(sz.between(10, 20)).alias("n_between"),
        one_if(~sz.between(10, 20)).alias("n_not_between"),
        one_if(F.col("p_brand").cast("double").isNull()).alias("n_uncastable"),
        F.sum(F.substring(F.col("p_brand"), 7, 10).cast("long")).alias("sum_brand_num"),
        F.sum(F.col("p_retailprice").cast("string").cast("double").cast("decimal(25,8)"))
        .cast("long")
        .alias("roundtrip_trunc"),
    )


@register(
    "hash_encode_funcs",
    oracle="""
    SELECT n_name,
           md5(n_name) AS name_md5,
           sha256(n_name) AS name_sha256,
           to_base64(CAST(n_name AS BLOB)) AS name_b64,
           hex(CAST(n_name AS BLOB)) AS name_hex
    FROM nation ORDER BY n_name
    """,
)
def hash_encode_funcs(spark, sf_dir):
    """Hash/encode catalog (reference ``functions/__init__.py:572-589``)."""
    nation = t(spark, sf_dir, "nation")
    n = F.col("n_name")
    return nation.select(
        n,
        F.md5(n).alias("name_md5"),
        F.sha2(n, 256).alias("name_sha256"),
        F.base64(n.cast("binary")).alias("name_b64"),
        F.hex(n.cast("binary")).alias("name_hex"),
    ).orderBy("n_name")


@register(
    "array_funcs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           tk[1] AS first_token,
           tk[-1] AS last_token,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           list_contains(tk, 'the') AS has_the,
           array_to_string(list_sort(list_distinct(tk))[1:3], ',') AS first3_sorted,
           CAST(list_position(tk, 'data') AS BIGINT) AS data_pos
    FROM toks ORDER BY doc_id
    """,
)
def array_funcs(spark, sf_dir):
    """ARRAY function family (reference ``functions/__init__.py:594-603``:
    ARRAY_CONTAINS, SORT, subscripting, position)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tk = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.element_at(tk, 1).alias("first_token"),
        F.element_at(tk, -1).alias("last_token"),
        F.size(tk).cast("long").alias("n_tokens"),
        F.array_contains(tk, "the").alias("has_the"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(tk)), 1, 3), ",").alias(
            "first3_sorted"
        ),
        F.array_position(tk, "data").cast("long").alias("data_pos"),
    ).orderBy("doc_id")


@register(
    "regexp_funcs",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT) AS k_val,
           regexp_replace(props, '\\d+', '#', 'g') AS masked,
           regexp_matches(props, '"k": \\d\\d+') AS k_multi_digit
    FROM events WHERE event_id < 200 ORDER BY event_id
    """,
)
def regexp_funcs(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    p = F.col("props")
    return ev.select(
        "event_id",
        F.regexp_extract(p, '"k": (-?\\d+)', 1).cast("long").alias("k_val"),
        F.regexp_replace(p, "\\d+", "#").alias("masked"),
        p.rlike('"k": \\d\\d+').alias("k_multi_digit"),
    ).orderBy("event_id")


@register(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_median_percentile(spark, sf_dir):
    """Exact percentiles (reference APPROXIMATE_MEDIAN upgraded to exact —
    integer-valued doubles make interpolation bit-deterministic)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_bool_bit",
    oracle="""
    SELECT n_regionkey,
           bool_and(n_nationkey % 2 = 0) AS all_even,
           bool_or(n_nationkey % 2 = 0) AS any_even,
           CAST(bit_and(n_nationkey) AS BIGINT) AS band,
           CAST(bit_or(n_nationkey) AS BIGINT) AS bor,
           CAST(bit_xor(n_nationkey) AS BIGINT) AS bxor
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_bool_bit(spark, sf_dir):
    nation = t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.bool_and(k % 2 == 0).alias("all_even"),
            F.bool_or(k % 2 == 0).alias("any_even"),
            F.bit_and(k).cast("long").alias("band"),
            F.bit_or(k).cast("long").alias("bor"),
            F.bit_xor(k).cast("long").alias("bxor"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "agg_cube_grouping",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)
def agg_cube_grouping(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


@register(
    "window_frames_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_window,
           first_value(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS BIGINT) AS dr,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS BIGINT) AS quartile
    FROM orders WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_frames_moving_avg(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = order_w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,8)"))
        .over(frame)
        .cast("double")
        .alias("moving_sum"),
        F.count(F.lit(1)).over(frame).alias("n_window"),
        F.first("o_orderkey").over(order_w).alias("first_order"),
        F.dense_rank().over(order_w).cast("long").alias("dr"),
        F.ntile(4).over(order_w).cast("long").alias("quartile"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "scalar_conditional_funcs",
    oracle="""
    SELECT s_suppkey,
           greatest(s_acctbal, 5000.0) AS hi,
           least(s_acctbal, 5000.0) AS lo,
           CASE WHEN s_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sgn,
           COALESCE(NULLIF(s_name, ''), 'unknown') AS clean_name,
           IF(s_nationkey % 2 = 0, 'even', 'odd') AS parity
    FROM supplier ORDER BY s_suppkey
    """,
)
def scalar_conditional_funcs(spark, sf_dir):
    """COALESCE/IFNULL/NULLIF/IIF/GREATEST/LEAST family
    (reference ``functions/__init__.py:597-606``)."""
    supp = t(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return supp.select(
        "s_suppkey",
        F.greatest(bal, F.lit(5000.0)).alias("hi"),
        F.least(bal, F.lit(5000.0)).alias("lo"),
        F.when(bal < 0, "neg").otherwise("pos").alias("sgn"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias("clean_name"),
        F.when(F.col("s_nationkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
    ).orderBy("s_suppkey")
