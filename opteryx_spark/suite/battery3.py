"""Third battery: remaining scalar-function catalog coverage (§2.8).

DATEPART/EXTRACT, unix-time conversions, string completions (CONCAT_WS,
SPLIT, POSITION, RPAD, REPEAT, ENDS_WITH, ASCII/CHR), numeric completions
(SIGN, TRUNC, LOG2/LOG10, PI/E).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.suite import register
from opteryx_spark.suite._util import t


@register(
    "datetime_extract_unix",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
           CAST(EXTRACT(month FROM ts) AS BIGINT) AS mo,
           CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
           CAST(EXTRACT(minute FROM ts) AS BIGINT) AS mi,
           CAST(EXTRACT(second FROM ts) AS BIGINT) AS s,
           CAST(floor(date_part('epoch', ts)) AS BIGINT) AS epoch_s,
           CAST(to_timestamp(CAST(floor(date_part('epoch', ts)) AS BIGINT)) AS TIMESTAMP) AS from_epoch,
           strftime(ts, '%Y-%m-%d %H:%M') AS formatted
    FROM events WHERE event_id < 200 ORDER BY event_id
    """,
)
def datetime_extract_unix(spark, sf_dir):
    """EXTRACT/DATEPART + FROM_UNIXTIME/UNIXTIME + DATE_FORMAT
    (reference ``functions/date_functions.py:58-247``)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    ts = F.col("ts")
    epoch = F.unix_timestamp(ts)
    return ev.select(
        "event_id",
        F.year(ts).cast("long").alias("y"),
        F.month(ts).cast("long").alias("mo"),
        F.dayofmonth(ts).cast("long").alias("d"),
        F.hour(ts).cast("long").alias("h"),
        F.minute(ts).cast("long").alias("mi"),
        F.second(ts).cast("long").alias("s"),
        epoch.alias("epoch_s"),
        F.timestamp_seconds(epoch).alias("from_epoch"),
        F.date_format(ts, "yyyy-MM-dd HH:mm").alias("formatted"),
    ).orderBy("event_id")


@register(
    "string_funcs_2",
    oracle="""
    SELECT n_name,
           concat_ws('|', n_name, CAST(n_nationkey AS VARCHAR), 'x') AS joined,
           array_to_string(string_split(n_name, 'A'), '/') AS parts,
           CAST(position('A' IN n_name) AS BIGINT) AS a_pos,
           rpad(n_name, 20, '.') AS rpadded,
           rtrim(concat(n_name, '   ')) AS rtrimmed,
           ltrim(concat('   ', n_name)) AS ltrimmed,
           repeat('ab', 3) AS repeated,
           ends_with(n_name, 'IA') AS ends_ia,
           CAST(ascii(n_name) AS BIGINT) AS first_code,
           chr(65 + n_nationkey % 26) AS letter,
           left(n_name, 4) AS l4,
           right(n_name, 3) AS r3
    FROM nation ORDER BY n_name
    """,
)
def string_funcs_2(spark, sf_dir):
    nation = t(spark, sf_dir, "nation")
    n = F.col("n_name")
    return nation.select(
        n,
        F.concat_ws("|", n, F.col("n_nationkey").cast("string"), F.lit("x")).alias("joined"),
        # serialized: the driver's canonicalizer can't sort/hash array cells
        F.array_join(F.split(n, "A", -1), "/").alias("parts"),
        F.instr(n, "A").cast("long").alias("a_pos"),
        F.rpad(n, 20, ".").alias("rpadded"),
        F.rtrim(F.concat(n, F.lit("   "))).alias("rtrimmed"),
        F.ltrim(F.concat(F.lit("   "), n)).alias("ltrimmed"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        n.endswith("IA").alias("ends_ia"),
        F.ascii(n).cast("long").alias("first_code"),
        F.chr(F.lit(65) + F.col("n_nationkey") % 26).alias("letter"),
        F.substring(n, 1, 4).alias("l4"),
        n.substr(F.length(n) - 2, F.lit(3)).alias("r3"),
    ).orderBy("n_name")


@register(
    "numeric_funcs_2",
    oracle="""
    SELECT p_partkey,
           CAST(sign(p_retailprice - 1500.0) AS DOUBLE) AS sgn,
           trunc(p_retailprice) AS truncd,
           round(log2(p_retailprice), 6) AS lg2,
           round(log10(p_retailprice), 6) AS lg10,
           round(pi(), 6) AS pi_c,
           round(exp(1.0), 6) AS e_c,
           CAST(p_size % 4 AS BIGINT) AS sz_mod,
           CAST(p_size // 4 AS BIGINT) AS sz_div,
           CAST(greatest(p_size, 25) AS BIGINT) AS sz_hi
    FROM part WHERE p_partkey <= 500 ORDER BY p_partkey
    """,
)
def numeric_funcs_2(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    price = F.col("p_retailprice")
    sz = F.col("p_size")
    return part.select(
        "p_partkey",
        F.signum(price - 1500.0).alias("sgn"),
        # trunc toward zero on positive values == floor
        F.floor(price).cast("double").alias("truncd"),
        F.round(F.log2(price), 6).alias("lg2"),
        F.round(F.log10(price), 6).alias("lg10"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_c"),
        F.round(F.exp(F.lit(1.0)), 6).alias("e_c"),
        (sz % 4).cast("long").alias("sz_mod"),
        F.floor(sz / 4).cast("long").alias("sz_div"),
        F.greatest(sz, F.lit(25)).cast("long").alias("sz_hi"),
    ).orderBy("p_partkey")


@register(
    "window_range_percent",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_sum,
           percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS pr,
           cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS cd
    FROM orders WHERE o_custkey <= 40
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_range_percent(spark, sf_dir):
    """RANGE frames + percent_rank/cume_dist (exact-ratio arithmetic, so
    bit-deterministic across engines)."""
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 40)
    by_key = Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100, 0)
    by_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,8)"))
        .over(by_key)
        .cast("double")
        .alias("nearby_sum"),
        F.percent_rank().over(by_price).alias("pr"),
        F.cume_dist().over(by_price).alias("cd"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "tvf_values_clause",
    oracle="""
    SELECT v.region_id, r.r_name, v.tag
    FROM (VALUES (0, 'alpha'), (2, 'beta'), (4, 'gamma')) v(region_id, tag)
    JOIN region r ON r.r_regionkey = v.region_id
    ORDER BY v.region_id
    """,
)
def tvf_values_clause(spark, sf_dir):
    """Inline VALUES relation (reference FunctionDatasetNode VALUES)."""
    region = t(spark, sf_dir, "region")
    region.createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT v.region_id, r.r_name, v.tag
        FROM VALUES (0, 'alpha'), (2, 'beta'), (4, 'gamma') AS v(region_id, tag)
        JOIN region r ON r.r_regionkey = v.region_id
        ORDER BY v.region_id
        """
    )


@register("agg_approx_sketches", oracle=None)  # sketch-based: rows-only check
def agg_approx_sketches(spark, sf_dir):
    """Approximate aggregates — the 100 TB path for distinct counts and
    percentiles (HLL / KLL sketches, mergeable, constant memory).  Exact
    twins are oracled in agg_count_distinct / agg_median_percentile; the
    unit test bounds the approximation error against them."""
    li = t(spark, sf_dir, "lineitem")
    # r11: percentile_approx in a SEPARATE aggregation joined back — with
    # countDistinct in the same agg, RewriteDistinctAggregates routes the
    # non-distinct percentile buffer through the per-(group, partkey)
    # first-level aggregate, i.e. one quantile sketch per distinct key
    # (measured 15 s; each aggregate alone is 0.3 s).  Two scans + a
    # 3-row broadcast join; the same rows feed the sketch, so values are
    # equal within the sketch's error bound (QuantileSummaries results
    # depend on partial-merge structure — NOT guaranteed bit-identical
    # to the combined plan; the unit test bounds the error, ADVICE r11).
    counts = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    pct = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5).alias("approx_median_qty")
    )
    return counts.join(F.broadcast(pct), "l_returnflag").orderBy("l_returnflag")
