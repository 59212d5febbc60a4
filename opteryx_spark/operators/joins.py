"""Temporal join operators Spark lacks natively: as-of join, range join.

The brief's "custom operators" tier: semantics the reference ecosystem
gets from specialized engines (kdb-style asof, interval joins), expressed
as compositions of built-in DataFrame ops — no Python in the row path.

- ``asof_join``: for each left row, the most recent right row at-or-before
  it (optionally per key).  Physical plan: tag both sides, union, one
  shuffle-sort on (key, time), then ``last(..., ignorenulls=True)`` over a
  running window.  This is the distributed merge-join an MPP engine would
  pick: one exchange, no per-key Python, no range explosion — at 100 TB
  the sort amortizes into the exchange Spark already does.

- ``range_bin_join``: point-in-interval join.  Naive Spark executes theta
  joins as BroadcastNestedLoop (quadratic); binning rewrites it as an
  equi-join on ``floor(value / bin_width)`` — intervals explode to the
  bins they overlap, points land in exactly one bin (so no dedup pass),
  and the exact containment predicate refines after the hash join.
  Bin width trades replication (long intervals hit many bins) against
  bucket occupancy; both sides stay executor-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    how: str = "left",
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.on <= left.on``.

    Matches DuckDB's ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on``
    (ties at equal timestamps match).  Right rows should be unique per
    (by, on); if several share a timestamp the last in sort order wins.

    Right's value columns are appended; names colliding with a left
    column get ``suffix``.  The matched right timestamp is exposed as
    ``{on}{suffix}``.  ``how="inner"`` drops unmatched left rows.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left|inner, got {how!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    rcols = [c for c in right.columns if c not in (*keys, on)]
    payload = F.struct(
        F.col(on).alias("__asof_t"), *[F.col(c) for c in rcols]
    )
    # NULL ordering keys never match in ASOF semantics (DuckDB drops
    # them); left in, they sort first (asc = nulls-first) and their
    # payload would pollute every left row's "latest match"
    r = right.filter(F.col(on).isNotNull()).select(
        *keys,
        F.col(on).alias("__asof_ts"),
        payload.alias("__asof_p"),
        F.lit(0).alias("__asof_side"),
    )
    l = (  # noqa: E741
        left.withColumn("__asof_ts", F.col(on))
        .withColumn("__asof_p", F.lit(None).cast(r.schema["__asof_p"].dataType))
        .withColumn("__asof_side", F.lit(1))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp => "<=" match
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        if keys
        else Window.partitionBy(F.lit(1))
    )
    w = w.orderBy(F.col("__asof_ts").asc(), F.col("__asof_side").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    matched = unioned.withColumn("__asof_m", F.last("__asof_p", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__asof_m.__asof_t").alias(f"{on}{suffix}"))
    for c in rcols:
        name = c + suffix if c in left.columns else c
        out_cols.append(F.col(f"__asof_m.{c}").alias(name))
    out = matched.filter(F.col("__asof_side") == 1).select(*out_cols)
    if how == "inner":
        out = out.filter(F.col(f"{on}{suffix}").isNotNull())
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    how: str = "left",
    suffix: str = "_r",
) -> DataFrame:
    """Forward as-of join: EARLIEST right row with ``right.on >= left.on``
    — pandas ``merge_asof(direction='forward')``; completes the as-of
    family next to :func:`asof_join` (backward) and
    :func:`asof_join_nearest`.  The canonical use is next-event lookup:
    each reading joined to the first maintenance/settlement/price tick at
    or after it.

    Same single-shuffle shape as the backward join: union the two sides,
    ONE key-partitioned window ordered by ``on`` DESCENDING (right rows
    first at equal timestamps, so ties match), running ``last`` of the
    right payload — no range join, no per-row probe.  Right rows should
    be unique per (by, on); if several share a timestamp the last in
    sort order wins.  NULL ``on`` keys never match (DuckDB ASOF drops
    them).  ``how="inner"`` drops unmatched left rows.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join_forward supports left|inner, got {how!r}")
    keys = [by] if isinstance(by, str) else list(by or [])
    rcols = [c for c in right.columns if c not in (*keys, on)]
    payload = F.struct(
        F.col(on).alias("__asof_t"), *[F.col(c) for c in rcols]
    )
    r = right.filter(F.col(on).isNotNull()).select(
        *keys,
        F.col(on).alias("__asof_ts"),
        payload.alias("__asof_p"),
        F.lit(0).alias("__asof_side"),
    )
    l = (  # noqa: E741
        left.withColumn("__asof_ts", F.col(on))
        .withColumn("__asof_p", F.lit(None).cast(r.schema["__asof_p"].dataType))
        .withColumn("__asof_side", F.lit(1))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # descending scan: the running `last` payload at a left row is the
    # SMALLEST right timestamp that is still >= it; right-before-left at
    # equal timestamps makes ties match
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        if keys
        else Window.partitionBy(F.lit(1))
    )
    # desc_nulls_first: a left row with a NULL timestamp must precede
    # every right row in the scan, so it sees no payload and never
    # matches (Spark's plain desc puts NULLs last, which would hand it
    # the smallest right timestamp)
    w = w.orderBy(
        F.col("__asof_ts").desc_nulls_first(), F.col("__asof_side").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = unioned.withColumn("__asof_m", F.last("__asof_p", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__asof_m.__asof_t").alias(f"{on}{suffix}"))
    for c in rcols:
        name = c + suffix if c in left.columns else c
        out_cols.append(F.col(f"__asof_m.{c}").alias(name))
    out = matched.filter(F.col("__asof_side") == 1).select(*out_cols)
    if how == "inner":
        out = out.filter(F.col(f"{on}{suffix}").isNotNull())
    return out


_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def _to_ticks(col: Column, dtype: T.DataType) -> Column:
    """Numeric tick space for binning: µs for timestamps, identity else.

    TimestampNTZ ticks are derived in naive-time space (µs since the naive
    epoch) rather than via a cast to TIMESTAMP: the cast interprets naive
    values in the session timezone, which is non-monotonic across DST
    spring-forward gaps, so a point inside an interval could land in a bin
    the interval's bin sequence never covers and be silently dropped.
    """
    if isinstance(dtype, T.TimestampNTZType):
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", epoch, col)
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    return col.cast("double")


def range_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bin_width: float = 3600.0,
    end_inclusive: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval containing it, as an equi-join.

    ``bin_width`` is in seconds when the joined columns are timestamps,
    else in the columns' own units.  Long intervals replicate across
    ``(end-start)/bin_width`` bins — pick a width near the typical
    interval length so replication stays O(1) per interval.
    """
    if how != "inner":
        raise ValueError("range_bin_join supports inner joins")
    keys = [by] if isinstance(by, str) else list(by or [])
    p_dtype = points.schema[point_col].dataType
    width = bin_width * 1_000_000.0 if isinstance(p_dtype, _TS_TYPES) else bin_width

    p = points.withColumn(
        "__bin", F.floor(_to_ticks(F.col(point_col), p_dtype) / F.lit(width))
    )
    s_dtype = intervals.schema[start_col].dataType
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_to_ticks(F.col(start_col), s_dtype) / F.lit(width)),
                F.floor(_to_ticks(F.col(end_col), s_dtype) / F.lit(width)),
            )
        ),
    )
    upper = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    joined = p.join(iv, [*keys, "__bin"]).filter(
        (F.col(point_col) >= F.col(start_col)) & upper
    )
    return joined.drop("__bin")


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    block_len: int = 4,
) -> DataFrame:
    """Entity-resolution similarity join: pairs whose strings are within
    ``max_dist`` Levenshtein edits, generated WITHOUT a cartesian product
    via prefix-OR-suffix blocking (the standard record-linkage blocking
    scheme; Spark has no built-in similarity join).

    Candidates are pairs agreeing on the first ``block_len`` characters
    OR the last ``block_len`` — a single edit at position ``p`` preserves
    the prefix block when ``p >= block_len`` and the suffix block when
    ``p < len - block_len``, so recall is exact for any single edit on
    strings longer than ``2*block_len``; for ``max_dist >= 2`` edits
    clustered at both ends can evade the blocks (documented recall
    trade — raise ``block_len`` overlap or add a middle block for
    stricter guarantees).  NULL strings never match.

    Scale shape: ONE equi shuffle join on side-tagged exploded block
    keys (each row carries its prefix key and its suffix key; the tag
    keeps prefix matching prefix only), then a map-side threshold
    ``levenshtein`` refine + distinct — no nested-loop join at any
    size.  Hot blocks (shared prefixes) are the skew hazard; at corpus
    scale feed a higher-entropy block key (e.g. sorted-trigram sample)
    the same way.

    Returns all left columns + all right columns + ``dist`` (INT).
    Column names must not collide (alias before calling).
    """
    if max_dist < 0 or block_len < 1:
        raise ValueError("max_dist >= 0 and block_len >= 1 required")
    lc, rc = F.col(left_col), F.col(right_col)

    # r11: refine BEFORE the pair dedup, with the threshold form of
    # levenshtein.  The old order ran a corpus-wide distinct over WIDE
    # candidate rows (hot blocks make the candidate stream quadratic in
    # block size) and only then the unbounded O(len²) edit distance; the
    # threshold form short-circuits on length mismatch and runs a banded
    # O(len·max_dist) DP, and filtering first shrinks the distinct to
    # the surviving pairs.  Identical output: the filter is
    # deterministic per row (filter∘distinct == distinct∘filter), and
    # for every surviving pair (dist <= max_dist) the threshold form
    # returns the exact distance — its -1 over-threshold sentinel is
    # excluded explicitly.  Measured 10.4 s -> 4.5 s on the sf0.1
    # entity-resolution entry.
    #
    # r11 wave 4: ONE equi join over side-tagged exploded block keys
    # instead of (prefix join) UNION (suffix join) — each input derives
    # once instead of twice and the candidate stream crosses one shuffle
    # instead of two (same bytes: 2x rows per side vs 2 joins of 1x).
    # The "p"/"s" tag keeps prefix keys matching prefix keys only — an
    # untagged key would add cross prefix==suffix candidates the two-join
    # form never generated (and the oracle pins out).  Candidate multiset
    # is identical (both-blocks-match pairs appear twice, deduped by the
    # same distinct); a NULL string yields NULL concat keys, which the
    # equi join drops exactly as the NULL block column did.
    def _keys(c):
        return F.array(
            F.concat(F.lit("p"), F.substring(c, 1, block_len)),
            F.concat(F.lit("s"), F.substring(c, -block_len, block_len)),
        )

    lb = left.withColumn("_bk", F.explode(_keys(lc)))
    rb = right.withColumn("_bk", F.explode(_keys(rc)))
    refined = (
        lb.join(rb, "_bk")
        .drop("_bk")
        .withColumn("dist", F.levenshtein(lc, rc, int(max_dist)))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    return refined.distinct()


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join (genomics / temporal analytics;
    Spark plans the raw theta join as BroadcastNestedLoop): pairs whose
    half-open ranges ``[start, end)`` intersect, via the binned equi-join
    rewrite on BOTH sides.

    Each interval explodes to the bins it covers and candidates meet on
    the bin key; the duplicate problem (an overlapping pair shares every
    bin their intersection covers) is solved WITHOUT a distinct: a pair
    is emitted only from the bin containing ``greatest(start_l,
    start_r)`` — the first bin of the intersection, which is unique per
    pair.  One equi shuffle join, a map-side refine, no dedup pass.

    NULL or empty/negative intervals never match.  ``bin_width`` trades
    interval replication (long intervals hit many bins) against bucket
    occupancy, as :func:`range_bin_join`.  Returns all left + all right
    columns (alias before calling to avoid collisions).
    """
    if bin_width < 1:
        raise ValueError("bin_width must be >= 1")

    def bins(s: str, e: str):
        valid = (
            F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(e) > F.col(s))
        )
        lo = F.expr(f"{s} div {bin_width}")
        # half-open end: an interval ending exactly on a bin boundary
        # does not occupy that bin
        hi = F.expr(f"({e} - 1) div {bin_width}")
        return F.when(valid, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<long>")
        )

    lb = left.withColumn("_bin", F.explode(bins(left_start, left_end)))
    rb = right.withColumn("_bin", F.explode(bins(right_start, right_end)))
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    first_bin = F.expr(
        f"greatest({left_start}, {right_start}) div {bin_width}"
    )
    return (
        lb.join(rb, "_bin")
        .filter(overlap & (F.col("_bin") == first_bin))
        .drop("_bin")
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    comparisons: list[tuple[str, float, float]],
    threshold_millinats: int,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (JASA 1969)
    over a candidate-pair frame: each comparison field contributes its
    log-likelihood-ratio weight — ``ln(m/u)`` on agreement,
    ``ln((1−m)/(1−u))`` on disagreement, 0 when the comparison is NULL
    (the standard missing-field convention) — and pairs at or above the
    threshold classify as matches.

    ``comparisons`` is ``[(agree_col, m, u), ...]`` where ``agree_col``
    is a BOOLEAN column already on ``pairs`` (build agreements with
    whatever similarity the field needs — equality, levenshtein bound,
    bucket match) and m/u are the field's agreement probabilities among
    true matches / non-matches (from labeled data or EM).  Weights are
    quantized driver-side to integer MILLINATS, so the score is an exact
    BIGINT sum — engine- and partition-independent (the module's
    fixed-point determinism contract).

    Scale shape: pure map-side arithmetic over the candidate frame —
    blocking (``blocked_fuzzy_join``) already bounded the pair count;
    scoring adds zero exchanges.

    Appends ``score_millinats`` (BIGINT) and ``is_match`` (BOOLEAN).
    """
    import math

    if not comparisons:
        raise ValueError("comparisons must be non-empty")
    score = F.lit(0).cast("long")
    for agree_col, m, u in comparisons:
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"m and u must be in (0,1): {agree_col}")
        wa = int(math.floor(math.log(m / u) * 1000 + 0.5))
        wd = int(math.floor(math.log((1.0 - m) / (1.0 - u)) * 1000 + 0.5))
        score = score + F.when(F.col(agree_col), F.lit(wa)).when(
            ~F.col(agree_col), F.lit(wd)
        ).otherwise(F.lit(0)).cast("long")
    return pairs.withColumn("score_millinats", score).withColumn(
        "is_match", F.col("score_millinats") >= F.lit(int(threshold_millinats))
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_t: str,
    right_t: str,
    tolerance: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Nearest-neighbor as-of join: each left row matches the right row
    (same keys) whose timestamp is CLOSEST within ``± tolerance`` —
    pandas ``merge_asof(direction='nearest')`` semantics, which the
    backward-only :func:`asof_join` cannot express (sensor alignment,
    trade-to-quote matching where the nearest quote on either side is
    the right one).

    Deterministic total preference order per left row:
    ``(|Δt|, direction, right id)`` — exact ties prefer the BACKWARD
    candidate (direction 0), then the lowest right id.  Implemented as
    a band equi-join (the :func:`range_bin_join` strategy: each left
    row probes time bands band−1..band+1, which provably covers
    ``± tolerance``) + one ``min(struct)`` keeper aggregate — no
    windowed sort over the union, no nested loop, both sides hashed on
    (keys, band) at any scale.

    NULL keys/timestamps never match (equi-join semantics).  Left rows
    with no candidate in range are kept with NULL match columns (left
    outer behavior).

    Returns the left columns plus ``matched_{right_id}``,
    ``matched_{right_t}``, ``match_delta`` (signed: right − left) and
    ``match_direction`` ('backward' / 'forward' / NULL).
    """
    if tolerance < 1:
        raise ValueError("tolerance must be >= 1")
    lt = F.col(left_t).cast("bigint")
    rt = F.col(right_t).cast("bigint")
    band = (lt / F.lit(int(tolerance))).cast("bigint")
    rband = (rt / F.lit(int(tolerance))).cast("bigint")
    probes = left.select(
        *on,
        F.col(left_id).alias("_lid"),
        lt.alias("_lt"),
        F.explode(F.array(band - 1, band, band + 1)).alias("_band"),
    ).filter(F.col("_lt").isNotNull())
    builds = right.select(
        *on,
        F.col(right_id).alias("_rid"),
        rt.alias("_rt"),
        rband.alias("_band"),
    ).filter(F.col("_rt").isNotNull())
    cand = probes.join(builds, [*on, "_band"]).filter(
        F.abs(F.col("_rt") - F.col("_lt")) <= F.lit(int(tolerance))
    )
    keeper = cand.groupBy(*on, "_lid", "_lt").agg(
        F.min(
            F.struct(
                F.abs(F.col("_rt") - F.col("_lt")).alias("_d"),
                F.when(F.col("_rt") <= F.col("_lt"), 0).otherwise(1).alias("_dir"),
                F.col("_rid").alias("_rid"),
                F.col("_rt").alias("_rt"),
            )
        ).alias("_k")
    )
    matched = keeper.select(
        *on,
        F.col("_lid").alias(left_id),
        F.col("_lt").alias(left_t),
        F.col("_k._rid").alias(f"matched_{right_id}"),
        F.col("_k._rt").alias(f"matched_{right_t}"),
        (F.col("_k._rt") - F.col("_lt")).cast("bigint").alias("match_delta"),
        F.when(F.col("_k._dir") == 0, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("match_direction"),
    )
    base = left.select(*on, F.col(left_id), lt.alias(left_t))
    return base.join(
        matched.select(
            left_id,
            f"matched_{right_id}",
            f"matched_{right_t}",
            "match_delta",
            "match_direction",
        ),
        left_id,
        "left",
    )
