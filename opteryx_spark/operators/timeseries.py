"""Time-series diagnostics over keyed regular series: autocorrelation,
cross-correlation, CUSUM change-point detection, and the seasonal-naive
forecasting baseline.

Large telemetry pipelines watch per-key daily/hourly series (event
counts, error rates, revenue) for questions the existing events
operators don't answer: *is this series self-correlated* (seasonality /
momentum — the ACF at small lags), *does one metric lead another* (the
CCF at signed lags), *where did its level shift* (CUSUM), and *what
would the no-model baseline forecast be* (seasonal-naive).  All are
implemented as exact-integer formulations so a DuckDB oracle reproduces
them bit-for-bit (the suite determinism rules in ``suite/__init__``):

- ACF uses the Pearson-on-lag-pairs form.  All six sufficient
  statistics (n, Σx, Σy, Σxx, Σyy, Σxy) are BIGINT-exact over integer
  series values; the final correlation is ONE fixed float expression
  over those exact integers — bit-identical in any IEEE-754 engine.
- CUSUM avoids the non-integer mean entirely: the statistic is scaled
  by n (``T_i = n·prefix_i − i·total``), keeping every intermediate a
  BIGINT.  argmax |T| with an earliest-timestamp tie-break is a
  ``min(struct(...))`` keeper — map-side combinable, no rank window.

Scale shape: both operators are one ``groupBy`` over the key columns
(ACF adds one per-key equi self-join for the lag alignment); nothing is
ever moved to a single partition, and no driver collects happen.

Reference parity note: the reference engine has no time-series
operators — this is beyond-reference surface in the same charter as
``operators/events.py`` (which owns the series *construction*:
rollups, gap fill, seasonal decomposition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def autocorrelation(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Per-key autocorrelation of an integer-valued regular series at
    lags ``1..max_lag``.

    ``series`` holds one row per (key, t) with an integer time index
    ``t_col`` (e.g. a day number) and an integer ``value_col``.  For
    each lag k the series is aligned with itself shifted by k — an
    equi self-join on ``key AND t+k = t`` (gaps in t simply produce
    fewer pairs; densify with events.gap_fill first if gaps should
    count as zeros) — and the Pearson correlation of the (x, y) pairs
    is computed from BIGINT-exact sufficient statistics:

        acf = (n·Σxy − Σx·Σy) / sqrt(double(n·Σxx − Σx²) · double(n·Σyy − Σy²))

    A constant window (zero variance on either side) yields NULL.

    Scale shape: the lag explode multiplies the series by ``max_lag``
    (small), the self-join and the aggregate both hash on the key
    columns — co-partitioned, no global window, no collect.

    Returns key cols + ``lag`` (BIGINT), ``n_pairs`` (BIGINT), ``acf``
    (DOUBLE, NULL when degenerate), one row per key per lag with at
    least one pair.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    # NULL values are excluded up front: n_pairs counts rows while the six
    # sums skip NULLs, so a NULL value admitted into a pair would silently
    # skew the correlation (ADVICE r7).  NULL time indexes already align
    # with nothing (NULL never equals _t + lag).
    series = series.filter(F.col(value_col).isNotNull())
    lags = F.array(*[F.lit(k).cast("bigint") for k in range(1, max_lag + 1)])
    a = series.select(
        *key_cols,
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(value_col).cast("bigint").alias("_x"),
    ).withColumn("lag", F.explode(lags))
    b = series.select(
        *key_cols,
        F.col(t_col).cast("bigint").alias("_tb"),
        F.col(value_col).cast("bigint").alias("_y"),
    )
    pairs = a.join(b, [*key_cols], "inner").filter(
        F.col("_tb") == F.col("_t") + F.col("lag")
    )
    agg = pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("n_pairs")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    acf = F.when(
        (dx > 0) & (dy > 0),
        num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
    )
    return agg.select(*key_cols, "lag", "n_pairs", acf.alias("acf"))


def cusum_changepoint(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key CUSUM change-point: the time index where the cumulative
    deviation from the series mean peaks.

    The textbook statistic ``S_i = Σ_{t≤i}(x_t − x̄)`` involves the
    non-integer mean; scaling by n keeps everything BIGINT-exact:

        T_i = n·prefix_i − i·total        (≡ n·S_i)

    where ``prefix_i`` is the running sum and ``i`` the 1-based rank in
    time order.  The change point is the i maximizing ``|T_i|`` (the
    most likely level-shift boundary); ties break to the EARLIEST time
    index so the result is deterministic.

    Rows with a NULL time index are EXCLUDED: a point without a
    position has no place in a cumulative-in-time statistic (and NULL
    sort placement differs across engines — NULLS FIRST in Spark ASC,
    NULLS LAST in DuckDB — so admitting them would also make the
    result engine-dependent).

    Scale shape: one running-sum window PARTITIONED BY the key columns
    (never a global window) feeding one ``min(struct)`` keeper
    aggregate — map-side combinable, no rank-then-filter second window.

    Returns key cols + ``n_points``, ``total`` (Σx), ``cp_t`` (the time
    index at the peak), ``cusum_peak_abs`` (max |T_i|, BIGINT).  Keys
    with a single point report their only t with peak 0.
    """
    from pyspark.sql.window import Window

    # NULL t: no position in time (see docstring).  NULL value: n_points
    # counts the row while Σx skips it, skewing T_i (ADVICE r7) — both
    # are excluded so every counted point contributes to every statistic.
    series = series.filter(
        F.col(t_col).isNotNull() & F.col(value_col).isNotNull()
    )
    w_order = Window.partitionBy(*key_cols).orderBy(t_col)
    w_sum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = F.col(value_col).cast("bigint")
    pre = series.select(
        *key_cols,
        F.col(t_col).cast("bigint").alias("_t"),
        F.sum(x).over(w_sum).alias("_prefix"),
        F.row_number().over(w_order).cast("bigint").alias("_i"),
    )
    totals = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_points"), F.sum(x).alias("total")
    )
    t_stat = (
        F.col("n_points") * F.col("_prefix") - F.col("_i") * F.col("total")
    )
    scored = pre.join(totals, [*key_cols]).select(
        *key_cols,
        "n_points",
        "total",
        F.abs(t_stat).alias("_abs_t"),
        F.col("_t"),
    )
    # argmax |T| with earliest-t tie-break == min over (-|T|, t): one
    # map-side-combinable keeper aggregate, no rank window
    keeper = scored.groupBy(*key_cols, "n_points", "total").agg(
        F.min(F.struct((-F.col("_abs_t")).alias("_neg"), F.col("_t"))).alias("_k")
    )
    return keeper.select(
        *key_cols,
        "n_points",
        "total",
        F.col("_k._t").alias("cp_t"),
        (-F.col("_k._neg")).alias("cusum_peak_abs"),
    )


def seasonal_naive_forecast(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    season: int = 7,
    horizon: int | None = None,
) -> DataFrame:
    """Seasonal-naive forecast — the baseline every forecasting system
    must beat (and the M-competition yardstick): the forecast for step
    h ahead is the observation one season back at the same phase,
    ``ŷ(T+h) = y(T+h−season)`` for ``h ≤ season``.

    Per key, the anchor T is the max time index; the last season of
    observations is re-dated forward by one season.  A key whose series
    is shorter than its last season simply emits fewer forecast rows
    (no imputation — honesty over coverage).  Composes with
    ``events.gap_fill_series`` (densify first so every phase exists)
    and ``events.seasonal_residuals`` (which measures exactly the error
    this baseline leaves behind).

    One groupBy for the anchors + one key-partitioned join — no global
    window, integer-exact output.

    Returns key cols + ``h`` (1-based steps ahead, BIGINT), ``for_t``
    (= T + h), ``forecast`` (the lagged value, original type).
    """
    if season < 1:
        raise ValueError("season must be >= 1")
    hor = season if horizon is None else int(horizon)
    if not 1 <= hor <= season:
        raise ValueError("horizon must be in 1..season")
    anchors = series.groupBy(*key_cols).agg(F.max(F.col(t_col).cast("bigint")).alias("_t_anchor"))
    s = series.select(
        *key_cols,
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(value_col).alias("_v"),
    )
    out = (
        s.join(anchors, [*key_cols])
        .withColumn("h", F.col("_t") + F.lit(int(season)) - F.col("_t_anchor"))
        .filter((F.col("h") >= 1) & (F.col("h") <= F.lit(hor)))
    )
    return out.select(
        *key_cols,
        "h",
        (F.col("_t_anchor") + F.col("h")).alias("for_t"),
        F.col("_v").alias("forecast"),
    )


def ols_trend(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares linear trend of an integer regular
    series — the "is this metric growing, and how fast" screen that
    complements :func:`cusum_changepoint` (level shift) and
    :func:`autocorrelation` (seasonality).

    The five sufficient statistics (n, Σt, Σy, Σtt, Σty) are BIGINT-exact
    over integer time indexes and values; slope and intercept are each
    ONE fixed closed-form float expression over those exact integers —
    bit-identical in any IEEE-754 engine (the suite determinism rule):

        slope     = (n·Σty − Σt·Σy) / (n·Σtt − Σt²)
        intercept = (Σy·Σtt − Σt·Σty) / (n·Σtt − Σt²)

    Degenerate keys (n < 2 or zero time variance) yield NULL for both.
    NULL time indexes and NULL values are excluded up front (same
    contract and reasons as :func:`cusum_changepoint`).

    Scale shape: ONE groupBy over the key columns — no window, no join,
    no collect.

    Returns key cols + ``n_points`` (BIGINT), ``slope``, ``intercept``
    (DOUBLE, NULL when degenerate).
    """
    series = series.filter(
        F.col(t_col).isNotNull() & F.col(value_col).isNotNull()
    )
    tt = F.col(t_col).cast("bigint")
    y = F.col(value_col).cast("bigint")
    agg = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(tt).alias("_st"),
        F.sum(y).alias("_sy"),
        F.sum(tt * tt).alias("_stt"),
        F.sum(tt * y).alias("_sty"),
    )
    n = F.col("n_points")
    den = n * F.col("_stt") - F.col("_st") * F.col("_st")
    slope = F.when(
        den > 0,
        (n * F.col("_sty") - F.col("_st") * F.col("_sy")).cast("double")
        / den.cast("double"),
    )
    intercept = F.when(
        den > 0,
        (F.col("_sy") * F.col("_stt") - F.col("_st") * F.col("_sty")).cast("double")
        / den.cast("double"),
    )
    return agg.select(
        *key_cols, "n_points", slope.alias("slope"), intercept.alias("intercept")
    )


def cross_correlation(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Per-key cross-correlation between two integer regular series at
    signed lags ``−max_lag..+max_lag`` — the lead/lag discovery tool
    (e.g. "does the click series lead the purchase series by two
    days?"): a positive-lag peak means ``a`` leads ``b`` by that many
    steps.  :func:`autocorrelation` is the special case ``a is b``
    restricted to positive lags.

    For each lag k, pairs are ``(a(t), b(t+k))`` aligned by an equi
    self-join on key and shifted time; correlation comes from the same
    six BIGINT-exact sufficient statistics and single fixed float
    expression as :func:`autocorrelation` (bit-identical cross-engine).
    Rows with NULL time index participate in no alignment.  Degenerate
    (zero-variance) windows → NULL.

    Scale shape: one lag explode (2·max_lag+1, small) + one key-hashed
    equi join + one aggregate — no global window, no collect.

    Returns key cols + ``lag`` (BIGINT, signed), ``n_pairs``, ``ccf``
    (DOUBLE), one row per key per lag with at least one pair.
    """
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")
    # NULL values excluded on both sides for the same reason as
    # :func:`autocorrelation` (n_pairs vs NULL-skipping sums, ADVICE r7)
    a = a.filter(F.col(value_col).isNotNull())
    b = b.filter(F.col(value_col).isNotNull())
    lags = F.array(
        *[F.lit(k).cast("bigint") for k in range(-max_lag, max_lag + 1)]
    )
    sa = a.select(
        *key_cols,
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(value_col).cast("bigint").alias("_x"),
    ).withColumn("lag", F.explode(lags))
    sb = b.select(
        *key_cols,
        F.col(t_col).cast("bigint").alias("_tb"),
        F.col(value_col).cast("bigint").alias("_y"),
    )
    pairs = sa.join(sb, [*key_cols], "inner").filter(
        F.col("_tb") == F.col("_t") + F.col("lag")
    )
    agg = pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("n_pairs")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    ccf = F.when(
        (dx > 0) & (dy > 0),
        num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
    )
    return agg.select(*key_cols, "lag", "n_pairs", ccf.alias("ccf"))


def rolling_median_detrend(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    half_window: int = 3,
) -> DataFrame:
    """Per-key rolling-median detrend: each point's trend level is the
    exact median of the ``2·half_window + 1`` surrounding observations
    (ROWS frame, so gaps in t widen the time span rather than shrink
    the sample — document or densify first), and the residual is what
    anomaly screens should look at once level and slow trend are
    removed.  The median (not mean) version survives outliers in the
    window — the robust counterpart of ``events.seasonal_residuals``.

    Exact interpolated percentile over a moving ROWS frame (Spark
    ``percentile`` == DuckDB ``quantile_cont``, the pinned
    equivalence); the residual is one fixed float subtraction.  NULL
    time indexes and NULL values are excluded up front (the module's
    standard contract — NULL order keys place differently across
    engines).

    One key-partitioned window — no joins, no collect.

    Returns key cols + ``t_col`` (BIGINT), ``value_col`` (BIGINT),
    ``rolling_med`` (DOUBLE), ``residual`` (DOUBLE).
    """
    from pyspark.sql.window import Window

    if half_window < 1:
        raise ValueError("half_window must be >= 1")
    series = series.filter(
        F.col(t_col).isNotNull() & F.col(value_col).isNotNull()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(t_col)
        .rowsBetween(-half_window, half_window)
    )
    med = F.expr(f"percentile({value_col}, 0.5)").over(w)
    return series.select(
        *key_cols,
        F.col(t_col).cast("bigint").alias(t_col),
        F.col(value_col).cast("bigint").alias(value_col),
        med.alias("rolling_med"),
        (F.col(value_col).cast("double") - med).alias("residual"),
    )


def holt_linear(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    qscale: int = 1000,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing per key, in exact
    integer arithmetic with alpha = beta = 1/2 (Holt 1957; the
    double-exponential baseline one step up from :func:`~opteryx_spark.
    operators.events` EWMA, which has no trend term).  The halving
    weights are the point: ``x/2`` on a BIGINT is exact truncating
    arithmetic both engines replay bit-for-bit, where a general float
    alpha would accumulate rounding skew across engines.

    Recurrence over the time-ordered series (values pre-scaled by
    ``qscale``): ``l_0 = q*y_0``, ``b_0 = 0``, then

        ``l_t = (q*y_t + l_{t-1} + b_{t-1}) div 2``
        ``b_t = ((l_t - l_{t-1}) + b_{t-1}) div 2``

    where ``div`` truncates toward zero (trend terms go negative; Spark
    ``div`` and DuckDB ``//`` agree on truncation).  Implemented as one
    ``collect_list`` + ``array_sort`` + ``F.aggregate`` left fold per
    key — the recurrence is inherently sequential IN t, but every key
    folds independently, so the shape is one groupBy and the per-key
    cost is the series length (a daily series is ~365·years rows even
    at 100 TB of raw events; the fold state is two BIGINTs).  Truncating
    halving uses ``shiftright(x - x % 2, 1)``: the adjusted numerator is
    even, so the arithmetic shift is an exact /2 for either sign at full
    int64 range (no float detour).

    NULL time indexes and NULL values are excluded up front (module
    contract).  Returns key cols + ``n_points`` (BIGINT), ``level_q``,
    ``trend_q``, ``forecast_next_q`` (BIGINT, ``qscale``-scaled; the
    one-step-ahead forecast is ``level + trend``).
    """
    if qscale < 1:
        raise ValueError("qscale must be >= 1")
    s = series.filter(F.col(t_col).isNotNull() & F.col(value_col).isNotNull())
    q = F.lit(int(qscale)).cast("long")
    pts = s.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(t_col).cast("bigint").alias("t"),
                    (F.col(value_col).cast("bigint") * q).alias("qy"),
                )
            )
        ).alias("_pts")
    )

    def _half(x):  # truncating x div 2, exact at full int64 range
        return F.shiftright(x - (x % F.lit(2)), 1)

    def _step(acc, p):
        lv = _half(p["qy"] + acc["l"] + acc["b"])
        return F.struct(
            lv.alias("l"), _half((lv - acc["l"]) + acc["b"]).alias("b")
        )

    first = F.element_at(F.col("_pts"), 1)
    rest = F.slice(F.col("_pts"), 2, F.greatest(F.size("_pts") - 1, F.lit(0)))
    init = F.struct(first["qy"].alias("l"), F.lit(0).cast("long").alias("b"))
    # bind the fold to a named column first: sibling Project expressions
    # do not share subexpressions, so extracting l/b/l+b straight from
    # the aggregate expression re-ran the whole per-key fold three times
    folded = F.col("_hl_fold")
    return pts.select(
        *key_cols, "_pts", F.aggregate(rest, init, _step).alias("_hl_fold")
    ).select(
        *key_cols,
        F.size("_pts").cast("bigint").alias("n_points"),
        folded["l"].alias("level_q"),
        folded["b"].alias("trend_q"),
        (folded["l"] + folded["b"]).alias("forecast_next_q"),
    )


def holt_winters(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    period: int = 7,
    qscale: int = 1000,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing; Winters
    1960) per key in exact integer arithmetic with alpha = beta =
    gamma = 1/2 — :func:`holt_linear` plus the seasonal component, the
    classical operational forecaster for weekday-periodic pipeline
    metrics (ingest volume, event counts) where Holt alone chases the
    cycle and :func:`weekday_anova` says a cycle exists.  Halving
    weights keep every update an exact truncating BIGINT op both
    engines replay bit-for-bit (the holt_linear determinism contract).

    Recurrence over the time-ordered series (values pre-scaled by
    ``qscale``; ``m = period``; ``s`` a ring of the last ``m`` seasonal
    estimates, oldest first, initialized to zero; ``div`` truncates)::

        l_t = (q*y_t - s_head + l_{t-1} + b_{t-1}) div 2
        b_t = ((l_t - l_{t-1}) + b_{t-1}) div 2
        s_t = ((q*y_t - l_t) + s_head) div 2      (appended; head popped)

    with ``l_0 = q*y_0``, ``b_0 = 0``.  After the fold the ring head is
    the seasonal the NEXT point consumes, so the one-step forecast is
    ``l + b + s_head``.  Shape: identical to :func:`holt_linear` — ONE
    groupBy, a ``collect_list`` + ``array_sort`` + ``F.aggregate`` left
    fold per key; the fold state is two BIGINTs plus an m-length BIGINT
    ring (m = 7 for weekday data).  The series must be CONTIGUOUS in
    ``t`` (one row per period tick) for the phase alignment to mean
    anything — gap-fill upstream (``events.gap_fill``) if not.

    NULL times/values are excluded (module contract).  Returns key cols
    + ``n_points``, ``level_q``, ``trend_q``, ``season_next_q``,
    ``forecast_next_q`` (BIGINT, ``qscale``-scaled).
    """
    if qscale < 1:
        raise ValueError("qscale must be >= 1")
    if period < 2:
        raise ValueError("period must be >= 2")
    s = series.filter(F.col(t_col).isNotNull() & F.col(value_col).isNotNull())
    q = F.lit(int(qscale)).cast("long")
    m = int(period)
    pts = s.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(t_col).cast("bigint").alias("t"),
                    (F.col(value_col).cast("bigint") * q).alias("qy"),
                )
            )
        ).alias("_pts")
    )

    def _half(x):  # truncating x div 2, exact at full int64 range
        return F.shiftright(x - (x % F.lit(2)), 1)

    zeros = F.array_repeat(F.lit(0).cast("long"), m)

    def _step(acc, p):
        s_old = F.element_at(acc["s"], 1)
        lv = _half(p["qy"] - s_old + acc["l"] + acc["b"])
        bv = _half((lv - acc["l"]) + acc["b"])
        sv = _half((p["qy"] - lv) + s_old)
        ring = F.concat(F.slice(acc["s"], 2, m - 1), F.array(sv))
        return F.struct(lv.alias("l"), bv.alias("b"), ring.alias("s"))

    first = F.element_at(F.col("_pts"), 1)
    rest = F.slice(F.col("_pts"), 2, F.greatest(F.size("_pts") - 1, F.lit(0)))
    # point 0 with l = qy_0 and an all-zero ring: s_new = ((qy - l) + 0)
    # div 2 = 0, so the post-point-0 ring is still all zeros — the
    # explicit init below IS the state after processing the first point
    init = F.struct(
        first["qy"].alias("l"), F.lit(0).cast("long").alias("b"), zeros.alias("s")
    )
    # bind the fold to a named column first (the holt_linear rationale):
    # the six field extractions below would each re-run the whole fold
    folded = F.col("_hw_fold")
    return pts.select(
        *key_cols, "_pts", F.aggregate(rest, init, _step).alias("_hw_fold")
    ).select(
        *key_cols,
        F.size("_pts").cast("bigint").alias("n_points"),
        folded["l"].alias("level_q"),
        folded["b"].alias("trend_q"),
        F.element_at(folded["s"], 1).alias("season_next_q"),
        (folded["l"] + folded["b"] + F.element_at(folded["s"], 1)).alias(
            "forecast_next_q"
        ),
    )


def weekday_anova(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Seasonal-strength screen by one-way ANOVA over the phase groups
    of a periodic index (day-of-week by default): how much of a per-key
    series' variance is explained by its position in the cycle —
    eta² = SS_between / SS_total — BEFORE fitting any seasonal model.
    The decision stat for "does this metric need weekday adjustment";
    complements :func:`autocorrelation` (which sees the periodicity but
    not its explained-variance share).

    Exact-integer formulation: with integer values, n-scaled sums of
    squares are BIGINT-exact and cross-engine —

        ``SS_total·n  = n·Σy² − (Σy)²``
        ``SS_between·n = n·Σ_g (S_g² div n_g) − (Σy)²``  (S_g = phase-g sum)

    (the phase term uses a truncating div per group — documented; both
    engines replay it identically; ``SSB_n`` is floored at 0 because
    that truncation can push it a hair negative when the true
    between-group variance is ~0) and ``eta2_ppm = SSB_n·1e6 div
    SST_n`` with a ``SST_n = 0 → NULL`` guard (constant series have no
    variance to explain).  Phase = ``t mod period`` on the integer time
    index.  NULL times/values are excluded (module contract).

    ONE (key, phase) groupBy + ONE key groupBy, map-side combinable —
    no windows, no joins.

    Returns key cols + ``n_points``, ``n_phases``, ``ssb_n``, ``sst_n``,
    ``eta2_ppm`` (BIGINT; NULL when the series is constant).
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    s = series.filter(F.col(t_col).isNotNull() & F.col(value_col).isNotNull()).select(
        *key_cols,
        (F.col(t_col).cast("bigint") % F.lit(int(period))).alias("_ph"),
        F.col(value_col).cast("bigint").alias("_y"),
    )
    per_phase = s.groupBy(*key_cols, "_ph").agg(
        F.count(F.lit(1)).alias("_ng"),
        F.sum("_y").alias("_sg"),
        F.sum(F.col("_y") * F.col("_y")).alias("_sqg"),
    )
    agg = per_phase.groupBy(*key_cols).agg(
        F.sum("_ng").alias("_n"),
        F.count(F.lit(1)).alias("n_phases"),
        F.sum("_sg").alias("_s"),
        F.sum("_sqg").alias("_sq"),
        F.sum(F.expr("(_sg * _sg) div _ng")).alias("_sb"),
    )
    return agg.select(
        *key_cols,
        F.col("_n").cast("bigint").alias("n_points"),
        F.col("n_phases").cast("bigint").alias("n_phases"),
        # floor at 0 (removal_effect_ppm convention): the truncating
        # per-phase div in _sb can push the n-scaled SS_between a hair
        # negative when the true between-group variance is ~0, and an
        # explained-variance share must never read negative
        F.greatest(
            F.col("_n") * F.col("_sb") - F.col("_s") * F.col("_s"), F.lit(0)
        ).alias("ssb_n"),
        (F.col("_n") * F.col("_sq") - F.col("_s") * F.col("_s")).alias("sst_n"),
        F.when(
            F.col("_n") * F.col("_sq") - F.col("_s") * F.col("_s") > 0,
            F.expr(
                "(greatest(_n * _sb - _s * _s, 0) * 1000000)"
                " div (_n * _sq - _s * _s)"
            ),
        ).alias("eta2_ppm"),
    )


def classical_decompose(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    period: int = 7,
    half_window: int = 3,
    qscale: int = 1000,
) -> DataFrame:
    """Classical additive decomposition per key — trend + seasonal +
    residual, the textbook pre-model split (the one STL refines), in
    exact integer arithmetic:

    - ``trend_q``: centered moving average over ±``half_window`` rows as
      ``SUM·qscale div COUNT`` (frame-count division handles the series
      edges; truncating div, cross-engine);
    - ``seasonal_q``: per-(key, phase) mean of the detrended values
      (``phase = t mod period``), again ``SUM div COUNT`` truncating —
      negatives truncate toward zero identically in both engines;
    - ``resid_q = y·qscale − trend_q − seasonal_q`` — the anomaly
      input, now free of both level and cycle.

    Two exchanges total: one key-partitioned ROWS window, one
    (key, phase)-partitioned window — no joins, no collects, nothing
    global.  NULL times/values are excluded (module contract).  Note
    the seasonal means are NOT re-centered to sum to zero (classical
    decomposition's optional final touch) — that would add a third
    pass for a constant offset already visible in ``seasonal_q``.

    Returns key cols + ``t_col``, ``value_col`` (BIGINT), ``trend_q``,
    ``seasonal_q``, ``resid_q`` (BIGINT, ``qscale`` units).
    """
    if period < 2 or half_window < 1 or qscale < 1:
        raise ValueError("period, half_window, qscale out of range")
    if not key_cols:
        raise ValueError("key_cols must be non-empty (a global window cannot scale)")
    s = series.filter(F.col(t_col).isNotNull() & F.col(value_col).isNotNull()).select(
        *key_cols,
        F.col(t_col).cast("bigint").alias(t_col),
        F.col(value_col).cast("bigint").alias("_y"),
    )
    q = F.lit(int(qscale)).cast("long")
    with_trend = s.select(
        *key_cols,
        t_col,
        "_y",
        F.expr(
            f"(sum(_y) OVER (PARTITION BY {', '.join(key_cols)} ORDER BY {t_col} "
            f"ROWS BETWEEN {half_window} PRECEDING AND {half_window} FOLLOWING) "
            f"* {int(qscale)}) div "
            f"count(1) OVER (PARTITION BY {', '.join(key_cols)} ORDER BY {t_col} "
            f"ROWS BETWEEN {half_window} PRECEDING AND {half_window} FOLLOWING)"
        ).alias("trend_q"),
    )
    detr = with_trend.select(
        *key_cols,
        t_col,
        "_y",
        "trend_q",
        (F.col("_y") * q - F.col("trend_q")).alias("_detr"),
        (F.col(t_col) % F.lit(int(period))).alias("_ph"),
    )
    seasonal = F.expr("sum(_detr) OVER (PARTITION BY {}, _ph) div count(1) OVER (PARTITION BY {}, _ph)".format(
        ", ".join(key_cols), ", ".join(key_cols)
    ))
    return detr.select(
        *key_cols,
        t_col,
        F.col("_y").alias(value_col),
        "trend_q",
        seasonal.alias("seasonal_q"),
        (F.col("_detr") - seasonal).alias("resid_q"),
    )


def seasonal_strength(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    period: int = 7,
    half_window: int = 3,
    qscale: int = 1000,
) -> DataFrame:
    """Seasonal and trend STRENGTH per key (Hyndman & Athanasopoulos
    FPP; the ``stl_features`` screen): how much variance the seasonal
    and trend components of :func:`classical_decompose` actually explain
    —

        ``F_seasonal = max(0, 1 - Var(resid) / Var(seasonal + resid))``
        ``F_trend    = max(0, 1 - Var(resid) / Var(trend + resid))``

    in truncating ppm.  This is the routing stat between the modeling
    operators: strong season → :func:`holt_winters` / seasonal
    adjustment, strong trend → :func:`holt_linear`, neither → model the
    raw series (complements :func:`weekday_anova`, which tests ONE
    candidate period's phase means; strength measures the fitted
    components themselves).

    Exactness: each component is first DE-SCALED by ``qscale``
    (truncating div — sub-unit precision is noise for a variance-share
    stat), then the three n-scaled variances are exact BIGINTs
    (``Var_n(x) = n·Σx² − (Σx)²``) and each strength is ONE truncating
    division.  int64 bound: |value|·sqrt(n)·1000 must stay below ~3e9
    (a daily series needs per-day magnitudes beyond ~1e7 over decades
    to overflow).  Shape: the decompose windows plus ONE per-key
    aggregate, map-side combinable.

    Returns key cols + ``n_points``, ``var_resid_n``, ``var_seas_n``,
    ``var_trend_n`` (BIGINT), ``seasonal_strength_ppm``,
    ``trend_strength_ppm`` (BIGINT; NULL when the denominator variance
    is 0 — a constant component has no share to explain).
    """
    comp = classical_decompose(
        series, key_cols, t_col, value_col,
        period=period, half_window=half_window, qscale=qscale,
    )
    q = int(qscale)
    de = comp.select(
        *key_cols,
        F.expr(f"resid_q div {q}").alias("_r"),
        F.expr(f"(seasonal_q + resid_q) div {q}").alias("_sr"),
        F.expr(f"(trend_q + resid_q) div {q}").alias("_tr"),
    )
    agg = de.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_r").alias("_s_r"),
        F.sum(F.col("_r") * F.col("_r")).alias("_ss_r"),
        F.sum("_sr").alias("_s_sr"),
        F.sum(F.col("_sr") * F.col("_sr")).alias("_ss_sr"),
        F.sum("_tr").alias("_s_tr"),
        F.sum(F.col("_tr") * F.col("_tr")).alias("_ss_tr"),
    )
    vr = F.col("_n") * F.col("_ss_r") - F.col("_s_r") * F.col("_s_r")
    vs = F.col("_n") * F.col("_ss_sr") - F.col("_s_sr") * F.col("_s_sr")
    vt = F.col("_n") * F.col("_ss_tr") - F.col("_s_tr") * F.col("_s_tr")
    return agg.select(
        *key_cols,
        F.col("_n").cast("bigint").alias("n_points"),
        vr.alias("var_resid_n"),
        vs.alias("var_seas_n"),
        vt.alias("var_trend_n"),
        F.when(
            vs > 0,
            F.greatest(
                F.lit(0).cast("bigint"),
                F.lit(1_000_000).cast("bigint")
                - F.expr(
                    "((_n * _ss_r - _s_r * _s_r) * 1000000)"
                    " div (_n * _ss_sr - _s_sr * _s_sr)"
                ),
            ),
        ).alias("seasonal_strength_ppm"),
        F.when(
            vt > 0,
            F.greatest(
                F.lit(0).cast("bigint"),
                F.lit(1_000_000).cast("bigint")
                - F.expr(
                    "((_n * _ss_r - _s_r * _s_r) * 1000000)"
                    " div (_n * _ss_tr - _s_tr * _s_tr)"
                ),
            ),
        ).alias("trend_strength_ppm"),
    )
