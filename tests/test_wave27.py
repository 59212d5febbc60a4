"""Unit tests for the wave-27 operators: time-series ACF/CUSUM, graph
k-core, and snapshot drift.  Edge cases the suite oracles don't reach:
degenerate (constant / single-point) series, k-core fixpoint mode vs
fixed-round mode, empty-side drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.quality import snapshot_drift
from opteryx_spark.operators.timeseries import autocorrelation, cusum_changepoint
from opteryx_spark.operators.web import kcore


# --- autocorrelation ------------------------------------------------------------


def test_acf_perfect_positive(spark):
    # strictly increasing series: every lag-k alignment is perfectly
    # correlated (both windows are affine in t) => acf == 1.0 exactly
    rows = [("a", t, 10 + 3 * t) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = autocorrelation(df, ["k"], "t", "x", max_lag=2).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_pairs"] == 10 - r["lag"]
        assert r["acf"] == pytest.approx(1.0)


def test_acf_alternating_negative(spark):
    # period-2 alternation: lag 1 perfectly anti-correlated, lag 2 perfect
    rows = [("a", t, 5 if t % 2 == 0 else 1) for t in range(8)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = {r["lag"]: r["acf"] for r in autocorrelation(df, ["k"], "t", "x", 2).collect()}
    assert out[1] == pytest.approx(-1.0)
    assert out[2] == pytest.approx(1.0)


def test_acf_constant_series_null(spark):
    # zero variance on both sides => NULL, not a division error
    df = spark.createDataFrame([("a", t, 7) for t in range(6)], ["k", "t", "x"])
    out = autocorrelation(df, ["k"], "t", "x", 1).collect()
    assert len(out) == 1 and out[0]["acf"] is None


def test_acf_gap_reduces_pairs(spark):
    # missing t=2: lag-1 alignment loses the (1,2) and (2,3) pairs
    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, 2), ("a", 3, 4), ("a", 4, 5)], ["k", "t", "x"]
    )
    out = autocorrelation(df, ["k"], "t", "x", 1).collect()
    assert out[0]["n_pairs"] == 2


def test_acf_rejects_bad_lag(spark):
    df = spark.createDataFrame([("a", 0, 1)], ["k", "t", "x"])
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "t", "x", max_lag=0)


# --- CUSUM ----------------------------------------------------------------------


def test_cusum_finds_level_shift(spark):
    # 5 days at 10 then 5 days at 50: |T| peaks exactly at the boundary
    rows = [("a", t, 10) for t in range(5)] + [("a", t, 50) for t in range(5, 10)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    r = cusum_changepoint(df, ["k"], "t", "x").collect()[0]
    assert r["cp_t"] == 4  # last point of the low regime
    assert r["n_points"] == 10 and r["total"] == 300
    # T_5 = n*prefix - i*total = 10*50 - 5*300 = -1000
    assert r["cusum_peak_abs"] == 1000


def test_cusum_constant_series_ties_to_earliest(spark):
    # constant series: T_i == 0 everywhere; earliest t wins the tie
    df = spark.createDataFrame([("a", t, 3) for t in range(4)], ["k", "t", "x"])
    r = cusum_changepoint(df, ["k"], "t", "x").collect()[0]
    assert r["cp_t"] == 0 and r["cusum_peak_abs"] == 0


def test_cusum_single_point(spark):
    df = spark.createDataFrame([("a", 9, 42)], ["k", "t", "x"])
    r = cusum_changepoint(df, ["k"], "t", "x").collect()[0]
    assert r["cp_t"] == 9 and r["n_points"] == 1 and r["cusum_peak_abs"] == 0


def test_cusum_per_key_independent(spark):
    rows = [("a", t, 1 if t < 3 else 9) for t in range(6)] + [
        ("b", t, 9 if t < 3 else 1) for t in range(6)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = {r["k"]: r for r in cusum_changepoint(df, ["k"], "t", "x").collect()}
    assert out["a"]["cp_t"] == 2 and out["b"]["cp_t"] == 2
    assert out["a"]["cusum_peak_abs"] == out["b"]["cusum_peak_abs"]


# --- k-core ---------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), ["src", "dst"])


def test_kcore_triangle_plus_tail(spark):
    # triangle {1,2,3} is the 2-core; the 3-4-5 tail peels away
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    got = {r["node"]: r["core_degree"] for r in kcore(e, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_peel(spark):
    # removing the tail drops node 3 below degree 3 => cascades: chain
    # 3-4, 4-5 peels first, then 3 loses its 3rd edge and peels too
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4), (4, 5)])
    got = {r["node"]: r["core_degree"] for r in kcore(e, k=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_result(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    assert kcore(e, k=2).count() == 0


def test_kcore_fixed_rounds_matches_fixpoint(spark):
    # max_rounds beyond the true fixpoint depth == fixpoint mode
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)])
    fix = sorted(map(tuple, kcore(e, k=2).collect()))
    capped = sorted(map(tuple, kcore(e, k=2, max_rounds=8).collect()))
    assert fix == capped


def test_kcore_canonicalizes_direction_and_loops(spark):
    # duplicate reversed edges and self-loops must not inflate degrees
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1)])
    got = {r["node"]: r["core_degree"] for r in kcore(e, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        kcore(_edges(spark, [(1, 2)]), k=0)


# --- snapshot drift -------------------------------------------------------------


def test_snapshot_drift_counts(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None), (4, "y")], ["id", "s"]
    )
    b = spark.createDataFrame([(5, None), (6, None)], "id: bigint, s: string")
    out = {r["col_name"]: r for r in snapshot_drift(a, b, ["id", "s"]).collect()}
    assert out["id"]["rows_a"] == 4 and out["id"]["rows_b"] == 2
    assert out["s"]["nulls_a"] == 1 and out["s"]["nulls_b"] == 2
    assert out["s"]["distinct_a"] == 2 and out["s"]["distinct_b"] == 0
    # null rate 25% -> 100%: delta == 750000 ppm
    assert out["s"]["null_delta_ppm"] == 750_000
    assert out["id"]["null_delta_ppm"] == 0


def test_snapshot_drift_empty_side(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "s"])
    b = a.filter(F.lit(False))
    out = {r["col_name"]: r for r in snapshot_drift(a, b, ["s"]).collect()}
    assert out["s"]["rows_b"] == 0 and out["s"]["null_delta_ppm"] == 0


def test_snapshot_drift_rejects_empty_columns(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        snapshot_drift(df, df, [])


# --- wave 28: categorical drift / backtest folds / seasonal-naive ---------------

from opteryx_spark.operators.quality import categorical_drift
from opteryx_spark.operators.scale import backtest_folds
from opteryx_spark.operators.timeseries import seasonal_naive_forecast

_MIN_US = 60_000_000


def test_categorical_drift_null_stratum(spark):
    a = spark.createDataFrame([("x",), ("x",), ("y",), (None,)], "c: string")
    b = spark.createDataFrame([("x",), (None,), (None,), (None,)], "c: string")
    out = {r["category"]: r for r in categorical_drift(a, b, "c").collect()}
    # NULL is a real stratum: 25% -> 75%
    assert out[None]["n_a"] == 1 and out[None]["n_b"] == 3
    assert out[None]["share_a_ppm"] == 250_000 and out[None]["share_b_ppm"] == 750_000
    assert out[None]["abs_delta_ppm"] == 500_000
    # category absent from one side counts 0 there
    assert out["y"]["n_b"] == 0 and out["y"]["share_b_ppm"] == 0


def test_categorical_drift_empty_side(spark):
    a = spark.createDataFrame([("x",)], "c: string")
    b = a.filter("c = 'nope'")
    out = {r["category"]: r for r in categorical_drift(a, b, "c").collect()}
    assert out["x"]["share_b_ppm"] == 0 and out["x"]["abs_delta_ppm"] == 1_000_000


def _ts_df(spark, rows):
    return spark.createDataFrame(
        [(i, f"2024-01-{d:02d} 12:00:00") for i, d in rows], "id: bigint, ts: string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_backtest_folds_roles(spark):
    # cut at Jan 10 00:00 UTC; embargo 1 day; horizon 2 days
    cut = 1_704_844_800_000_000
    df = _ts_df(spark, [(1, 5), (2, 10), (3, 11), (4, 12), (5, 20)])
    out = backtest_folds(df, "ts", [cut], horizon_minutes=2 * 1440, embargo_minutes=1440)
    got = {(r["id"], r["fold"]): r["role"] for r in out.collect()}
    assert got[(1, 0)] == "train"       # before cut
    assert (2, 0) not in got            # embargo day (Jan 10) excluded
    assert got[(3, 0)] == "test" and got[(4, 0)] == "test"
    assert (5, 0) not in got            # beyond horizon


def test_backtest_folds_multi_fold_membership(spark):
    # a row before both cuts trains in both folds
    cuts = [1_704_844_800_000_000, 1_705_276_800_000_000]  # Jan 10, Jan 15
    df = _ts_df(spark, [(1, 5)])
    out = backtest_folds(df, "ts", cuts, horizon_minutes=1440)
    assert sorted(r["fold"] for r in out.collect()) == [0, 1]


def test_backtest_folds_validation(spark):
    df = _ts_df(spark, [(1, 5)])
    with pytest.raises(ValueError):
        backtest_folds(df, "ts", [], horizon_minutes=60)
    with pytest.raises(ValueError):
        backtest_folds(df, "ts", [0], horizon_minutes=0)


def test_snaive_forecast_shifts_last_season(spark):
    rows = [("a", t, 100 + t) for t in range(10)]  # t = 0..9, anchor T=9
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = {r["h"]: r for r in seasonal_naive_forecast(df, ["k"], "t", "x", season=3).collect()}
    # last season: t in {7,8,9} -> h = t+3-9 in {1,2,3}; forecast = y(t)
    assert set(out) == {1, 2, 3}
    assert out[1]["forecast"] == 107 and out[1]["for_t"] == 10
    assert out[3]["forecast"] == 109 and out[3]["for_t"] == 12


def test_snaive_forecast_short_series(spark):
    # series shorter than one season: emits only what exists, no imputation
    df = spark.createDataFrame([("a", 0, 5), ("a", 1, 6)], ["k", "t", "x"])
    out = seasonal_naive_forecast(df, ["k"], "t", "x", season=7).collect()
    assert len(out) == 2
    assert {r["forecast"] for r in out} == {5, 6}


def test_snaive_forecast_validation(spark):
    df = spark.createDataFrame([("a", 0, 5)], ["k", "t", "x"])
    with pytest.raises(ValueError):
        seasonal_naive_forecast(df, ["k"], "t", "x", season=0)
    with pytest.raises(ValueError):
        seasonal_naive_forecast(df, ["k"], "t", "x", season=7, horizon=8)


# --- plan-shape assertions (the 100 TB properties of the new operators) ---------

from opteryx_spark.operators.scale import explain_shuffle_count
from opteryx_spark.plans import explain_text


def test_backtest_folds_is_map_only(spark):
    # fold assignment itself must not shuffle: literal-array explode + filter
    df = _ts_df(spark, [(i, 1 + i % 20) for i in range(50)])
    out = backtest_folds(df, "ts", [1_704_844_800_000_000], horizon_minutes=1440)
    assert explain_shuffle_count(out) == 0


def test_acf_no_global_window_or_cartesian(spark):
    df = spark.createDataFrame(
        [("k%d" % (i % 3), i // 3, i) for i in range(30)], ["k", "t", "x"]
    )
    text = explain_text(autocorrelation(df, ["k"], "t", "x", 3))
    assert "CartesianProduct" not in text
    assert "Window" not in text  # ACF is join+agg, never a window


def test_cusum_window_is_key_partitioned(spark):
    df = spark.createDataFrame(
        [("k%d" % (i % 3), i // 3, i) for i in range(30)], ["k", "t", "x"]
    )
    text = explain_text(cusum_changepoint(df, ["k"], "t", "x"))
    assert "CartesianProduct" not in text
    # the running-sum window must carry the key partition spec, and the
    # keeper must be an aggregate (min(struct)), not a second window
    assert "partial_min" in text


def test_categorical_drift_no_cartesian_fact_join(spark):
    a = spark.createDataFrame([("x",)] * 10, "c: string")
    b = spark.createDataFrame([("y",)] * 10, "c: string")
    text = explain_text(categorical_drift(a, b, "c"))
    # the only nested-loop joins are the two single-row total broadcasts
    # (formatted explain prints each node twice: tree line + detail
    # section — count detail sections, one per physical node)
    assert "CartesianProduct" not in text
    assert text.count("Join type: Cross") <= 2


def test_cusum_excludes_null_time_index(spark):
    # a point with NULL t has no series position — excluded by contract
    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 10), ("a", None, 999), ("a", 2, 50)],
        "k: string, t: bigint, x: bigint",
    )
    r = cusum_changepoint(df, ["k"], "t", "x").collect()[0]
    assert r["n_points"] == 3 and r["total"] == 70


# --- core numbers (h-index iteration) -------------------------------------------

from opteryx_spark.operators.web import core_numbers


def test_core_numbers_triangle_plus_tail(spark):
    # triangle = 2-core; tail nodes peel at k=1 => core number 1
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    got = {r["node"]: r["core_number"] for r in core_numbers(e).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


def test_core_numbers_clique_is_uniform(spark):
    # K4: every node has core number 3
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {r["node"]: r["core_number"] for r in core_numbers(_edges(spark, pairs)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_core_numbers_fixed_rounds_matches_fixpoint(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4), (4, 5), (5, 6)])
    fix = sorted(map(tuple, core_numbers(e).collect()))
    capped = sorted(map(tuple, core_numbers(e, max_rounds=10).collect()))
    assert fix == capped


def test_core_numbers_consistent_with_kcore(spark):
    # nodes with core_number >= k are EXACTLY the k-core membership
    pairs = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4), (4, 5), (5, 6), (6, 4)]
    e = _edges(spark, pairs)
    cores = {r["node"] for r in core_numbers(e).collect() if r["core_number"] >= 2}
    members = {r["node"] for r in kcore(e, k=2).collect()}
    assert cores == members


# --- ranked-retrieval evaluation ------------------------------------------------

from opteryx_spark.operators.retrieval import rank_metrics

_W1, _W2, _W3 = 1_000_000, 630_930, 500_000  # floor(1e6/log2(r+1)+0.5)


def test_rank_metrics_hand_computed(spark):
    results = spark.createDataFrame(
        [("q", "A", 1), ("q", "B", 2), ("q", "C", 3)],
        "query_id: string, doc_id: string, rank: bigint",
    )
    qrels = spark.createDataFrame(
        [("q", "B", 2), ("q", "C", 1), ("q", "D", 3)],  # D relevant, not retrieved
        "query_id: string, doc_id: string, rel: bigint",
    )
    r = rank_metrics(results, qrels, k=3).collect()[0]
    assert r["n_retrieved"] == 3 and r["n_relevant"] == 3
    assert r["rr_ppm"] == 500_000  # first hit at rank 2
    dcg = 2 * _W2 + 1 * _W3
    idcg = 3 * _W1 + 2 * _W2 + 1 * _W3  # ideal: D(3), B(2), C(1)
    assert r["dcg_micro"] == dcg and r["idcg_micro"] == idcg
    assert r["ndcg_ppm"] == (dcg * 1_000_000) // idcg


def test_rank_metrics_no_hits(spark):
    results = spark.createDataFrame(
        [("q", "A", 1)], "query_id: string, doc_id: string, rank: bigint"
    )
    qrels = spark.createDataFrame(
        [("q", "Z", 0)], "query_id: string, doc_id: string, rel: bigint"
    )
    r = rank_metrics(results, qrels, k=3).collect()[0]
    assert r["rr_ppm"] == 0 and r["dcg_micro"] == 0
    assert r["idcg_micro"] == 0 and r["ndcg_ppm"] == 0 and r["n_relevant"] == 0


def test_rank_metrics_perfect_ranking(spark):
    results = spark.createDataFrame(
        [("q", "A", 1), ("q", "B", 2)],
        "query_id: string, doc_id: string, rank: bigint",
    )
    qrels = spark.createDataFrame(
        [("q", "A", 3), ("q", "B", 1)],
        "query_id: string, doc_id: string, rel: bigint",
    )
    r = rank_metrics(results, qrels, k=2).collect()[0]
    assert r["rr_ppm"] == 1_000_000
    assert r["dcg_micro"] == r["idcg_micro"]
    assert r["ndcg_ppm"] == 1_000_000


def test_rank_metrics_rejects_bad_k(spark):
    df = spark.createDataFrame([("q", "A", 1)], "query_id: string, doc_id: string, rank: bigint")
    with pytest.raises(ValueError):
        rank_metrics(df, df.select("query_id", "doc_id", F.lit(1).alias("rel")), k=0)


# --- character entropy ----------------------------------------------------------

from opteryx_spark.operators.text import char_entropy, ln_micro_table


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aabb"), (2, "aaaa"), (3, None), (4, ""), (5, "abcd")],
        "doc_id: bigint, text: string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[1]["char_entropy_micronats"] == 693147  # ln 2
    assert out[2]["char_entropy_micronats"] == 0  # constant string
    assert out[3]["char_entropy_micronats"] is None  # NULL text
    assert out[4]["char_entropy_micronats"] is None  # empty text
    # uniform over 4 chars: ln 4 (integer identity is exact here)
    assert out[5]["char_entropy_micronats"] == 1386294
    assert out[5]["n_distinct_chars"] == 4


def test_char_entropy_prefix_cap(spark):
    # only the first prefix_len chars participate
    df = spark.createDataFrame([(1, "aab")], "doc_id: bigint, text: string")
    r = char_entropy(df, prefix_len=2).collect()[0]
    assert r["n_chars_used"] == 2 and r["char_entropy_micronats"] == 0


def test_ln_micro_table_anchors(spark):
    t = ln_micro_table(8)
    assert t[0] == 0 and t[1] == 693147 and t[7] == 2079442  # ln1, ln2, ln8


def test_char_entropy_rejects_bad_prefix(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id: bigint, text: string")
    with pytest.raises(ValueError):
        char_entropy(df, prefix_len=0)


# --- cross-correlation ----------------------------------------------------------

from opteryx_spark.operators.timeseries import cross_correlation


def test_ccf_detects_lead(spark):
    # b is a shifted copy of a (b(t) = a(t-2)): perfect corr at lag -2,
    # i.e. pairing a(t) with b(t-2)... sign convention: pairs are
    # (a(t), b(t+lag)), so b(t+lag) == a(t) when lag == +2
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    a = spark.createDataFrame([("g", t, v) for t, v in enumerate(xs)], ["g", "t", "x"])
    b = spark.createDataFrame(
        [("g", t + 2, v) for t, v in enumerate(xs)], ["g", "t", "x"]
    )
    out = {r["lag"]: r for r in cross_correlation(a, b, ["g"], "t", "x", 3).collect()}
    assert out[2]["ccf"] == pytest.approx(1.0)
    assert out[2]["n_pairs"] == len(xs)


def test_ccf_lag_zero_is_pearson(spark):
    a = spark.createDataFrame([("g", t, t) for t in range(6)], ["g", "t", "x"])
    b = spark.createDataFrame([("g", t, 10 - t) for t in range(6)], ["g", "t", "x"])
    out = {r["lag"]: r["ccf"] for r in cross_correlation(a, b, ["g"], "t", "x", 0).collect()}
    assert set(out) == {0} and out[0] == pytest.approx(-1.0)


def test_ccf_rejects_negative_max_lag(spark):
    df = spark.createDataFrame([("g", 0, 1)], ["g", "t", "x"])
    with pytest.raises(ValueError):
        cross_correlation(df, df, ["g"], "t", "x", -1)


# --- best snippets ---------------------------------------------------------------

from opteryx_spark.operators.retrieval import best_snippets


def test_best_snippets_picks_densest_window(spark):
    # matches at tokens 2 and 4 fit one 3-token window starting at 2;
    # the lone match at 9 does not beat it
    text = "a cat b cat c d e f g cat"
    df = spark.createDataFrame([(1, text)], "doc_id: bigint, text: string")
    r = best_snippets(df, ["cat"], window_tokens=3).collect()[0]
    assert r["snippet_start"] == 2 and r["n_matched"] == 2
    assert r["snippet"] == "cat b cat"


def test_best_snippets_tie_breaks_earliest(spark):
    df = spark.createDataFrame(
        [(1, "x cat y z cat w")], "doc_id: bigint, text: string"
    )
    r = best_snippets(df, ["cat"], window_tokens=2).collect()[0]
    assert r["snippet_start"] == 2 and r["n_matched"] == 1


def test_best_snippets_no_match_absent(spark):
    df = spark.createDataFrame([(1, "nothing here")], "doc_id: bigint, text: string")
    assert best_snippets(df, ["cat"]).count() == 0


def test_best_snippets_clips_at_end(spark):
    df = spark.createDataFrame([(1, "a b cat")], "doc_id: bigint, text: string")
    r = best_snippets(df, ["cat"], window_tokens=5).collect()[0]
    assert r["snippet"] == "cat"  # slice clipped at array end


def test_best_snippets_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id: bigint, text: string")
    with pytest.raises(ValueError):
        best_snippets(df, [])
    with pytest.raises(ValueError):
        best_snippets(df, ["x"], window_tokens=0)
