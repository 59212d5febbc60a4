"""Unit tests for the wave-30 operators: OLS trend, degree
assortativity, clustering coefficients, FD audit, MAD outliers,
interval coverage, activity streaks, and exact mode.  Edge cases the
suite oracles don't reach: degenerate series, known-value graphs,
tie-breaks, NULL contracts, touching/nested intervals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.events import activity_streaks, interval_coverage
from opteryx_spark.operators.profile import mode_by_group
from opteryx_spark.operators.quality import fd_check, mad_outliers
from opteryx_spark.operators.timeseries import ols_trend
from opteryx_spark.operators.web import clustering_coefficients, degree_assortativity


# --- OLS trend ------------------------------------------------------------------


def test_ols_exact_line(spark):
    # y = 3t + 7 exactly => slope 3, intercept 7, no residual
    rows = [("a", t, 3 * t + 7) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    r = ols_trend(df, ["k"], "t", "x").collect()[0]
    assert r["n_points"] == 10
    assert r["slope"] == pytest.approx(3.0)
    assert r["intercept"] == pytest.approx(7.0)


def test_ols_flat_series(spark):
    rows = [("a", t, 42) for t in range(5)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    r = ols_trend(df, ["k"], "t", "x").collect()[0]
    assert r["slope"] == pytest.approx(0.0)
    assert r["intercept"] == pytest.approx(42.0)


def test_ols_degenerate_single_point(spark):
    df = spark.createDataFrame([("a", 5, 9)], ["k", "t", "x"])
    r = ols_trend(df, ["k"], "t", "x").collect()[0]
    assert r["slope"] is None and r["intercept"] is None


def test_ols_null_values_excluded(spark):
    # a NULL value row must not count toward n_points or skew the fit
    rows = [("a", 0, 7), ("a", 1, 10), ("a", 2, None), ("a", 3, 16)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    r = ols_trend(df, ["k"], "t", "x").collect()[0]
    assert r["n_points"] == 3
    assert r["slope"] == pytest.approx(3.0)


# --- degree assortativity -------------------------------------------------------


def test_assortativity_star_negative(spark):
    # star graph: hub(deg n) links only to leaves(deg 1) => strongly
    # disassortative; for K1,n the coefficient is exactly -1
    rows = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    r = degree_assortativity(df).collect()[0]
    assert r["n_edges"] == 5
    assert r["assortativity"] == pytest.approx(-1.0)


def test_assortativity_regular_null(spark):
    # 4-cycle: every node degree 2, zero degree variance => NULL
    rows = [(0, 1), (1, 2), (2, 3), (3, 0)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    r = degree_assortativity(df).collect()[0]
    assert r["n_edges"] == 4
    assert r["assortativity"] is None


def test_assortativity_canonicalizes(spark):
    # duplicate + reversed + self-loop edges collapse to the same K1,5
    rows = [(0, 1), (1, 0), (0, 1), (2, 2), (0, 2), (0, 3), (0, 4), (0, 5)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    r = degree_assortativity(df).collect()[0]
    assert r["n_edges"] == 5
    assert r["assortativity"] == pytest.approx(-1.0)


# --- clustering coefficients ----------------------------------------------------


def test_clustering_k4_all_one(spark):
    # K4: every node is on C(3,2)=3 neighbor pairs, all connected => 1.0
    rows = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert len(out) == 4
    for r in out.values():
        assert r["degree"] == 3
        assert r["n_triangles"] == 3
        assert r["coeff_ppm"] == 1_000_000


def test_clustering_path_and_triangle(spark):
    # triangle 0-1-2 plus pendant 3 attached to 2
    rows = [(0, 1), (1, 2), (0, 2), (2, 3)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert out[0]["coeff_ppm"] == 1_000_000  # deg 2, 1 triangle
    assert out[2]["degree"] == 3 and out[2]["n_triangles"] == 1
    assert out[2]["coeff_ppm"] == 2_000_000 // 6  # 1 of 3 pairs closed
    assert out[3]["degree"] == 1 and out[3]["coeff_ppm"] is None
    assert out[3]["n_triangles"] == 0


# --- FD audit -------------------------------------------------------------------


def test_fd_holds_and_violates(spark):
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "z")]
    df = spark.createDataFrame(rows, ["id", "det", "dep"])
    ok = fd_check(df, ["id"], "dep").collect()[0]
    assert ok["passed"] and ok["n_groups"] == 4 and ok["max_variants"] == 1
    bad = fd_check(df, ["det"], "dep").collect()[0]
    assert not bad["passed"]
    assert bad["n_groups"] == 2 and bad["n_violating"] == 1
    assert bad["max_variants"] == 2


def test_fd_null_contract(spark):
    # NULL determinant rows excluded; NULL dependent not a variant
    rows = [(None, "p"), ("k", "p"), ("k", None)]
    df = spark.createDataFrame(rows, "det string, dep string")
    r = fd_check(df, ["det"], "dep").collect()[0]
    assert r["n_groups"] == 1 and r["passed"]


# --- MAD outliers ---------------------------------------------------------------


def test_mad_flags_only_the_spike(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["k", "x"])
    r = mad_outliers(df, ["k"], "x", k_tenths=30).collect()[0]
    assert r["n"] == 6
    assert r["median"] == pytest.approx(12.5)
    assert r["n_outliers"] == 1


def test_mad_zero_mad_degenerate(spark):
    # over half the values at the median => MAD 0; only different
    # values flag (|x - med| > 0)
    vals = [5.0, 5.0, 5.0, 5.0, 9.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["k", "x"])
    r = mad_outliers(df, ["k"], "x", k_tenths=30).collect()[0]
    assert r["mad"] == pytest.approx(0.0)
    assert r["n_outliers"] == 1


def test_mad_null_group_is_real(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("g", 3.0)], "k string, x double"
    )
    out = mad_outliers(df, ["k"], "x").collect()
    assert len(out) == 2
    assert {r["k"] for r in out} == {None, "g"}


# --- interval coverage ----------------------------------------------------------


def test_coverage_merges_overlaps(spark):
    # [0,10) + [5,15) merge; [20,30) separate; covered 15+10, span 30
    rows = [("u", 0, 10), ("u", 5, 15), ("u", 20, 30)]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    r = interval_coverage(df, ["k"], "s", "e").collect()[0]
    assert r["n_intervals"] == 3 and r["n_islands"] == 2
    assert r["covered"] == 25 and r["span"] == 30


def test_coverage_touching_extends(spark):
    # half-open [0,10) + [10,20): touching => ONE island, covered 20
    rows = [("u", 0, 10), ("u", 10, 20)]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    r = interval_coverage(df, ["k"], "s", "e").collect()[0]
    assert r["n_islands"] == 1 and r["covered"] == 20


def test_coverage_nested_interval(spark):
    # [0,100) contains [10,20): one island, covered 100
    rows = [("u", 0, 100), ("u", 10, 20)]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    r = interval_coverage(df, ["k"], "s", "e").collect()[0]
    assert r["n_islands"] == 1 and r["covered"] == 100 and r["span"] == 100


def test_coverage_null_bounds_excluded(spark):
    rows = [("u", 0, 10), ("u", None, 50), ("u", 60, None)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = interval_coverage(df, ["k"], "s", "e").collect()[0]
    assert r["n_intervals"] == 1 and r["covered"] == 10


# --- activity streaks -----------------------------------------------------------


def test_streaks_basic(spark):
    # days 1,2,3 then 7,8 => longest 3, active 5, streaks 2
    rows = [("u", d) for d in [1, 2, 3, 7, 8]]
    df = spark.createDataFrame(rows, ["u", "d"])
    r = activity_streaks(df, "u", "d").collect()[0]
    assert r["active_days"] == 5
    assert r["longest_streak"] == 3
    assert r["n_streaks"] == 2


def test_streaks_duplicate_days_collapse(spark):
    rows = [("u", 1), ("u", 1), ("u", 2), ("u", 2)]
    df = spark.createDataFrame(rows, ["u", "d"])
    r = activity_streaks(df, "u", "d").collect()[0]
    assert r["active_days"] == 2 and r["longest_streak"] == 2


def test_streaks_null_user_excluded(spark):
    df = spark.createDataFrame([(None, 1), ("u", 1)], "u string, d long")
    out = activity_streaks(df, "u", "d").collect()
    assert len(out) == 1 and out[0]["u"] == "u"


# --- exact mode -----------------------------------------------------------------


def test_mode_tiebreak_lowest_value(spark):
    # counts tie 2-2 => mode is the LOWER value
    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = mode_by_group(df, ["k"], "v").collect()[0]
    assert r["mode"] == "a" and r["mode_count"] == 2 and r["n_distinct"] == 3


def test_mode_nulls_not_candidates(spark):
    rows = [("g", None), ("g", None), ("g", None), ("g", "z")]
    df = spark.createDataFrame(rows, "k string, v string")
    r = mode_by_group(df, ["k"], "v").collect()[0]
    assert r["mode"] == "z" and r["mode_count"] == 1 and r["n_distinct"] == 1


def test_mode_all_null_group_drops(spark):
    rows = [("g1", None), ("g2", "x")]
    df = spark.createDataFrame(rows, "k string, v string")
    out = mode_by_group(df, ["k"], "v").collect()
    assert len(out) == 1 and out[0]["k"] == "g2"
