"""Unit tests for the wave-37 operators (staged for the r9 window):
common-neighbor Jaccard link prediction and the cohort LTV matrix."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.events import cohort_ltv
from opteryx_spark.operators.web import link_prediction_jaccard


# --- link prediction ---------------------------------------------------------------


def test_link_prediction_hand_computed(spark):
    # path 1-2-3 plus 3-4: predicted links are the 2-hop pairs
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    out = {(r["a"], r["b"]): r for r in link_prediction_jaccard(edges, top_k=10).collect()}
    # (1,3): common {2}, deg 1+2-1=2 -> 500000; (2,4): common {3} -> 500000
    assert set(out) == {(1, 3), (2, 4)}
    assert out[(1, 3)]["n_common"] == 1 and out[(1, 3)]["jaccard_ppm"] == 500_000
    assert out[(2, 4)]["deg_a"] == 2 and out[(2, 4)]["deg_b"] == 1


def test_link_prediction_excludes_existing_edges(spark):
    # triangle: every 2-hop pair is already an edge -> nothing predicted
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    assert link_prediction_jaccard(edges, top_k=10).collect() == []


def test_link_prediction_topk_order_and_cap(spark):
    # hub 0 connects 1..5: all leaf pairs share exactly {0}, jaccard 1/1
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    out = link_prediction_jaccard(edges, top_k=3).collect()
    assert len(out) == 3
    assert [(r["a"], r["b"]) for r in out] == [(1, 2), (1, 3), (1, 4)]  # id tiebreak
    # capping the hub's degree removes it as a wedge center -> no candidates
    assert link_prediction_jaccard(edges, top_k=3, max_degree=4).collect() == []


def test_link_prediction_deterministic(spark):
    import random

    rng = random.Random(31)
    edges = spark.createDataFrame(
        [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(60)], ["src", "dst"]
    )
    a = link_prediction_jaccard(edges, top_k=8).collect()
    b = link_prediction_jaccard(edges.repartition(7), top_k=8).collect()
    assert a == b


# --- cohort LTV ----------------------------------------------------------------------


def _e(uid, day, value):
    return (uid, dt.datetime(2024, 6, day, 12, 0, 0), value)


def test_cohort_ltv_hand_computed(spark):
    rows = [
        _e(1, 1, 10.0), _e(1, 2, 5.0),          # cohort 6/1: day0 10, day1 5
        _e(2, 1, 2.0),                           # cohort 6/1: day0 2
        _e(3, 2, 7.0), _e(3, 4, 1.0),            # cohort 6/2: day0 7, day2 1
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (str(r["cohort_day"]), r["day_offset"]): r
        for r in cohort_ltv(df).collect()
    }
    c1d0 = out[("2024-06-01", 0)]
    assert c1d0["n_active_users"] == 2 and c1d0["rev_q"] == 120_000
    c1d1 = out[("2024-06-01", 1)]
    assert c1d1["rev_q"] == 50_000 and c1d1["cum_rev_q"] == 170_000
    c2d2 = out[("2024-06-02", 2)]
    assert c2d2["cum_rev_q"] == 80_000  # 7.0 then +1.0


def test_cohort_ltv_null_value_counts_activity(spark):
    rows = [(1, dt.datetime(2024, 6, 1), None), (1, dt.datetime(2024, 6, 1), 3.0)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = cohort_ltv(df).collect()[0]
    assert out["n_active_users"] == 1 and out["rev_q"] == 30_000


def test_cohort_ltv_validation(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 6, 1), 1.0)], ["user_id", "ts", "value"])
    with pytest.raises(ValueError):
        cohort_ltv(df, qscale=0)


# --- monotonicity audit -----------------------------------------------------------------


def test_monotonic_check_hand_case(spark):
    from opteryx_spark.operators.quality import monotonic_check

    rows = [
        ("a", 1, 10), ("a", 2, 12), ("a", 3, 11), ("a", 4, 15),  # dip at step 3
        ("b", 1, 5), ("b", 2, 5), ("b", 3, 6),                    # plateau ok
    ]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = {r["k"]: r for r in monotonic_check(df, ["k"], "o", "v").collect()}
    assert out["a"]["n_steps"] == 3 and out["a"]["n_violations"] == 1
    assert out["a"]["first_violation_at"] == 2  # the step STARTING at o=2 drops
    assert out["b"]["n_violations"] == 0 and out["b"]["first_violation_at"] is None


def test_monotonic_check_strict_flags_plateaus(spark):
    from opteryx_spark.operators.quality import monotonic_check

    rows = [("b", 1, 5), ("b", 2, 5), ("b", 3, 6)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = monotonic_check(df, ["k"], "o", "v", strict=True).collect()[0]
    assert out["n_violations"] == 1 and out["first_violation_at"] == 1


def test_monotonic_check_null_excluded_and_tie_order(spark):
    from opteryx_spark.operators.quality import monotonic_check

    rows = [("a", 1, 3), ("a", 1, 2), ("a", None, 99), ("a", 2, None), ("a", 2, 4)]
    df = spark.createDataFrame(rows, "k string, o int, v int")
    out = monotonic_check(df, ["k"], "o", "v").collect()[0]
    # ties at o=1 order by value (2 then 3): steps 2->3->4, clean
    assert out["n_steps"] == 2 and out["n_violations"] == 0
