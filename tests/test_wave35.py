"""Unit tests for the wave-35 operators (staged for the r9 window):
HITS hubs/authorities, greedy k-center coreset, funnel time-to-convert,
weekday ANOVA seasonal strength, shingle containment pairs, PCA power
iteration.  Known-value fixtures and contracts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.dedup import containment_pairs
from opteryx_spark.operators.events import funnel_time_to_convert
from opteryx_spark.operators.similarity import kcenter_coreset, pca_power_portable
from opteryx_spark.operators.timeseries import weekday_anova
from opteryx_spark.operators.web import hits_scores


# --- HITS ---------------------------------------------------------------------


def test_hits_star_hand_computed(spark):
    # 1->3, 2->3: node 3 is the authority, 1 and 2 split hub mass
    df = spark.createDataFrame([(1, 3), (2, 3)], ["src", "dst"])
    out = {r["node"]: (r["hub_ppm"], r["auth_ppm"]) for r in hits_scores(df, rounds=3).collect()}
    assert out[3] == (0, 1_000_000)
    assert out[1] == (500_000, 0)
    assert out[2] == (500_000, 0)


def test_hits_deterministic_and_simple_graph(spark):
    rows = [(1, 2), (2, 3), (3, 1), (1, 3), (1, 3), (4, 4)]  # dup edge + self-loop
    df = spark.createDataFrame(rows, ["src", "dst"])
    a = sorted(hits_scores(df, rounds=4).collect())
    b = sorted(hits_scores(df.repartition(7), rounds=4).collect())
    assert a == b
    assert all(r["node"] != 4 for r in a)  # self-loop-only node absent


def test_hits_validation(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        hits_scores(df, rounds=0)


# --- k-center coreset ------------------------------------------------------------


def test_kcenter_hand_computed(spark):
    rows = [(1, [0.0]), (2, [10.0]), (3, [1.0]), (4, [20.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = [(r["sel_idx"], r["vec_id"], r["radius2_q"]) for r in kcenter_coreset(df, k=3).collect()]
    # anchor = min id; then farthest-first: 20.0 (d2 4e8), then 10.0 (1e8)
    assert out == [(1, 1, None), (2, 4, 400_000_000), (3, 2, 100_000_000)]


def test_kcenter_exhausted_corpus_repeats_anchor(spark):
    rows = [(i, [5.0, 5.0]) for i in range(1, 4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = [(r["sel_idx"], r["vec_id"], r["radius2_q"]) for r in kcenter_coreset(df, k=3).collect()]
    assert out == [(1, 1, None), (2, 1, 0), (3, 1, 0)]


def test_kcenter_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (None, [1.0])], "vec_id bigint, embedding array<double>"
    )
    assert kcenter_coreset(df, k=2).collect() == []


def test_kcenter_deterministic_under_repartition(spark):
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-3, 3) for _ in range(4)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = kcenter_coreset(df, k=5).collect()
    b = kcenter_coreset(df.repartition(11), k=5).collect()
    assert a == b


# --- funnel time-to-convert --------------------------------------------------------


def _ts(m):
    return dt.datetime(2024, 3, 1, 10, m, 0)


def test_funnel_ttc_semantics(spark):
    rows = [
        (1, _ts(0), "view"), (1, _ts(5), "purchase"),      # converts in 5 min
        (2, _ts(0), "purchase"), (2, _ts(5), "view"),      # b only BEFORE a
        (3, _ts(2), "view"),                               # never converts
        (4, _ts(1), "view"), (4, _ts(1), "purchase"),      # same instant counts
        (5, _ts(3), "purchase"),                           # no a -> absent
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in funnel_time_to_convert(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["delta_us"] == 5 * 60 * 1_000_000
    assert out[2]["delta_us"] is None and out[2]["t_b_us"] is None
    assert out[3]["delta_us"] is None
    assert out[4]["delta_us"] == 0


def test_funnel_ttc_first_touch_each_side(spark):
    rows = [
        (1, _ts(0), "view"), (1, _ts(9), "view"),
        (1, _ts(4), "purchase"), (1, _ts(8), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = funnel_time_to_convert(df).collect()[0]
    assert out["delta_us"] == 4 * 60 * 1_000_000  # first view -> first purchase after it


# --- weekday ANOVA ---------------------------------------------------------------


def test_weekday_anova_pure_seasonal(spark):
    rows = [("a", t, t % 7) for t in range(14)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = weekday_anova(df, ["k"], "t", "v").collect()[0]
    assert out["n_points"] == 14 and out["n_phases"] == 7
    assert out["ssb_n"] == out["sst_n"]  # zero within-phase variance
    assert out["eta2_ppm"] == 1_000_000


def test_weekday_anova_constant_series_null(spark):
    rows = [("a", t, 5) for t in range(14)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = weekday_anova(df, ["k"], "t", "v").collect()[0]
    assert out["sst_n"] == 0 and out["eta2_ppm"] is None


def test_weekday_anova_no_seasonal_signal_low(spark):
    # linear trend with no weekly structure: eta2 well below 1
    rows = [("a", t, t) for t in range(28)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = weekday_anova(df, ["k"], "t", "v").collect()[0]
    assert 0 <= out["eta2_ppm"] < 200_000


# --- containment pairs -------------------------------------------------------------


def test_containment_doc_in_doc(spark):
    rows = [
        (1, "a b c d e f"),            # 4 3-shingles, all inside doc 2
        (2, "a b c d e f g h"),        # 6 3-shingles
        (3, "x y z w"),                # unrelated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = containment_pairs(df, k=3, min_containment_ppm=500_000).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id1"], r["id2"]) == (1, 2)
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (4, 4, 6)
    assert r["c_a_in_b_ppm"] == 1_000_000
    assert r["c_b_in_a_ppm"] == 666_666
    # Jaccard would be 4/8 = 0.5 — containment is the asymmetric signal


def test_containment_threshold_and_short_docs(spark):
    rows = [(1, "a b"), (2, None), (3, "p q r s"), (4, "p q r t u")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # docs 3,4 share 1 of 2 and 1 of 3 shingles: 500000 / 333333
    out = containment_pairs(df, k=3, min_containment_ppm=500_000).collect()
    assert [(r["id1"], r["id2"]) for r in out] == [(3, 4)]
    assert containment_pairs(df, k=3, min_containment_ppm=600_000).collect() == []


# --- PCA power iteration --------------------------------------------------------------


def test_pca_pure_axis_exact(spark):
    rows = [([2.0, 0.0],), ([3.0, 0.0],), ([-1.0, 0.0],)]
    df = spark.createDataFrame(rows, ["embedding"])
    out = {r["dim_idx"]: r["component_milli"] for r in pca_power_portable(df, dim=2).collect()}
    assert out == {0: 1000, 1: 0}


def test_pca_dominant_direction(spark):
    import random

    rng = random.Random(11)
    rows = [([rng.uniform(3, 5), rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1)],) for _ in range(50)]
    df = spark.createDataFrame(rows, ["embedding"])
    out = {r["dim_idx"]: r["component_milli"] for r in pca_power_portable(df, dim=3).collect()}
    assert abs(out[0]) == 1000  # the dominant axis carries the max component
    assert abs(out[1]) < 100 and abs(out[2]) < 100


def test_pca_deterministic_under_repartition(spark):
    import random

    rng = random.Random(21)
    rows = [([rng.uniform(-2, 2) for _ in range(4)],) for _ in range(80)]
    df = spark.createDataFrame(rows, ["embedding"])
    a = pca_power_portable(df, dim=4).collect()
    b = pca_power_portable(df.repartition(13), dim=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pca_empty_corpus_zero_vector(spark):
    df = spark.createDataFrame([], "embedding array<double>")
    out = {r["dim_idx"]: r["component_milli"] for r in pca_power_portable(df, dim=2, rounds=1).collect()}
    assert out == {0: 0, 1: 0}
