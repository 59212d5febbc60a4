"""Unit tests for the wave-36 operators (staged for the r9 window):
exact two-sample KS drift, classical decomposition, semi-hard triplet
mining, term trends, A/B conversion z."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.events import ab_test_conversion
from opteryx_spark.operators.quality import ks_drift
from opteryx_spark.operators.similarity import triplet_mining
from opteryx_spark.operators.text import term_trends
from opteryx_spark.operators.timeseries import classical_decompose


# --- KS drift ---------------------------------------------------------------------


def test_ks_identical_distributions_zero(spark):
    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], ["v"])
    out = ks_drift(a, a, "v").collect()[0]
    assert out["d_scaled"] == 0 and out["d_ppm"] == 0


def test_ks_disjoint_distributions_one(spark):
    a = spark.createDataFrame([(float(i),) for i in range(10)], ["v"])
    b = spark.createDataFrame([(float(i + 100),) for i in range(20)], ["v"])
    out = ks_drift(a, b, "v").collect()[0]
    assert (out["n_a"], out["n_b"]) == (10, 20)
    assert out["d_scaled"] == 10 * 20  # D = 1
    assert out["d_ppm"] == 1_000_000


def test_ks_hand_computed(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: D = 1/2 at v in [2,3)
    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], ["v"])
    b = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], ["v"])
    out = ks_drift(a, b, "v").collect()[0]
    assert out["d_scaled"] == 8  # |2*4 - 0*4| = 8 of 16
    assert out["d_ppm"] == 500_000


def test_ks_python_reference_and_bucket_invariance(spark):
    import random

    rng = random.Random(404)
    av = [rng.uniform(0, 5) for _ in range(120)]
    bv = [rng.gauss(3, 1.2) for _ in range(80)]

    def ref(xs, ys, q=10_000):
        xs = sorted(math.floor(v * q) for v in xs)
        ys = sorted(math.floor(v * q) for v in ys)
        vals = sorted(set(xs) | set(ys))
        best, ca, cb = 0, 0, 0
        import bisect

        for v in vals:
            ca = bisect.bisect_right(xs, v)
            cb = bisect.bisect_right(ys, v)
            best = max(best, abs(ca * len(ys) - cb * len(xs)))
        return best

    a = spark.createDataFrame([(v,) for v in av], ["v"])
    b = spark.createDataFrame([(v,) for v in bv], ["v"])
    want = ref(av, bv)
    for nb in (1, 7, 64):  # bucket count must not change the statistic
        out = ks_drift(a, b, "v", n_range_buckets=nb).collect()[0]
        assert out["d_scaled"] == want, nb


def test_ks_nulls_excluded(spark):
    a = spark.createDataFrame([(1.0,), (None,)], "v double")
    b = spark.createDataFrame([(2.0,), (None,), (None,)], "v double")
    out = ks_drift(a, b, "v").collect()[0]
    assert (out["n_a"], out["n_b"]) == (1, 1)


# --- classical decomposition -----------------------------------------------------------


def test_decompose_identities_and_flat_trend(spark):
    # constant series: trend = y*q, detrended 0, seasonal 0, resid 0
    rows = [("a", t, 10) for t in range(14)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = classical_decompose(df, ["k"], "t", "v").collect()
    assert len(out) == 14
    for r in out:
        assert r["trend_q"] == 10_000
        assert r["seasonal_q"] == 0 and r["resid_q"] == 0


def test_decompose_recovers_weekly_signal(spark):
    # level 100 + phase bump on phase 0: seasonal picks up the bump
    rows = [("a", t, 100 + (50 if t % 7 == 0 else 0)) for t in range(28)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {r["t"]: r for r in classical_decompose(df, ["k"], "t", "v").collect()}
    bump = [out[t]["seasonal_q"] for t in range(28) if t % 7 == 0]
    flat = [out[t]["seasonal_q"] for t in range(28) if t % 7 != 0]
    assert min(bump) > max(flat)
    # additive identity holds row-wise by construction
    for r in out.values():
        assert r["v"] * 1000 - r["trend_q"] - r["seasonal_q"] == r["resid_q"]


def test_decompose_validation(spark):
    df = spark.createDataFrame([("a", 1, 2)], ["k", "t", "v"])
    with pytest.raises(ValueError):
        classical_decompose(df, [], "t", "v")


# --- triplet mining -----------------------------------------------------------------


def test_triplet_semi_hard_selection(spark):
    corpus = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [1.0, 0.0]),     # positive for anchor (d2=1e6)
        (3, 1, [0.5, 0.0]),     # negative NEARER than positive -> not semi-hard
        (4, 1, [2.0, 0.0]),     # semi-hard negative (d2=4e6 > 1e6)
        (5, 1, [9.0, 0.0]),     # farther semi-hard, not picked
    ]
    anchors = [(1, 0, [0.0, 0.0])]
    cdf = spark.createDataFrame(corpus, ["vec_id", "label", "embedding"])
    adf = spark.createDataFrame(anchors, ["vec_id", "label", "embedding"])
    out = triplet_mining(adf, cdf).collect()[0]
    assert out["pos_id"] == 2 and out["pos_d2_q"] == 1_000_000
    assert out["neg_id"] == 4 and out["neg_d2_q"] == 4_000_000


def test_triplet_no_semi_hard_is_null(spark):
    corpus = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [2.0, 0.0]),     # positive d2=4e6
        (3, 1, [1.0, 0.0]),     # all negatives nearer than positive
    ]
    anchors = [(1, 0, [0.0, 0.0])]
    cdf = spark.createDataFrame(corpus, ["vec_id", "label", "embedding"])
    adf = spark.createDataFrame(anchors, ["vec_id", "label", "embedding"])
    out = triplet_mining(adf, cdf).collect()[0]
    assert out["pos_id"] == 2 and out["neg_id"] is None and out["neg_d2_q"] is None


def test_triplet_anchor_without_same_label_absent(spark):
    corpus = [(2, 1, [1.0, 0.0])]
    anchors = [(1, 0, [0.0, 0.0])]
    cdf = spark.createDataFrame(corpus, ["vec_id", "label", "embedding"])
    adf = spark.createDataFrame(anchors, ["vec_id", "label", "embedding"])
    assert triplet_mining(adf, cdf).collect() == []


def test_triplet_excludes_self(spark):
    corpus = [(1, 0, [0.0, 0.0]), (2, 0, [1.0, 0.0]), (3, 1, [5.0, 0.0])]
    anchors = [(1, 0, [0.0, 0.0])]
    cdf = spark.createDataFrame(corpus, ["vec_id", "label", "embedding"])
    adf = spark.createDataFrame(anchors, ["vec_id", "label", "embedding"])
    out = triplet_mining(adf, cdf).collect()[0]
    assert out["pos_id"] == 2  # not the anchor itself at d2=0


# --- term trends ------------------------------------------------------------------------


def test_term_trends_rising_and_falling(spark):
    rows = []
    did = 0
    for b in range(4):
        for _ in range(1 + 2 * b):  # 'up' grows with batch
            rows.append((did, b, "up common")); did += 1
        for _ in range(7 - 2 * b):  # 'down' shrinks
            rows.append((did, b, "down common")); did += 1
    df = spark.createDataFrame(rows, ["doc_id", "batch", "text"])
    out = term_trends(df, "batch", min_total=4, top_k=2).collect()
    rising = [r for r in out if r["direction"] == "rising"]
    falling = [r for r in out if r["direction"] == "falling"]
    assert rising[0]["token"] == "up" and rising[0]["slope_ppm"] > 0
    assert falling[0]["token"] == "down" and falling[0]["slope_ppm"] < 0
    # 'common' is flat: slope 0, 16 occurrences, constant across batches
    common = next(r for r in out if r["token"] == "common")
    assert common["slope_ppm"] == 0 and common["n_batches"] == 4


def test_term_trends_densifies_missing_batches(spark):
    # 'spike' appears ONLY in batch 3: slope must treat batches 0-2 as 0
    rows = [(i, i % 4, "base") for i in range(8)] + [(100, 3, "spike spike spike spike spike")]
    df = spark.createDataFrame(rows, ["doc_id", "batch", "text"])
    out = {r["token"]: r for r in term_trends(df, "batch", min_total=5, top_k=5).collect() if r["direction"] == "rising"}
    assert out["spike"]["n_batches"] == 4  # densified, not 1
    assert out["spike"]["slope_ppm"] > 0


# --- A/B conversion z ----------------------------------------------------------------------


def test_ab_test_hand_computed(spark):
    # variant 0: users 0,2 (user 0 converts); variant 1: users 1,3 (both convert)
    rows = [
        (0, "purchase"), (0, "view"), (2, "view"),
        (1, "purchase"), (3, "purchase"), (3, "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = ab_test_conversion(df).collect()[0]
    assert (out["n_a"], out["conv_a"], out["n_b"], out["conv_b"]) == (2, 1, 2, 2)
    assert out["rate_a_ppm"] == 500_000 and out["rate_b_ppm"] == 1_000_000
    assert out["lift_ppm"] == 500_000
    p = 3 / 4
    want_z = (1.0 - 0.5) / math.sqrt(p * (1 - p) * (1 / 2 + 1 / 2))
    assert abs(out["z"] - want_z) < 1e-12


def test_ab_test_degenerate_rate_null_z(spark):
    rows = [(0, "view"), (1, "view"), (2, "view"), (3, "view")]
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = ab_test_conversion(df).collect()[0]
    assert out["conv_a"] == 0 and out["conv_b"] == 0 and out["z"] is None


def test_ab_test_empty_variant_empty_result(spark):
    rows = [(0, "purchase"), (2, "view")]  # only even users -> variant 1 empty
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    assert ab_test_conversion(df).collect() == []


# --- null patterns -----------------------------------------------------------------------


def test_null_patterns_joint_vs_marginal(spark):
    from opteryx_spark.operators.profile import null_patterns

    rows = [(1, None, None), (2, None, None), (3, "x", 1.0), (4, "y", None)]
    df = spark.createDataFrame(rows, "id bigint, a string, b double")
    out = {r["pattern"]: (r["n_cols_null"], r["n_rows"]) for r in null_patterns(df, ["a", "b"]).collect()}
    assert out == {"11": (2, 2), "00": (0, 1), "01": (1, 1)}


def test_null_patterns_validation(spark):
    from opteryx_spark.operators.profile import null_patterns

    df = spark.createDataFrame([(1,)], ["a"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        null_patterns(df, [])


# --- balanced downsample ------------------------------------------------------------------


def test_balanced_downsample_exact_min_per_class(spark):
    from opteryx_spark.operators.scale import balanced_downsample

    rows = [(i, "big") for i in range(20)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "label"])
    kept = balanced_downsample(df, "label", "doc_id").collect()
    by_label = {}
    for r in kept:
        by_label.setdefault(r["label"], []).append(r["doc_id"])
    assert len(by_label["big"]) == 3 and len(by_label["small"]) == 3
    assert sorted(by_label["small"]) == [100, 101, 102]  # minority intact


def test_balanced_downsample_deterministic(spark):
    from opteryx_spark.operators.scale import balanced_downsample

    rows = [(i, i % 3) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "label"])
    a = sorted((r["label"], r["doc_id"]) for r in balanced_downsample(df, "label", "doc_id").collect())
    b = sorted((r["label"], r["doc_id"]) for r in balanced_downsample(df.repartition(9), "label", "doc_id").collect())
    assert a == b
    # seed changes the kept set
    c = sorted((r["label"], r["doc_id"]) for r in balanced_downsample(df, "label", "doc_id", seed="other").collect())
    assert a != c


# --- plan-shape assertions (scale claims, pinned) -------------------------------------------


def test_ks_no_data_sized_single_partition(spark):
    # the distributed prefix sum: the only SinglePartition exchange may feed
    # the n_buckets-row offsets frame / final 1-row reduce, never a
    # data-sized window — assert the per-value cumsum window partitions by
    # the bucket key
    from opteryx_spark.plans import explain_text

    a = spark.createDataFrame([(float(i),) for i in range(50)], ["v"])
    b = spark.createDataFrame([(float(i) + 0.5,) for i in range(50)], ["v"])
    text = explain_text(ks_drift(a, b, "v"))
    # the per-value cumulative window is PARTITIONED BY the range bucket
    # (its Arguments list shows [_bkt] as the partition spec before the
    # _v ordering); the only unpartitioned windows are the n_buckets-row
    # offsets frame
    assert "windowspecdefinition(_bkt#" in text


def test_triplet_broadcasts_anchor_panel(spark):
    from opteryx_spark.plans import explain_text

    df = spark.createDataFrame(
        [(i, i % 2, [float(i), 1.0]) for i in range(20)],
        ["vec_id", "label", "embedding"],
    )
    text = explain_text(triplet_mining(df.filter("vec_id < 2"), df))
    assert "BroadcastExchange" in text
    assert "CartesianProduct" not in text


def test_term_trends_topk_not_global_sort(spark):
    # top movers must plan TakeOrderedAndProject, not a full Sort+Limit
    from opteryx_spark.plans import explain_text

    rows = [(i, i % 4, "tok%d x" % (i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "batch", "text"])
    text = explain_text(term_trends(df, "batch", min_total=1, top_k=3))
    assert "TakeOrderedAndProject" in text


def test_balanced_downsample_label_partitioned_window(spark):
    from opteryx_spark.operators.scale import balanced_downsample
    from opteryx_spark.plans import explain_text

    df = spark.createDataFrame([(i, i % 3) for i in range(30)], ["doc_id", "label"])
    text = explain_text(balanced_downsample(df, "label", "doc_id"))
    assert "BroadcastExchange" in text  # the 1-row minimum, never a shuffle
    # the ranking window is PARTITIONED BY the label, not global
    assert "windowspecdefinition(label#" in text


# --- Wasserstein-1 drift ---------------------------------------------------------------------


def test_w1_pure_shift_hand_computed(spark):
    from opteryx_spark.operators.quality import w1_drift

    # b = a + 2.0 exactly: W1 = 2.0 -> 20000 quantized units
    av = [0.0, 1.0, 5.0, 9.0]
    a = spark.createDataFrame([(v,) for v in av], ["v"])
    b = spark.createDataFrame([(v + 2.0,) for v in av], ["v"])
    out = w1_drift(a, b, "v").collect()[0]
    assert out["w1_scaled"] == 20_000 * 4 * 4
    assert out["w1_milli_units"] == 2_000  # 2.0 in milli units


def test_w1_identical_zero_and_python_reference(spark):
    import math
    import random

    from opteryx_spark.operators.quality import w1_drift

    a0 = spark.createDataFrame([(float(i % 7),) for i in range(30)], ["v"])
    assert w1_drift(a0, a0, "v").collect()[0]["w1_scaled"] == 0

    rng = random.Random(909)
    av = [rng.uniform(0, 4) for _ in range(70)]
    bv = [rng.gauss(2.5, 1.0) for _ in range(50)]

    def ref(xs, ys, q=10_000):
        xs = sorted(math.floor(v * q) for v in xs)
        ys = sorted(math.floor(v * q) for v in ys)
        vals = sorted(set(xs) | set(ys))
        import bisect

        tot = 0
        for i, v in enumerate(vals[:-1]):
            ca = bisect.bisect_right(xs, v)
            cb = bisect.bisect_right(ys, v)
            tot += abs(ca * len(ys) - cb * len(xs)) * (vals[i + 1] - v)
        return tot

    a = spark.createDataFrame([(v,) for v in av], ["v"])
    b = spark.createDataFrame([(v,) for v in bv], ["v"])
    want = ref(av, bv)
    for nbk in (1, 5, 64):  # bucket invariance again
        out = w1_drift(a, b, "v", n_range_buckets=nbk).collect()[0]
        assert out["w1_scaled"] == want, nbk


def test_w1_vs_ks_sensitivity(spark):
    from opteryx_spark.operators.quality import ks_drift, w1_drift

    # a tiny uniform shift: KS stays small-ish, W1 captures the full shift
    av = [float(i) for i in range(100)]
    a = spark.createDataFrame([(v,) for v in av], ["v"])
    b = spark.createDataFrame([(v + 0.5,) for v in av], ["v"])
    ks = ks_drift(a, b, "v").collect()[0]
    w1 = w1_drift(a, b, "v").collect()[0]
    assert w1["w1_milli_units"] == 500  # the exact 0.5 mean displacement
    assert ks["d_ppm"] <= 20_000  # KS barely sees it (1/100)


# --- removal-effect attribution ------------------------------------------------------------


def _ev(uid, minute, etype, eid):
    import datetime as dt

    return (uid, dt.datetime(2024, 5, 1, 10, minute), etype, eid)


def test_removal_attribution_hand_computed(spark):
    from opteryx_spark.operators.events import removal_effect_attribution

    rows = [
        _ev(1, 0, "click", 1), _ev(1, 5, "purchase", 2),   # converts via click
        _ev(2, 0, "view", 3),                              # never converts
        _ev(3, 0, "purchase", 4),                          # START -> CONV direct
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    out = {r["channel"]: r for r in removal_effect_attribution(df).collect()}
    # full chain: START -> {click 1/3, view 1/3, CONV 1/3}; click -> CONV
    assert out["click"]["p_full_ppm"] == 666_666
    assert out["click"]["p_removed_ppm"] == 333_333
    assert out["click"]["removal_effect_ppm"] == 333_333
    assert out["click"]["share_ppm"] == 1_000_000
    assert out["view"]["removal_effect_ppm"] == 0
    assert out["view"]["share_ppm"] == 0


def test_removal_attribution_post_purchase_excluded(spark):
    from opteryx_spark.operators.events import removal_effect_attribution

    rows = [
        _ev(4, 0, "view", 1), _ev(4, 2, "purchase", 2), _ev(4, 5, "click", 3),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    out = {r["channel"]: r for r in removal_effect_attribution(df).collect()}
    # click happened AFTER the first purchase: not a journey touch at all
    assert set(out) == {"view"}
    assert out["view"]["p_full_ppm"] == 1_000_000
    assert out["view"]["removal_effect_ppm"] == 1_000_000


def test_removal_attribution_deterministic(spark):
    import random

    from opteryx_spark.operators.events import removal_effect_attribution

    rng = random.Random(77)
    types = ["view", "click", "signup", "purchase"]
    rows = [
        _ev(rng.randint(1, 30), rng.randint(0, 59), rng.choice(types), i)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    a = sorted(map(tuple, removal_effect_attribution(df).collect()))
    b = sorted(map(tuple, removal_effect_attribution(df.repartition(7)).collect()))
    assert a == b and len(a) == 3
