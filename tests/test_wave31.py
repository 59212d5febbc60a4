"""Unit tests for the wave-31/32 operators: script profile, lexical
diversity, temperature weights, path n-grams, weighted median, KMV
sketch ops, nearest as-of join, completeness by partition, centroid
drift.  Edge cases beyond the suite oracles: known-value fixtures,
tie-breaks, NULL contracts, sketch exactness below k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.events import path_ngrams
from opteryx_spark.operators.filtering import temperature_weights
from opteryx_spark.operators.joins import asof_join_nearest
from opteryx_spark.operators.profile import kmv_distinct_ops, weighted_median
from opteryx_spark.operators.quality import completeness_by_partition
from opteryx_spark.operators.similarity import centroid_drift
from opteryx_spark.operators.text import lexical_diversity, script_profile


# --- script profile -------------------------------------------------------------


def test_script_profile_known_counts(spark):
    df = spark.createDataFrame([(1, "ab1 c!\n")], ["doc_id", "text"])
    r = script_profile(df).collect()[0]
    assert r["n_chars"] == 7
    assert r["n_letters"] == 3
    assert r["n_digits"] == 1
    assert r["n_spaces"] == 2  # space + newline
    assert r["n_other"] == 1  # '!'
    assert r["letters_ppm"] == (1_000_000 * 3) // 7


def test_script_profile_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[1]["n_chars"] is None and out[1]["letters_ppm"] is None
    assert out[2]["n_chars"] == 0 and out[2]["letters_ppm"] is None


# --- lexical diversity ----------------------------------------------------------


def test_lexdiv_counts_and_hapax(spark):
    # tokens: the the cat sat -> 3 types, hapax {cat, sat} = 2
    df = spark.createDataFrame([(1, "the the cat sat")], ["doc_id", "text"])
    r = lexical_diversity(df).collect()[0]
    assert r["n_tokens"] == 4 and r["n_types"] == 3 and r["hapax"] == 2
    assert r["ttr_ppm"] == (1_000_000 * 3) // 4
    assert r["hapax_ppm"] == (1_000_000 * 2) // 3


def test_lexdiv_all_same_token(spark):
    df = spark.createDataFrame([(1, "x x x")], ["doc_id", "text"])
    r = lexical_diversity(df).collect()[0]
    assert r["n_types"] == 1 and r["hapax"] == 0


def test_lexdiv_null_and_whitespace(spark):
    df = spark.createDataFrame([(1, None), (2, "   ")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert out[1]["n_tokens"] is None
    assert out[2]["n_tokens"] == 0 and out[2]["ttr_ppm"] is None


# --- temperature weights --------------------------------------------------------


def test_temperature_upweights_small_strata(spark):
    rows = [("big",)] * 100 + [("small",)] * 4
    df = spark.createDataFrame(rows, ["lang"])
    out = {r["lang"]: r for r in temperature_weights(df, "lang").collect()}
    assert out["big"]["isqrt_n"] == 10 and out["small"]["isqrt_n"] == 2
    # raw share of small is 4/104 ~ 3.8%; sqrt share is 2/12 ~ 16.7%
    assert out["small"]["weight_ppm"] == (1_000_000 * 2) // 12
    assert out["big"]["weight_ppm"] == (1_000_000 * 10) // 12


def test_temperature_null_stratum_real(spark):
    df = spark.createDataFrame([(None,), ("en",)], "lang string")
    out = temperature_weights(df, "lang").collect()
    assert len(out) == 2


# --- path n-grams ---------------------------------------------------------------


def test_path_ngrams_trigrams(spark):
    rows = [("u", 1, 1, "a"), ("u", 2, 2, "b"), ("u", 3, 3, "c"), ("u", 4, 4, "d")]
    df = spark.createDataFrame(rows, ["u", "t", "id", "et"])
    out = {r["path"]: r["n_paths"] for r in
           path_ngrams(df, "u", "t", "et", n=3, tiebreak_col="id").collect()}
    assert out == {"a>b>c": 1, "b>c>d": 1}


def test_path_ngrams_null_type_placeholder(spark):
    rows = [("u", 1, 1, "a"), ("u", 2, 2, None), ("u", 3, 3, "c")]
    df = spark.createDataFrame(rows, "u string, t long, id long, et string")
    out = [r["path"] for r in path_ngrams(df, "u", "t", "et", n=3).collect()]
    assert out == ["a>∅>c"]


# --- weighted median ------------------------------------------------------------


def test_weighted_median_pulls_toward_weight(spark):
    # values 1..4, weight 10 on value 4 dominates
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 10)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    r = weighted_median(df, ["k"], "v", "w").collect()[0]
    assert r["total_weight"] == 13 and r["weighted_median"] == 4


def test_weighted_median_even_split_lower(spark):
    # cumw at v=1 is 5, total 10 => 2*5 >= 10 qualifies: LOWER median
    rows = [("g", 1, 5), ("g", 2, 5)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    r = weighted_median(df, ["k"], "v", "w").collect()[0]
    assert r["weighted_median"] == 1


def test_weighted_median_tie_values_share_run(spark):
    # duplicate values: cumw is a function of the VALUE (RANGE frame)
    rows = [("g", 1, 1), ("g", 1, 1), ("g", 2, 1)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    r = weighted_median(df, ["k"], "v", "w").collect()[0]
    assert r["weighted_median"] == 1


# --- KMV ------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    a = spark.createDataFrame([(i,) for i in range(50)], ["x"])
    b = spark.createDataFrame([(i,) for i in range(25, 75)], ["x"])
    r = kmv_distinct_ops(a, b, "x", k=256).collect()[0]
    # fewer than k distinct on every side => every estimate is EXACT
    assert r["est_a"] == 50 and r["est_b"] == 50
    assert r["est_union"] == 75
    assert r["est_intersection"] == 25


def test_kmv_duplicates_dont_skew(spark):
    a = spark.createDataFrame([(i % 10,) for i in range(1000)], ["x"])
    b = spark.createDataFrame([(5,), (6,)], ["x"])
    r = kmv_distinct_ops(a, b, "x", k=64).collect()[0]
    assert r["est_a"] == 10 and r["est_b"] == 2 and r["est_union"] == 10
    assert r["est_intersection"] == 2


def test_kmv_estimate_accuracy_above_k(spark):
    n = 20_000
    a = spark.createDataFrame([(i,) for i in range(n)], ["x"])
    b = spark.createDataFrame([(i,) for i in range(n)], ["x"])
    r = kmv_distinct_ops(a, b, "x", k=256).collect()[0]
    # KMV relative error ~ 1/sqrt(k) ~ 6%; allow 20%
    assert abs(r["est_a"] - n) / n < 0.20
    assert abs(r["est_union"] - n) / n < 0.20
    assert abs(r["est_intersection"] - n) / n < 0.25


# --- nearest as-of join ---------------------------------------------------------


def _nearest(spark, left_rows, right_rows, tol=100):
    left = spark.createDataFrame(left_rows, ["k", "lid", "t"])
    right = spark.createDataFrame(right_rows, ["k", "rid", "rt"])
    return {
        r["lid"]: r
        for r in asof_join_nearest(
            left.select("k", "lid", "t"),
            right.select("k", "rid", "rt"),
            ["k"], "t", "rt", tolerance=tol, left_id="lid", right_id="rid",
        ).collect()
    }


def test_nearest_picks_closest_either_side(spark):
    out = _nearest(
        spark,
        [("a", 1, 100)],
        [("a", 10, 60), ("a", 11, 130)],
    )
    assert out[1]["matched_rid"] == 11  # |30| beats |40|
    assert out[1]["match_delta"] == 30
    assert out[1]["match_direction"] == "forward"


def test_nearest_tie_prefers_backward(spark):
    out = _nearest(spark, [("a", 1, 100)], [("a", 10, 90), ("a", 11, 110)])
    assert out[1]["matched_rid"] == 10
    assert out[1]["match_direction"] == "backward"


def test_nearest_outside_tolerance_null(spark):
    out = _nearest(spark, [("a", 1, 100)], [("a", 10, 500)], tol=50)
    assert out[1]["matched_rid"] is None and out[1]["match_direction"] is None


def test_nearest_band_edges_covered(spark):
    # candidate exactly tolerance away, in the adjacent band
    out = _nearest(spark, [("a", 1, 100)], [("a", 10, 200)], tol=100)
    assert out[1]["matched_rid"] == 10 and out[1]["match_delta"] == 100


# --- completeness by partition --------------------------------------------------


def test_completeness_counts(spark):
    rows = [(1, "x", 1.0), (1, None, 2.0), (2, "y", None)]
    df = spark.createDataFrame(rows, "p long, a string, b double")
    out = {
        (r["part"], r["col_name"]): r
        for r in completeness_by_partition(df, "p", ["a", "b"]).collect()
    }
    assert out[(1, "a")]["n_nulls"] == 1 and out[(1, "a")]["n_rows"] == 2
    assert out[(1, "a")]["null_ppm"] == 500_000
    assert out[(2, "b")]["n_nulls"] == 1 and out[(2, "b")]["null_ppm"] == 1_000_000


def test_completeness_null_partition_real(spark):
    rows = [(None, "x"), (None, None)]
    df = spark.createDataFrame(rows, "p string, a string")
    out = completeness_by_partition(df, "p", ["a"]).collect()
    assert len(out) == 1 and out[0]["part"] is None and out[0]["n_nulls"] == 1


# --- centroid drift -------------------------------------------------------------


def test_centroid_drift_known_value(spark):
    a = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [3.0, 0.0])], ["vec_id", "label", "embedding"]
    )
    b = spark.createDataFrame(
        [(3, 0, [5.0, 0.0]), (4, 0, [5.0, 2.0])], ["vec_id", "label", "embedding"]
    )
    r = centroid_drift(a, b, dim=2).collect()[0]
    # centroids (milli): a = (2000, 0), b = (5000, 1000); drift = 3000^2 + 1000^2
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["drift2_q"] == 3000**2 + 1000**2


def test_centroid_drift_one_sided_null(spark):
    a = spark.createDataFrame([(1, 7, [1.0])], ["vec_id", "label", "embedding"])
    b = spark.createDataFrame([(2, 8, [1.0])], ["vec_id", "label", "embedding"])
    out = {r["label"]: r for r in centroid_drift(a, b, dim=1).collect()}
    assert out[7]["drift2_q"] is None and out[7]["n_b"] == 0
    assert out[8]["drift2_q"] is None and out[8]["n_a"] == 0
