"""Unit tests for the wave-34 operators: BFS hop distances, simplified
silhouette, calibration reliability bins, Holt linear smoothing,
int8-vs-exact recall, deterministic negative sampling.  Known-value
fixtures and contracts the oracles don't isolate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.features import calibration_bins
from opteryx_spark.operators.scale import negative_sample
from opteryx_spark.operators.similarity import quantization_recall, silhouette_lite
from opteryx_spark.operators.timeseries import holt_linear
from opteryx_spark.operators.web import hop_distances


# --- BFS hop distances ------------------------------------------------------------


def _seeds(spark, *nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


def test_hop_distances_path(spark):
    # path 0-1-2-3-4 seeded at 0: hops = index, bounded by max_hops
    edges = spark.createDataFrame([(i, i + 1) for i in range(4)], ["src", "dst"])
    out = {r["node"]: r["hops"] for r in hop_distances(edges, _seeds(spark, 0), 3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}  # node 4 is beyond 3 hops -> absent


def test_hop_distances_multi_source_min(spark):
    # seeds at both ends of the path: middle node takes the nearer seed
    edges = spark.createDataFrame([(i, i + 1) for i in range(4)], ["src", "dst"])
    out = {r["node"]: r["hops"] for r in hop_distances(edges, _seeds(spark, 0, 4), 4).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}


def test_hop_distances_disconnected_absent(spark):
    edges = spark.createDataFrame([(0, 1), (5, 6)], ["src", "dst"])
    out = {r["node"]: r["hops"] for r in hop_distances(edges, _seeds(spark, 0), 4).collect()}
    assert 5 not in out and 6 not in out
    assert out == {0: 0, 1: 1}


def test_hop_distances_undirected_and_null_seeds(spark):
    edges = spark.createDataFrame([(1, 0), (2, 1)], ["src", "dst"])  # reversed dirs
    seeds = spark.createDataFrame([(2,), (None,)], "node bigint")
    out = {r["node"]: r["hops"] for r in hop_distances(edges, seeds, 2).collect()}
    assert out == {2: 0, 1: 1, 0: 2}


def test_hop_distances_zero_hops_is_seed_set(spark):
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    out = hop_distances(edges, _seeds(spark, 0), 0).collect()
    assert {(r["node"], r["hops"]) for r in out} == {(0, 0)}


# --- simplified silhouette ---------------------------------------------------------


def test_silhouette_separated_clusters(spark):
    # two tight, well-separated 2-d clusters: s ~ 1e6 for every point
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [0.001, 0.0]),
        (3, 1, [10.0, 10.0]),
        (4, 1, [10.001, 10.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = {r["label"]: r for r in silhouette_lite(df, dim=2).collect()}
    assert out[0]["n_vecs"] == 2 and out[1]["n_vecs"] == 2
    assert out[0]["mean_s_ppm"] > 990_000
    assert out[1]["mean_s_ppm"] > 990_000


def test_silhouette_single_cluster_null(spark):
    df = spark.createDataFrame(
        [(1, 7, [0.0, 1.0]), (2, 7, [1.0, 0.0])], ["vec_id", "label", "embedding"]
    )
    out = silhouette_lite(df, dim=2).collect()
    assert len(out) == 1 and out[0]["mean_s_ppm"] is None


def test_silhouette_duplicate_vectors_counted(spark):
    # two IDENTICAL vectors in one cluster must both score (id-keyed, not
    # vector-keyed)
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [0.0, 0.0]),
        (3, 1, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = {r["label"]: r["n_vecs"] for r in silhouette_lite(df, dim=2).collect()}
    assert out[0] == 2


def test_silhouette_excludes_nulls(spark):
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, None, [1.0, 1.0]),
        (3, 1, None),
        (None, 1, [2.0, 2.0]),
        (4, 1, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<double>")
    out = {r["label"]: r["n_vecs"] for r in silhouette_lite(df, dim=2).collect()}
    assert out == {0: 1, 1: 1}


# --- calibration bins ---------------------------------------------------------------


def test_calibration_bins_known_values(spark):
    # bin 0: scores 0 and 50_000, one positive of two -> acc 500_000
    rows = [(0, 1), (50_000, 0), (950_000, 1), (1_000_000, 1)]
    df = spark.createDataFrame(rows, ["s", "y"])
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y", n_bins=10).collect()}
    assert out[0]["n"] == 2
    assert out[0]["conf_ppm"] == 25_000
    assert out[0]["acc_ppm"] == 500_000
    assert out[0]["gap_ppm"] == 475_000
    # score == 1e6 folds into the TOP bin, not bin 10
    assert set(out) == {0, 9}
    assert out[9]["n"] == 2 and out[9]["acc_ppm"] == 1_000_000


def test_calibration_bins_null_excluded(spark):
    rows = [(None, 1), (500_000, None), (500_000, 1)]
    df = spark.createDataFrame(rows, "s bigint, y int")
    out = calibration_bins(df, "s", "y", n_bins=10).collect()
    assert len(out) == 1 and out[0]["n"] == 1


def test_calibration_bins_validation():
    with pytest.raises(ValueError):
        calibration_bins(None, "s", "y", n_bins=0)


# --- Holt linear smoothing ------------------------------------------------------------


def test_holt_linear_hand_computed(spark):
    # series 10, 12, 14 (qscale 1000):
    # l0=10000 b0=0
    # t1: l=(12000+10000+0)/2=11000, b=((11000-10000)+0)/2=500
    # t2: l=(14000+11000+500)/2=12750, b=((12750-11000)+500)/2=1125
    rows = [("a", 1, 10), ("a", 2, 12), ("a", 3, 14)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = holt_linear(df, ["k"], "t", "v").collect()[0]
    assert out["n_points"] == 3
    assert out["level_q"] == 12_750
    assert out["trend_q"] == 1_125
    assert out["forecast_next_q"] == 13_875


def test_holt_linear_single_point(spark):
    df = spark.createDataFrame([("a", 1, 7)], ["k", "t", "v"])
    out = holt_linear(df, ["k"], "t", "v").collect()[0]
    assert (out["level_q"], out["trend_q"]) == (7000, 0)


def test_holt_linear_negative_trend_truncation(spark):
    # decreasing series drives b negative: both engines truncate toward 0
    rows = [("a", 1, 14), ("a", 2, 12), ("a", 3, 9)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = holt_linear(df, ["k"], "t", "v").collect()[0]
    # l0=14000; t1: l=(12000+14000)/2=13000, b=(-1000)/2=-500
    # t2: l=(9000+13000-500)/2=10750, b=((10750-13000)-500)/2=-2750/2=-1375
    assert out["level_q"] == 10_750
    assert out["trend_q"] == -1_375


def test_holt_linear_null_excluded_and_order(spark):
    rows = [("a", 3, 14), ("a", 1, 10), ("a", None, 99), ("a", 2, 12), ("a", 4, None)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = holt_linear(df, ["k"], "t", "v").collect()[0]
    assert out["n_points"] == 3 and out["level_q"] == 12_750  # same as hand case


# --- int8-vs-exact recall ---------------------------------------------------------------


def test_quantization_recall_perfect_when_exactly_representable(spark):
    # corpus components in {-1, 0, 1}: int8 codes are an exact rescale of
    # the milli-quantized values, so both rankings agree -> recall 1.0
    corpus = [(i, [float(1 if (i >> b) & 1 else 0) for b in range(4)]) for i in range(1, 9)]
    queries = [(100, [1.0, 1.0, 0.0, 0.0])]
    cdf = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    qdf = spark.createDataFrame(queries, ["vec_id", "embedding"])
    out = quantization_recall(qdf, cdf, k=3).collect()
    assert len(out) == 1
    assert out[0]["n_hits"] == 3 and out[0]["recall_ppm"] == 1_000_000


def test_quantization_recall_detects_loss(spark):
    # one dominant component crushes the others under per-vector int8
    # scaling: the quantized ranking diverges from exact for some k
    corpus = [
        (1, [100.0, 0.006]),  # int8 scale 1.27 zeroes the 0.006
        (2, [0.0, 0.005]),  # int8 scale 25400 maps 0.005 -> 127
    ]
    queries = [(10, [0.0, 1.0])]
    cdf = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    qdf = spark.createDataFrame(queries, ["vec_id", "embedding"])
    out = quantization_recall(qdf, cdf, k=1).collect()[0]
    # exact top-1 is vec 1 (milli dot 6000 > 5000); quantized top-1 is
    # vec 2 (int8 dot 16129 > 0)
    assert out["n_hits"] == 0 and out["recall_ppm"] == 0


def test_quantization_recall_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        quantization_recall(df, df, k=0)


# --- deterministic negative sampling ------------------------------------------------------


def _md5_bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_negative_sample_deterministic_and_pure(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    a = sorted(negative_sample(df, "doc_id", "s1", k=3, n_buckets=8).collect())
    b = sorted(negative_sample(df.repartition(7), "doc_id", "s1", k=3, n_buckets=8).collect())
    assert a == b and len(a) > 0
    # replay one draw in pure python: target bucket and its representative
    row = a[0]
    tb = _md5_bucket(f"s1:n:{row['anchor_id']}:{row['j']}", 8)
    reps = {}
    for i in range(50):
        bk = hashlib.md5(f"s1:b:{i}".encode()).hexdigest()
        bucket = _md5_bucket(f"s1:b:{i}", 8)
        if bucket not in reps or (bk, i) < reps[bucket]:
            reps[bucket] = (bk, i)
    assert row["neg_id"] == reps[tb][1]


def test_negative_sample_no_self_pairs_and_k_bound(spark):
    df = spark.createDataFrame([(i,) for i in range(30)], ["doc_id"])
    out = negative_sample(df, "doc_id", "sx", k=4, n_buckets=4).collect()
    assert all(r["neg_id"] != r["anchor_id"] for r in out)
    per_anchor = {}
    for r in out:
        per_anchor.setdefault(r["anchor_id"], set()).add(r["j"])
    assert all(js <= {0, 1, 2, 3} for js in per_anchor.values())


def test_negative_sample_epoch_seed_varies(spark):
    df = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    a = sorted(negative_sample(df, "doc_id", "e1", k=2, n_buckets=8).collect())
    b = sorted(negative_sample(df, "doc_id", "e2", k=2, n_buckets=8).collect())
    assert a != b


def test_negative_sample_null_ids_excluded(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "doc_id bigint")
    out = negative_sample(df, "doc_id", "s", k=2, n_buckets=2).collect()
    assert all(r["anchor_id"] is not None and r["neg_id"] is not None for r in out)


# --- plan-shape assertions (the 100 TB claims, pinned) ---------------------------------


def test_silhouette_broadcasts_centroids(spark):
    from opteryx_spark.plans import explain_text

    df = spark.createDataFrame(
        [(i, i % 3, [float(i), 1.0]) for i in range(20)],
        ["vec_id", "label", "embedding"],
    )
    text = explain_text(silhouette_lite(df, dim=2))
    assert "BroadcastExchange" in text  # k-row centroid frame, never shuffled
    assert "CartesianProduct" not in text  # broadcast NL join, not cartesian


def test_quantization_recall_broadcasts_queries(spark):
    from opteryx_spark.plans import explain_text

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], ["vec_id", "embedding"]
    )
    text = explain_text(
        quantization_recall(df.filter("vec_id = 0"), df.filter("vec_id > 0"), k=3)
    )
    assert "BroadcastExchange" in text
    assert "CartesianProduct" not in text


def test_negative_sample_broadcasts_reps(spark):
    from opteryx_spark.plans import explain_text

    df = spark.createDataFrame([(i,) for i in range(30)], ["doc_id"])
    text = explain_text(negative_sample(df, "doc_id", "s", k=2, n_buckets=4))
    assert "BroadcastExchange" in text  # B-row rep table
    assert "Sort [" not in text.replace("Sort [_b", "")  # only the bucket window sorts


def test_calibration_bins_partial_aggregate(spark):
    from opteryx_spark.plans import explain_text

    df = spark.createDataFrame([(500_000, 1)] * 10, ["s", "y"])
    text = explain_text(calibration_bins(df, "s", "y"))
    # map-side combine: partial HashAggregate before the single exchange
    assert text.count("HashAggregate") >= 2
    assert "Exchange" in text
