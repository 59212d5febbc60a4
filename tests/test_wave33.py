"""Unit tests for the wave-33 operators: label-propagation communities,
rolling-median detrend, Markov stationary distribution, leave-fold-out
target encoding.  Known-value fixtures and contracts the oracles don't
isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.events import markov_stationary
from opteryx_spark.operators.features import target_encode_loo
from opteryx_spark.operators.timeseries import rolling_median_detrend
from opteryx_spark.operators.web import label_communities


# --- label propagation ----------------------------------------------------------


def test_lpa_disjoint_cliques_converge(spark):
    # two disjoint triangles: each converges to its minimum label in two
    # rounds and is then a fixpoint (every neighbor already agrees)
    tri = lambda base: [(base, base + 1), (base + 1, base + 2), (base, base + 2)]
    df = spark.createDataFrame(tri(0) + tri(10), ["src", "dst"])
    out = {r["node"]: r["community"] for r in label_communities(df, rounds=4).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[10] == out[11] == out[12] == 10


def test_lpa_bridge_deterministic(spark):
    # synchronous LPA on bridged structure can oscillate by round parity;
    # the contract is DETERMINISM at a fixed round count, not convergence
    tri = lambda base: [(base, base + 1), (base + 1, base + 2), (base, base + 2)]
    rows = tri(0) + tri(10) + [(2, 10)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    a = sorted(label_communities(df, rounds=3).collect())
    b = sorted(label_communities(df.repartition(7), rounds=3).collect())
    assert a == b
    assert all(r["community"] in {0, 1, 2, 10, 11, 12} for r in a)


def test_lpa_deterministic_tiebreak(spark):
    # a path 0-1-2: node 1 sees labels {0, 2} once each => smallest wins
    df = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    out = {r["node"]: r["community"] for r in label_communities(df, rounds=1).collect()}
    assert out[1] == 0


# --- rolling median detrend -----------------------------------------------------


def test_rmd_flat_series_zero_residual(spark):
    rows = [("a", t, 7) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = rolling_median_detrend(df, ["k"], "t", "x", half_window=2).collect()
    assert all(r["rolling_med"] == pytest.approx(7.0) for r in out)
    assert all(r["residual"] == pytest.approx(0.0) for r in out)


def test_rmd_spike_isolated(spark):
    # single spike: its own rolling median stays at the level => residual
    # carries the full spike; neighbors' medians stay flat too
    vals = [10, 10, 10, 100, 10, 10, 10]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = {r["t"]: r for r in
           rolling_median_detrend(df, ["k"], "t", "x", half_window=3).collect()}
    assert out[3]["rolling_med"] == pytest.approx(10.0)
    assert out[3]["residual"] == pytest.approx(90.0)


def test_rmd_null_contract(spark):
    rows = [("a", 1, 5), ("a", None, 9), ("a", 2, None), ("a", 3, 5)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = rolling_median_detrend(df, ["k"], "t", "x").collect()
    assert {r["t"] for r in out} == {1, 3}


# --- Markov stationary ----------------------------------------------------------


def test_markov_absorbing_cycle(spark):
    # deterministic cycle a->b->c->a: stationary is uniform 1/3
    rows = [("a", "b", 5), ("b", "c", 5), ("c", "a", 5)]
    df = spark.createDataFrame(rows, ["fi", "tj", "c"])
    out = {r["state"]: r["stationary_ppm"] for r in
           markov_stationary(df, "fi", "tj", "c", rounds=6).collect()}
    # uniform start 333333 each; cycle permutes the vector, truncation-free
    assert out == {"a": 333333, "b": 333333, "c": 333333}


def test_markov_sink_attracts_mass(spark):
    # b only transitions to itself; a splits between a and b => mass
    # drains toward b over rounds
    rows = [("a", "a", 1), ("a", "b", 1), ("b", "b", 1)]
    df = spark.createDataFrame(rows, ["fi", "tj", "c"])
    out = {r["state"]: r["stationary_ppm"] for r in
           markov_stationary(df, "fi", "tj", "c", rounds=8).collect()}
    assert out["b"] > 900_000 and out["a"] < 100_000


# --- leave-fold-out target encoding ---------------------------------------------


def test_loo_excludes_own_fold(spark):
    # cat 'x': fold 0 rows target 0.0, fold 1 rows target 10.0
    # a fold-0 row's encoding uses only fold-1 stats (plus the prior)
    rows = [(1, "x", 0, 0.0), (2, "x", 0, 0.0), (3, "x", 1, 10.0), (4, "x", 1, 10.0)]
    df = spark.createDataFrame(rows, ["id", "cat", "fold", "y"])
    out = {r["id"]: r["enc"] for r in
           target_encode_loo(df, "cat", "y", "fold", m=0).collect()}
    # m=0: enc(fold 0 row) = mean of fold-1 targets = 10.0, and vice versa
    assert out[1] == pytest.approx(10.0)
    assert out[3] == pytest.approx(0.0)


def test_loo_smoothing_pulls_to_prior(spark):
    rows = [(1, "x", 0, 0.0), (2, "x", 1, 10.0)]
    df = spark.createDataFrame(rows, ["id", "cat", "fold", "y"])
    out = {r["id"]: r["enc"] for r in
           target_encode_loo(df, "cat", "y", "fold", m=1000).collect()}
    # huge m: both encodings collapse to the global prior 5.0
    assert out[1] == pytest.approx(5.0, abs=0.1)
    assert out[2] == pytest.approx(5.0, abs=0.1)


def test_loo_null_category_null_enc(spark):
    rows = [(1, None, 0, 1.0), (2, "x", None, 2.0), (3, "x", 0, 3.0)]
    df = spark.createDataFrame(rows, "id long, cat string, fold int, y double")
    out = {r["id"]: r["enc"] for r in
           target_encode_loo(df, "cat", "y", "fold").collect()}
    assert out[1] is None and out[2] is None and out[3] is not None


# --- epoch shuffle --------------------------------------------------------------


def test_epoch_shuffle_reproducible_and_epoch_varying(spark):
    from opteryx_spark.operators.scale import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    a = sorted(epoch_shuffle(df, "id", "s", 1, 4).collect())
    b = sorted(epoch_shuffle(df.repartition(7), "id", "s", 1, 4).collect())
    assert a == b  # partitioning-invariant
    c = sorted(epoch_shuffle(df, "id", "s", 2, 4).collect())
    assert a != c  # a different epoch is a different order
    # positions within each shard are a contiguous 1..n_s ranking
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_epoch_shuffle_null_ids_excluded(spark):
    from opteryx_spark.operators.scale import epoch_shuffle

    df = spark.createDataFrame([(1,), (None,)], "id long")
    out = epoch_shuffle(df, "id", "s", 1, 2).collect()
    assert len(out) == 1
