"""Unit tests for the wave-38 operators: personalized PageRank, additive
Holt-Winters, Matryoshka prefix-dim recall, chi-square token screening,
forward as-of join, data-constrained epoch upsampling.  Known-value
fixtures and contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opteryx_spark.operators.features import chi2_screen
from opteryx_spark.operators.filtering import epochs_upsample
from opteryx_spark.operators.joins import asof_join_forward
from opteryx_spark.operators.similarity import matryoshka_recall
from opteryx_spark.operators.timeseries import holt_winters
from opteryx_spark.operators.web import personalized_pagerank


# --- personalized PageRank ----------------------------------------------------


def test_ppr_seed_concentration(spark):
    # chain 1->2->3 with seed {1}: mass enters at 1 only and decays along
    # the chain, so rank(1) > rank(2) > rank(3) — a global PR would give
    # 3 (most pointed-to transitively) at least as much as 2
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r["rank"] for r in personalized_pagerank(edges, seeds, iterations=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] > out[2] > out[3]


def test_ppr_hand_computed_two_nodes(spark):
    # 1->2, seed {1}, scale 1000, 1 iteration, d=85:
    #   r0: rank(1)=1000, rank(2)=0 (non-seed)
    #   dangling = rank(2) = 0 (node 2 has deg 0)... r0 rank(2)=0 so dm=0
    #   inc(2) = rank(1) div 1 = 1000
    #   r1(1) = (15*(1000 div 1)) div 100 + (85*(0 + 0)) div 100 = 150
    #   r1(2) = 0 (non-seed base) + (85*1000) div 100 = 850
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, iterations=1, scale=1000).collect()
    }
    assert out == {1: 150, 2: 850}


def test_ppr_out_of_graph_seed_ignored(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (99,)], ["node"])  # 99 not in graph
    out = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, iterations=1, scale=1000).collect()
    }
    # n_seeds (in-graph) = 1 — identical to the single-seed case
    assert out == {1: 150, 2: 850}


def test_ppr_partitioning_invariant(spark):
    rows = [(i % 7, (i * 3 + 1) % 7) for i in range(30) if i % 7 != (i * 3 + 1) % 7]
    edges = spark.createDataFrame(sorted(set(rows)), ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (1,)], ["node"])
    a = sorted(personalized_pagerank(edges, seeds, iterations=3).collect())
    b = sorted(personalized_pagerank(edges.repartition(5), seeds, iterations=3).collect())
    assert a == b


def test_ppr_validation(spark):
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    s = spark.createDataFrame([(1,)], ["node"])
    with pytest.raises(ValueError):
        personalized_pagerank(e, s, iterations=0)
    with pytest.raises(ValueError):
        personalized_pagerank(e, s, damping_pct=100)


# --- additive Holt-Winters ------------------------------------------------------


def _hw_python(ys, m):
    def half(x):
        return x // 2 if x >= 0 else -((-x) // 2)

    l, b, s = ys[0], 0, [0] * m
    for y in ys[1:]:
        s_old = s[0]
        nl = half(y - s_old + l + b)
        nb = half((nl - l) + b)
        ns = half((y - nl) + s_old)
        s = s[1:] + [ns]
        l, b = nl, nb
    return l, b, s[0]


def test_holt_winters_matches_python_reference(spark):
    ys = [10, 14, 9, 22, 11, 15, 8, 12, 16, 10, 25, 12, 17, 9, 13]
    qys = [y * 1000 for y in ys]
    df = spark.createDataFrame(
        [("k", i, y) for i, y in enumerate(ys)], ["k", "t", "y"]
    )
    out = holt_winters(df, ["k"], "t", "y", period=7, qscale=1000).collect()[0]
    l, b, s_head = _hw_python(qys, 7)
    assert out["n_points"] == len(ys)
    assert (out["level_q"], out["trend_q"], out["season_next_q"]) == (l, b, s_head)
    assert out["forecast_next_q"] == l + b + s_head


def test_holt_winters_single_point_and_nulls(spark):
    df = spark.createDataFrame(
        [("k", 0, 5), ("k", None, 7), ("k", 2, None)], ["k", "t", "y"]
    )
    out = holt_winters(df, ["k"], "t", "y", period=3, qscale=10).collect()[0]
    # only the (0, 5) point survives: level = 50, no trend, zero ring
    assert (out["n_points"], out["level_q"], out["trend_q"]) == (1, 50, 0)
    assert out["season_next_q"] == 0 and out["forecast_next_q"] == 50


def test_holt_winters_periodic_series_learns_season(spark):
    # strict period-2 alternation: the period-2 model's seasonal ring
    # must split the high/low phases with opposite signs
    ys = [0, 100] * 8
    df = spark.createDataFrame(
        [("k", i, y) for i, y in enumerate(ys)], ["k", "t", "y"]
    )
    out = holt_winters(df, ["k"], "t", "y", period=2, qscale=1).collect()[0]
    py = _hw_python(ys, 2)
    assert (out["level_q"], out["trend_q"], out["season_next_q"]) == py


def test_holt_winters_validation(spark):
    df = spark.createDataFrame([("k", 0, 1)], ["k", "t", "y"])
    with pytest.raises(ValueError):
        holt_winters(df, ["k"], "t", "y", period=1)
    with pytest.raises(ValueError):
        holt_winters(df, ["k"], "t", "y", qscale=0)


# --- Matryoshka recall -----------------------------------------------------------


def test_matryoshka_recall_hand_computed(spark):
    # corpus vectors: c1 wins on the prefix dim, c2 wins on the tail;
    # with k=1 the prefix ranking picks c1, the full ranking picks c2
    # -> recall 0; with prefix covering both dims -> recall 1
    rows = [
        (100, [1.0, 0.0]),  # query
        (1, [0.9, 0.0]),
        (2, [0.5, 5.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 100)
    c = df.filter(F.col("vec_id") != 100)
    # full: dot(q,c1)=0.9k*1k... milli-quantized; c2 full dot smaller on
    # dim1 but dim2 contributes 0 for the query -> full ranking c1 first
    out = matryoshka_recall(q, c, k=1, prefix_dims=1).collect()[0]
    assert out["recall_ppm"] == 1_000_000  # prefix and full agree here
    # make the full ranking disagree: query has mass on dim 2
    rows2 = [
        (100, [1.0, 1.0]),
        (1, [0.9, 0.0]),   # prefix winner
        (2, [0.5, 5.0]),   # full winner (0.5 + 5.0 > 0.9)
    ]
    df2 = spark.createDataFrame(rows2, ["vec_id", "embedding"])
    out2 = matryoshka_recall(
        df2.filter(F.col("vec_id") == 100),
        df2.filter(F.col("vec_id") != 100),
        k=1,
        prefix_dims=1,
    ).collect()[0]
    assert out2["n_hits"] == 0 and out2["recall_ppm"] == 0


def test_matryoshka_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        matryoshka_recall(df, df, k=0)
    with pytest.raises(ValueError):
        matryoshka_recall(df, df, prefix_dims=0)


# --- chi-square screening ----------------------------------------------------------


def test_chi2_screen_hand_computed(spark):
    # 4 docs: token 'x' appears in both label-1 docs and neither label-0
    # doc -> perfect association, chi2 = n = 4; token 'z' in one of each
    # -> chi2 = 0
    rows = [
        (1, ["x", "z"]),
        (1, ["x"]),
        (0, ["z"]),
        (0, ["w"]),
    ]
    df = spark.createDataFrame(rows, ["label", "tokens"])
    out = {r["token"]: r for r in chi2_screen(df, min_df=1, top_k=10).collect()}
    assert out["x"]["chi2"] == pytest.approx(4.0)
    assert out["x"]["assoc"] == "pos"
    assert out["z"]["chi2"] == pytest.approx(0.0)
    # w: only in a label-0 doc -> negative association
    assert out["w"]["assoc"] == "neg"
    assert out["x"]["pos_docs"] == 2 and out["x"]["neg_docs"] == 0


def test_chi2_screen_presence_not_counts(spark):
    # token repeated many times in ONE doc counts once
    rows = [(1, ["x"] * 50), (0, ["y"])]
    df = spark.createDataFrame(rows, ["label", "tokens"])
    out = {r["token"]: r for r in chi2_screen(df, min_df=1, top_k=10).collect()}
    assert out["x"]["n_docs"] == 1


def test_chi2_screen_min_df_and_validation(spark):
    rows = [(1, ["x", "y"]), (0, ["y"])]
    df = spark.createDataFrame(rows, ["label", "tokens"])
    toks = {r["token"] for r in chi2_screen(df, min_df=2, top_k=10).collect()}
    assert toks == {"y"}
    with pytest.raises(ValueError):
        chi2_screen(df, min_df=0)


# --- forward as-of join ---------------------------------------------------------------


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [("u", 5, "l1"), ("u", 10, "l2"), ("u", 99, "l3"), ("v", 1, "l4")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [("u", 10, "r10"), ("u", 20, "r20"), ("v", 0, "r0")],
        ["k", "ts", "rv"],
    )
    out = {
        r["lv"]: (r["ts_r"], r["rv"])
        for r in asof_join_forward(left, right, on="ts", by="k").collect()
    }
    assert out["l1"] == (10, "r10")   # earliest at-or-after 5
    assert out["l2"] == (10, "r10")   # tie at equal timestamps matches
    assert out["l3"] == (None, None)  # nothing after 99
    assert out["l4"] == (None, None)  # v's only right row is BEFORE 1
    # inner drops the unmatched rows
    inner = asof_join_forward(left, right, on="ts", by="k", how="inner")
    assert {r["lv"] for r in inner.collect()} == {"l1", "l2"}


def test_asof_forward_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [("u", None, "l1")], "k string, ts bigint, lv string"
    )
    right = spark.createDataFrame([("u", 7, "r7")], ["k", "ts", "rv"])
    out = asof_join_forward(left, right, on="ts", by="k").collect()[0]
    assert out["ts_r"] is None and out["rv"] is None


def test_asof_forward_validation(spark):
    df = spark.createDataFrame([("u", 1, "x")], ["k", "ts", "v"])
    with pytest.raises(ValueError):
        asof_join_forward(df, df, on="ts", how="full")


# --- epoch upsampling --------------------------------------------------------------------


def test_epochs_upsample_full_and_partial(spark):
    # stratum 'a': 3 docs x 2 tokens = 6 available, target 15 ->
    # 2 full epochs + remainder 3 -> the first md5-ordered doc (2 tokens
    # fits 3) gets an extra replica, the second does not (4 > 3)
    rows = [
        (1, "a", "t t"),
        (2, "a", "t t"),
        (3, "a", "t t"),
        (4, "b", "t t"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = epochs_upsample(df, ["lang"], {"a": 15, "b": 2}, id_col="doc_id").collect()
    a = [r for r in out if r["lang"] == "a"]
    assert all(r["full_epochs"] == 2 for r in a)
    assert sum(r["extra_replica"] for r in a if r["epoch"] == 0) == 1
    # every 'a' doc appears in epochs 0 and 1; exactly one also in epoch 2
    per_epoch = {}
    for r in a:
        per_epoch.setdefault(r["epoch"], set()).add(r["doc_id"])
    assert per_epoch[0] == {1, 2, 3} and per_epoch[1] == {1, 2, 3}
    assert len(per_epoch[2]) == 1
    # 'b': target == available -> exactly 1 full epoch, no partial
    b = [r for r in out if r["lang"] == "b"]
    assert {(r["doc_id"], r["epoch"]) for r in b} == {(4, 0)}


def test_epochs_upsample_downsampling_degenerates_to_mixture(spark):
    # target < available: 0 full epochs, admission = the mixture rule
    rows = [(i, "a", "t t t") for i in range(1, 6)]  # 5 docs x 3 = 15
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = epochs_upsample(df, ["lang"], {"a": 7}, id_col="doc_id").collect()
    assert all(r["epoch"] == 0 and r["full_epochs"] == 0 for r in out)
    # 7 div 3 = 2 docs fit the budget in md5 order
    assert len(out) == 2


def test_epochs_upsample_unlisted_stratum_excluded(spark):
    df = spark.createDataFrame([(1, "zz", "t")], ["doc_id", "lang", "text"])
    assert epochs_upsample(df, ["lang"], {"a": 10}).count() == 0


# --- seasonal / trend strength ---------------------------------------------------------


def test_seasonal_strength_contrasts(spark):
    from opteryx_spark.operators.timeseries import seasonal_strength

    # strict period-2 alternation, no trend: seasonal strength near 1e6,
    # trend strength near 0 after the seasonal variance is removed
    seasonal_rows = [("s", t, 100 + 80 * (t % 2)) for t in range(20)]
    # clean linear ramp: trend strength near 1e6, seasonal near 0
    trend_rows = [("t", t, 10 * t) for t in range(20)]
    df = spark.createDataFrame(seasonal_rows + trend_rows, ["k", "d", "v"])
    out = {
        r["k"]: r
        for r in seasonal_strength(
            df, ["k"], "d", "v", period=2, half_window=2, qscale=1000
        ).collect()
    }
    assert out["s"]["seasonal_strength_ppm"] > 800_000
    assert out["t"]["trend_strength_ppm"] > 900_000
    assert out["t"]["seasonal_strength_ppm"] < out["t"]["trend_strength_ppm"]
    assert out["s"]["n_points"] == 20


def test_seasonal_strength_constant_series_null(spark):
    from opteryx_spark.operators.timeseries import seasonal_strength

    df = spark.createDataFrame([("k", t, 5) for t in range(10)], ["k", "d", "v"])
    out = seasonal_strength(df, ["k"], "d", "v", period=2).collect()[0]
    # constant series: all variances 0 -> strengths NULL, not 1e6
    assert out["var_resid_n"] == 0
    assert out["seasonal_strength_ppm"] is None
    assert out["trend_strength_ppm"] is None


# --- time-decay attribution --------------------------------------------------------------


def test_decay_attribution_hand_computed(spark):
    import datetime as dt

    from opteryx_spark.operators.events import decay_attribution

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ts(days_before):
        return t0 - dt.timedelta(days=days_before)

    rows = [
        # user u: purchase value 2.0 with two touches: click 0 days old
        # (w = 2^3 = 8), view 1 day old (w = 2^2 = 4); total w = 12
        ("u", 1, "view", None, ts(1)),
        ("u", 2, "click", None, ts(0.5)),
        ("u", 3, "purchase", 2.0, ts(0)),
        # user v: purchase 1.0 with NO touch in the 3-day lookback
        ("v", 4, "view", None, ts(10)),
        ("v", 5, "purchase", 1.0, ts(0)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, value double, ts timestamp"
    )
    out = {r["channel"]: (r["n_touches"], r["credited_milli"])
           for r in decay_attribution(df).collect()}
    # click: 2000 * 8 div 12 = 1333 ; view: 2000 * 4 div 12 = 666
    assert out["click"] == (1, 1333)
    assert out["view"] == (1, 666)
    assert out["direct"] == (1, 1000)


def test_decay_attribution_validation(spark):
    import datetime as dt

    from opteryx_spark.operators.events import decay_attribution

    df = spark.createDataFrame(
        [("u", 1, "view", 1.0, dt.datetime(2024, 1, 1))],
        "user_id string, event_id long, event_type string, value double, ts timestamp",
    )
    with pytest.raises(ValueError):
        decay_attribution(df, lookback_days=0)


# --- session dwell / bounce -----------------------------------------------------------------


def test_session_dwell_summary(spark):
    import datetime as dt

    from opteryx_spark.operators.events import session_dwell_summary

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user u: one 2-event session lasting 60s, then (after 2h) a bounce
        ("u", 1, t0),
        ("u", 2, t0 + dt.timedelta(seconds=60)),
        ("u", 3, t0 + dt.timedelta(hours=2)),
        # user v: a single bounce
        ("v", 4, t0),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")
    out = session_dwell_summary(df, gap_minutes=30).collect()[0]
    assert out["n_sessions"] == 3 and out["n_bounces"] == 2
    assert out["bounce_ppm"] == (2 * 1_000_000) // 3
    assert out["total_dwell_us"] == 60_000_000
    assert out["avg_dwell_us"] == 60_000_000 // 3


# --- stratified k-fold -----------------------------------------------------------------------


def test_stratified_kfold_balance_and_determinism(spark):
    from opteryx_spark.operators.scale import stratified_kfold

    rows = [(i, "a" if i % 3 else "b") for i in range(101)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_kfold(df, ["lang"], k=5).collect()
    from collections import Counter

    per = Counter((r["lang"], r["fold"]) for r in out)
    for lang in ("a", "b"):
        sizes = [per[(lang, f)] for f in range(5)]
        assert max(sizes) - min(sizes) <= 1   # exactly balanced
    # partitioning-invariant
    out2 = stratified_kfold(df.repartition(7), ["lang"], k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    with pytest.raises(ValueError):
        stratified_kfold(df, ["lang"], k=1)


# --- reciprocity --------------------------------------------------------------------------------


def test_reciprocity_hand_computed(spark):
    from opteryx_spark.operators.web import reciprocity

    # edges: 1->2 and 2->1 (reciprocal pair), 1->3 (one-way), 4->4
    # (self-loop dropped), duplicate 1->2 (collapsed)
    rows = [(1, 2), (2, 1), (1, 3), (4, 4), (1, 2)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = reciprocity(df).collect()[0]
    assert out["n_edges"] == 3 and out["n_reciprocal"] == 2
    assert out["reciprocity_ppm"] == (2 * 1_000_000) // 3


def test_reciprocity_empty_graph_null(spark):
    from opteryx_spark.operators.web import reciprocity

    df = spark.createDataFrame([(1, 1)], ["src", "dst"])  # only a self-loop
    out = reciprocity(df).collect()[0]
    assert out["n_edges"] == 0 and out["reciprocity_ppm"] is None


# --- inter-event-time histogram -------------------------------------------------------------------


def test_inter_event_histogram_buckets(spark):
    import datetime as dt

    from opteryx_spark.operators.events import inter_event_histogram

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user u, type a: gaps of 0s, 1s, 3s, 7s -> buckets
        # floor(log2(g+1)) = 0, 1, 2, 3
        ("u", "a", 1, t0),
        ("u", "a", 2, t0),
        ("u", "a", 3, t0 + dt.timedelta(seconds=1)),
        ("u", "a", 4, t0 + dt.timedelta(seconds=4)),
        ("u", "a", 5, t0 + dt.timedelta(seconds=11)),
        # type boundary: no cross-type gaps
        ("u", "b", 6, t0 + dt.timedelta(seconds=100)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, event_id long, ts timestamp"
    )
    out = {(r["event_type"], r["bucket"]): (r["n_gaps"], r["min_gap_s"], r["max_gap_s"])
           for r in inter_event_histogram(df).collect()}
    assert out[("a", 0)] == (1, 0, 0)
    assert out[("a", 1)] == (1, 1, 1)
    assert out[("a", 2)] == (1, 3, 3)
    assert out[("a", 3)] == (1, 7, 7)
    assert not any(k[0] == "b" for k in out)  # single event: no gap


# --- review fixes (round-9 code review) ------------------------------------------------------


def test_epochs_upsample_null_stratum_kept(spark):
    # NULL strata must quota together under default_target like any
    # unlisted stratum (token_mixture_sample convention) — the stratum
    # totals ride a window, not a NULL-dropping equi-join
    rows = [(1, None, ""), (2, "en", "t t")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = epochs_upsample(df, ["lang"], {"en": 2}, id_col="doc_id").collect()
    got = {(r["doc_id"], r["lang"], r["epoch"]) for r in out}
    # en doc: one full epoch; NULL-lang zero-token doc: admitted into the
    # target-0 partial epoch (0 + 0 <= 0), exactly as the SQL oracle says
    assert (2, "en", 0) in got
    assert (1, None, 0) in got


def test_decay_attribution_per_user_event_ids(spark):
    import datetime as dt

    from opteryx_spark.operators.events import decay_attribution

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    # event ids restart per user: both purchases have event_id=7; each
    # user has ONE touch, so each touch must get the FULL credit —
    # a _cid-only window would pool the weights and halve both
    rows = [
        ("a", 1, "click", None, t0 - dt.timedelta(hours=1)),
        ("a", 7, "purchase", 1.0, t0),
        ("b", 2, "view", None, t0 - dt.timedelta(hours=2)),
        ("b", 7, "purchase", 3.0, t0),
        # user c: conversion with id=7 and NO touches -> 'direct'
        ("c", 7, "purchase", 5.0, t0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, value double, ts timestamp"
    )
    out = {r["channel"]: (r["n_touches"], r["credited_milli"])
           for r in decay_attribution(df).collect()}
    assert out["click"] == (1, 1000)
    assert out["view"] == (1, 3000)
    assert out["direct"] == (1, 5000)


def test_matryoshka_short_vector_raises(spark):
    rows = [(0, [1.0, 2.0]), (1, [2.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0)
    c = df.filter(F.col("vec_id") != 0)
    with pytest.raises(Exception, match="prefix_dims"):
        matryoshka_recall(q, c, k=1, prefix_dims=16).collect()


def test_matryoshka_short_QUERY_vector_raises(spark):
    # ADVICE r9: the dim guard must be symmetric — a query vector shorter
    # than prefix_dims would zip_with-pad with NULLs, NULL the prefix dot
    # for every pair, and silently degrade the prefix ranking to c_id order
    q = spark.createDataFrame([(0, [1.0, 2.0])], ["vec_id", "embedding"])
    c = spark.createDataFrame(
        [(1, [2.0, 1.0, 3.0]), (2, [0.5, 0.5, 0.5])], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="prefix_dims"):
        matryoshka_recall(q, c, k=1, prefix_dims=3).collect()


def test_decay_attribution_null_conversion_id_excluded(spark):
    # ADVICE r9: NULL-id conversions were double-counted (pooled into one
    # weight window via the user join AND re-credited to 'direct' by the
    # never-NULL-matching anti-join).  Contract: NULL-id conversions are
    # excluded, like NULL users/timestamps.
    import datetime as dt

    from opteryx_spark.operators.events import decay_attribution

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        ("a", 1, "click", None, t0 - dt.timedelta(hours=1)),
        ("a", None, "purchase", 1.0, t0),          # NULL id: excluded
        ("a", 7, "purchase", 2.0, t0),             # real conversion
        ("b", None, "purchase", 5.0, t0),          # NULL id, no touches
    ]
    df = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, value double, ts timestamp",
    )
    out = {r["channel"]: (r["n_touches"], r["credited_milli"])
           for r in decay_attribution(df).collect()}
    # only the id=7 conversion credits its touch; total credited == 2000,
    # no 'direct' row (NULL-id conversions vanish, not re-credited)
    assert out == {"click": (1, 2000)}
