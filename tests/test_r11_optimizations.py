"""Focused pins for the r11 operator restructures.

Each optimization in OPTIMIZATION_r11.md that changed an operator's
internals (named-column lag taps, two-step explode, named-hash bloom
positions, persisted self-join inputs) is pinned here against an
independent driver-side Python reference on randomized small frames —
so a future refactor cannot silently change semantics even where the
fixtures' oracle entries would not exercise the edge.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _rand_rows(seed, n=200, users=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.randrange(users),
                f"2024-01-{rng.randrange(1, 28):02d} {rng.randrange(24):02d}:{rng.randrange(60):02d}:00",
                round(rng.uniform(-5, 5), 3),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [1, 2])
def test_ewma_named_taps_match_python_reference(spark, seed):
    """The r11 named-lag-column rewrite must equal the definitional EWMA:
    k-th most recent of the previous W values weighs 2^(W-k)."""
    from opteryx_spark.operators import events

    W = 5
    rows = _rand_rows(seed)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_id"]: (r["n_prior"], r["ewma"])
        for r in events.ewma_features(df, window_rows=W).collect()
    }
    # python reference: sort per user by (ts, event_id), trailing window
    by_user: dict = {}
    for eid, uid, ts, val in rows:
        by_user.setdefault(uid, []).append((ts, eid, math.floor(val * 1000)))
    for uid, evs in by_user.items():
        evs.sort()
        for idx, (_, eid, _x) in enumerate(evs):
            prior = evs[max(0, idx - W) : idx]
            taps = [x for _, _, x in reversed(prior)]  # most recent first
            num = sum(x * (1 << (W - k)) for k, x in enumerate(taps, start=1))
            den = sum((1 << (W - k)) for k in range(1, len(taps) + 1))
            exp = (len(taps), (num / den) if den else None)
            assert out[eid] == exp, f"event {eid}: {out[eid]} != {exp}"


def test_postings_index_matches_python_reference(spark):
    """Two-step explode rewrite: tf/dl per (term, doc) unchanged, and dl
    is the doc's FULL token count (not per-term)."""
    from opteryx_spark.operators import retrieval

    docs = [(1, "a b a c"), (2, ""), (3, None), (4, "x  x"), (5, "a")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in retrieval.postings_index(df).collect()
    }
    exp = {}
    for did, text in docs:
        if not text:
            continue
        toks = [t for t in text.split(" ") if t != ""]
        for t in set(toks):
            exp[(t, did)] = (toks.count(t), len(toks))
    assert got == exp


def test_bloom_named_hash_no_false_negatives_and_positions(spark):
    """Named-column base hash: positions unchanged (k distinct-row table)
    and every indexed key still hits (no false negatives)."""
    from opteryx_spark.operators import dedup

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(50)] + [(None,)], "k string"
    )
    pos = dedup.bloom_positions(keys, "k", m_bits=4096, k=5)
    npos = pos.count()
    assert 0 < npos <= 50 * 5
    flagged = dedup.bloom_prefilter(keys, pos, "k", m_bits=4096, k=5)
    rows = {r["k"]: r["bloom_hit"] for r in flagged.collect()}
    assert all(rows[f"key-{i}"] for i in range(50))
    assert rows[None] is False  # NULL keys miss by contract


def test_lsh_cosine_pairs_norm_precompute_matches_bruteforce(spark):
    """Persisted-bucket + per-row-norm rewrite: every reported pair's
    cosim equals the sequential-fold cosine recomputed in Python."""
    from opteryx_spark.operators import similarity
    from opteryx_spark.operators.dedup import release_text_group_caches

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.lsh_cosine_pairs(
        df, threshold=0.2, bands=2, planes_per_band=2, dim=8, seed=3
    ).collect()
    release_text_group_caches()
    vecs = {i: v for i, v in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (float(x) * float(y))
        return acc

    assert got, "LSH with 2x2 bands over 60 vecs must produce pairs"
    for r in got:
        a = [float(x) for x in spark.createDataFrame([(vecs[r["id1"]],)], "v array<float>").collect()[0]["v"]]
        b = [float(x) for x in spark.createDataFrame([(vecs[r["id2"]],)], "v array<float>").collect()[0]["v"]]
        exp = fold_dot(a, b) / (math.sqrt(fold_dot(a, a)) * math.sqrt(fold_dot(b, b)))
        assert r["cosim"] == exp
        assert r["cosim"] >= 0.2
