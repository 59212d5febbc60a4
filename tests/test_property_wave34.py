"""Randomized property checks for the wave-34 integer-exact operators:
Holt linear smoothing, hop distances, silhouette, and calibration bins
against straight-line Python references — seeded random inputs cover
combinations the fixed fixtures and SQL oracles can't (they share blind
spots with the fixture generator)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from opteryx_spark.operators.features import calibration_bins
from opteryx_spark.operators.similarity import silhouette_lite
from opteryx_spark.operators.timeseries import holt_linear
from opteryx_spark.operators.web import hop_distances


def _tdiv(x: int, d: int) -> int:  # truncate toward zero
    q = abs(x) // d
    return q if x >= 0 else -q


def _ref_holt(values: list[int], q: int = 1000):
    lv, b = values[0] * q, 0
    for y in values[1:]:
        nl = _tdiv(y * q + lv + b, 2)
        b = _tdiv((nl - lv) + b, 2)
        lv = nl
    return lv, b


def test_holt_matches_python_reference(spark):
    rng = random.Random(3407)
    rows, want = [], {}
    for k in range(8):
        n = rng.randint(1, 12)
        vals = [rng.randint(-50, 200) for _ in range(n)]
        for t, v in enumerate(vals):
            rows.append((f"k{k}", t, v))
        want[f"k{k}"] = _ref_holt(vals)
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {
        r["k"]: (r["level_q"], r["trend_q"])
        for r in holt_linear(df, ["k"], "t", "v").collect()
    }
    assert got == want


def _ref_hops(edges, seeds, rounds):
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for n, d in dist.items():
            for m in nbrs.get(n, ()):
                if m not in nxt or d + 1 < nxt[m]:
                    nxt[m] = d + 1
        dist = nxt
    return dist


def test_hop_distances_matches_python_reference(spark):
    rng = random.Random(98)
    edges = [(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(40)]
    seeds = sorted({rng.randint(0, 25) for _ in range(3)})
    # restrict seeds to graph nodes, like the suite entry does
    nodes = {x for e in edges if e[0] != e[1] for x in e}
    seeds = [s for s in seeds if s in nodes] or [next(iter(nodes))]
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {r["node"]: r["hops"] for r in hop_distances(df, sdf, 3).collect()}
    assert got == _ref_hops(edges, seeds, 3)


def _ref_silhouette(rows, q=1000):
    import math

    pts = [(i, l, [math.floor(x * q) for x in v]) for i, l, v in rows]
    cents = {}
    for _, l, qv in pts:
        n, s = cents.get(l, (0, [0] * len(qv)))
        cents[l] = (n + 1, [a + b for a, b in zip(s, qv)])
    cv = {l: [_tdiv(x, n) for x in s] for l, (n, s) in cents.items()}
    out = {}
    for _, l, qv in pts:
        d2 = {
            cl: sum((a - b) * (a - b) for a, b in zip(qv, c)) for cl, c in cv.items()
        }
        a2 = d2[l]
        others = [v for cl, v in d2.items() if cl != l]
        if not others:
            s_ppm = None
        else:
            b2 = min(others)
            s_ppm = 0 if max(a2, b2) == 0 else _tdiv((b2 - a2) * 1_000_000, max(a2, b2))
        n, tot, cnt = out.get(l, (0, 0, 0))
        out[l] = (n + 1, tot + (s_ppm or 0), cnt + (s_ppm is not None))
    return {
        l: (n, _tdiv(tot, cnt) if cnt else None) for l, (n, tot, cnt) in out.items()
    }


def test_silhouette_matches_python_reference(spark):
    rng = random.Random(777)
    rows = [
        (i, rng.randint(0, 3), [rng.uniform(-2, 2) for _ in range(5)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = {
        r["label"]: (r["n_vecs"], r["mean_s_ppm"])
        for r in silhouette_lite(df, dim=5).collect()
    }
    assert got == _ref_silhouette(rows)


def test_calibration_matches_python_reference(spark):
    rng = random.Random(12)
    rows = [(rng.randint(0, 1_000_000), rng.randint(0, 1)) for _ in range(200)]
    df = spark.createDataFrame(rows, ["s", "y"])
    ref = {}
    for s, y in rows:
        b = min(9, (s * 10) // 1_000_000)
        n, ss, sy = ref.get(b, (0, 0, 0))
        ref[b] = (n + 1, ss + s, sy + y)
    want = {
        b: (n, ss // n, (sy * 1_000_000) // n, abs(ss // n - (sy * 1_000_000) // n))
        for b, (n, ss, sy) in ref.items()
    }
    got = {
        r["bin"]: (r["n"], r["conf_ppm"], r["acc_ppm"], r["gap_ppm"])
        for r in calibration_bins(df, "s", "y", n_bins=10).collect()
    }
    assert got == want
