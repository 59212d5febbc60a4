"""Interleaved A/B for the r11 _portable_hash_expr linear-fold rewrite.

Part 1 — micro-benchmark: fold 200k 32-char md5 keys with the NEW
split-based fold vs the retained substr-per-position REFERENCE, plus a
short-token (shingle-length) variant, interleaved in ONE session.

Part 2 — entry-level A/B: time the hash-consuming bench entries with the
new fold, then monkeypatch the reference fold back in (dedup module attr
covers the function-level importers profile/filtering/streaming and
dedup's own globals; features imports at module level and is patched
separately) and time again, interleaved N rounds.

Usage: python tools/ab_portable_hash.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from opteryx_spark.operators import dedup, features
    from opteryx_spark.operators.dedup import (
        _portable_hash_expr,
        _portable_hash_expr_reference,
    )
    from opteryx_spark.session import get_session
    from opteryx_spark.suite import load_all

    spark = get_session(app_name="ab-portable-hash")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- Part 1: micro-bench -------------------------------------------
    base = spark.range(200_000).select(
        F.md5(F.col("id").cast("string")).alias("k32"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 12).alias("k12"),
    )
    base = base.persist()
    base.count()

    def t(expr_fn, col, reps=5):
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            base.select(expr_fn(F.col(col)).alias("h")).agg(
                F.sum("h")
            ).collect()
            out.append(time.perf_counter() - t0)
        return out

    for col in ("k32", "k12"):
        # warm both
        t(_portable_hash_expr, col, 1)
        t(_portable_hash_expr_reference, col, 1)
        new_s, ref_s = [], []
        for _ in range(4):
            new_s += t(_portable_hash_expr, col, 2)
            ref_s += t(_portable_hash_expr_reference, col, 2)
        print(
            f"micro {col}: new med {statistics.median(new_s):.3f}s "
            f"ref med {statistics.median(ref_s):.3f}s "
            f"(new {sorted(round(x, 3) for x in new_s)}, "
            f"ref {sorted(round(x, 3) for x in ref_s)})",
            flush=True,
        )
    base.unpersist()

    # ---- Part 2: entry-level interleaved A/B ---------------------------
    reg = load_all()
    entries = [
        "dedup_bloom_prefilter",
        "agg_hll_portable",
        "agg_cms_token_counts",
        "feat_hashed_tokens",
        "dedup_minhash_lsh_portable",
        "sample_split_no_leakage",
    ]

    def run_entry(name):
        spark.sparkContext.setJobDescription(f"ab: {name}")
        t0 = time.perf_counter()
        reg[name].spark(spark, sf).collect()
        return time.perf_counter() - t0

    def set_impl(fn):
        dedup._portable_hash_expr = fn
        features._portable_hash_expr = fn

    results = {n: {"new": [], "ref": []} for n in entries}
    # warm once with new
    for n in entries:
        run_entry(n)
    for _ in range(4):
        for label, fn in (
            ("new", _portable_hash_expr),
            ("ref", _portable_hash_expr_reference),
        ):
            set_impl(fn)
            for n in entries:
                results[n][label].append(run_entry(n))
    set_impl(_portable_hash_expr)
    for n in entries:
        nn = results[n]["new"]
        rr = results[n]["ref"]
        print(
            f"entry {n}: new med {statistics.median(nn):.2f}s "
            f"ref med {statistics.median(rr):.2f}s "
            f"(new {sorted(round(x, 2) for x in nn)}, "
            f"ref {sorted(round(x, 2) for x in rr)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
