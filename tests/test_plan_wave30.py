"""Physical-plan assertions for the wave-30/31/32/33 operators: the
100 TB scale claims their docstrings make, pinned so a refactor that
silently adds a shuffle (or a corpus-sized sort) fails here before it
costs anything on a cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.operators.events import interval_coverage, path_ngrams
from opteryx_spark.operators.profile import weighted_median
from opteryx_spark.operators.text import lexical_diversity, script_profile
from opteryx_spark.plans import explain_text


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"tok{i % 3} tok{i % 5} alpha") for i in range(20)],
        ["doc_id", "text"],
    )


def test_script_profile_map_only(spark):
    # pure regexp length arithmetic: no Exchange at any scale
    assert "Exchange" not in explain_text(script_profile(_docs(spark)))


def test_lexical_diversity_map_only(spark):
    # the zero-shuffle claim: counts fall out of per-row sorted-array
    # neighbor comparisons — no explode, no groupBy, no Exchange
    assert "Exchange" not in explain_text(lexical_diversity(_docs(spark)))


def test_interval_coverage_single_key_exchange(spark):
    # one window + two aggregates, ALL on the key hash partitioning:
    # exactly one data Exchange
    df = spark.createDataFrame(
        [("u", i * 10, i * 10 + 15) for i in range(10)], ["k", "s", "e"]
    )
    import re

    text = explain_text(interval_coverage(df, ["k"], "s", "e"))
    assert len(re.findall(r"^\(\d+\) Exchange", text, re.M)) == 1


def test_path_ngrams_single_window_sort(spark):
    # both leads share ONE window sort; the count aggregate adds the
    # only other exchange
    df = spark.createDataFrame(
        [("u", i, i, "a") for i in range(10)], ["u", "t", "id", "et"]
    )
    import re

    text = explain_text(path_ngrams(df, "u", "t", "et", n=3, tiebreak_col="id"))
    assert len(re.findall(r"^\(\d+\) Window", text, re.M)) == 1


def test_weighted_median_no_global_sort(spark):
    # key-partitioned windows only — a global Sort (range partitioning)
    # would be a scale killer
    df = spark.createDataFrame(
        [("g", i, 1) for i in range(10)], ["k", "v", "w"]
    )
    text = explain_text(weighted_median(df, ["k"], "v", "w"))
    assert "rangepartitioning" not in text.lower()
