"""Structured Streaming extension: batch-equivalence via availableNow.

The streaming rollup drained with trigger(availableNow) must produce the
same rows as the batch ``events_hourly_rollup`` suite entry — streaming
and batch are two executions of one logical pipeline.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from opteryx_spark import streaming
from opteryx_spark.suite import load_all


def test_hourly_rollup_stream_matches_batch(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="oxs_stream_out")
    ckpt = tempfile.mkdtemp(prefix="oxs_stream_ckpt")
    src = tempfile.mkdtemp(prefix="oxs_stream_src")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "events.parquet"))
    try:
        events = streaming.read_events_stream(spark, src)
        rollup = streaming.hourly_rollup_stream(events)
        streaming.run_stream_once(rollup, out, ckpt)

        got = spark.read.parquet(out)
        want = load_all()["events_hourly_rollup"].spark(spark, sf_dir)
        got_rows = {tuple(r) for r in got.collect()}
        want_rows = {tuple(r) for r in want.collect()}
        # append-mode emits only watermark-closed windows; every emitted row
        # must match batch, and most windows must have been emitted
        assert got_rows <= want_rows
        assert len(got_rows) >= len(want_rows) - 24  # at most the last day open
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)


def test_sessionize_runs(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("oxs_sess_src"))
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "events.parquet"))
    events = streaming.read_events_stream(spark, src)
    sess = streaming.sessionize(events)
    assert set(sess.columns) == {
        "session_start",
        "session_end",
        "user_id",
        "n_events",
        "session_value",
    }
    assert sess.isStreaming
