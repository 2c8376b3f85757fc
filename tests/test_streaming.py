"""Batch ↔ streaming parity: the Structured Streaming jobs replayed with
Trigger.AvailableNow must reproduce the batch event-time operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_google_spark.operators.events import (
    session_window_stats,
    tumbling_window_counts,
)
from mapreduce_google_spark.streaming.jobs import (
    read_events_stream,
    run_available_now,
    session_window_stream,
    tumbling_window_stream,
)


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_available_now(tumbling_window_stream(stream), "t15_stream")
    want = tumbling_window_counts(spark, sf_dir)
    assert _rows(got, "bucket_start", "event_type") == _rows(
        want, "bucket_start", "event_type"
    )


def test_session_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_available_now(session_window_stream(stream), "t16_stream")
    # streaming emits (user, session_start, n_events); roll up to the batch
    # operator's per-user grain and compare sessions + event counts
    got_user = (
        got.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
    )
    want = session_window_stats(spark, sf_dir).select(
        "user_id", "n_sessions", "n_events"
    )
    assert _rows(got_user, "user_id") == _rows(want, "user_id")
