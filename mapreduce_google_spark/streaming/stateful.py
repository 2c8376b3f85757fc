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
    StringType,
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


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class _UserEventCounter(StatefulProcessor):
    """StatefulProcessor for :func:`tws_user_event_counts` — defined at
    module scope so it pickles cleanly to executors."""

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._count = handle.getValueState("count", "n BIGINT")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in rows)
        prev = self._count.get()
        total = (prev[0] if prev is not None else 0) + n
        self._count.update((total,))
        # emit the DELTA: sink-side sums stay correct however the source
        # splits into micro-batches (cumulative emissions would not)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_delta": [n], "n_total": [total]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def tws_user_event_counts(stream: DataFrame) -> DataFrame:
    """Per-user running event counter via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state API (typed state variables, timers, TTL)
    that supersedes ``applyInPandasWithState``.

    ValueState holds one long per user: O(keys) state, RocksDB-backed in
    production, TTL-evictable via ``getValueState(..., ttlDurationMs=)``
    when keys churn. Emitting per-batch deltas (not cumulative totals)
    makes the downstream sum invariant to how the source splits into
    micro-batches — the same at-least-once-friendly shape as a combiner.

    Runtime note: the TWS state-server protocol needs ``protobuf``;
    clusters without it (like this test container) can't execute the
    operator — the parity test import-skips there and runs wherever
    protobuf exists. Declaration/plan construction work regardless.
    """
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserEventCounter(),
        outputStructType="user_id bigint, n_delta bigint, n_total bigint",
        outputMode="Update",
        timeMode="None",
    )


DEBOUNCE_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("n_kept", LongType()),
        StructField("n_dropped", LongType()),
    ]
)

DEBOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_kept", LongType()),
        StructField("n_dropped", LongType()),
    ]
)

DEBOUNCE_GAP_US = 60 * 1_000_000


def _debounce(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(user, type) debounce state machine: an event is dropped when
    it arrives within the gap of the previous RAW event (same lag-based
    semantics as the batch operator t131, so parity is exact)."""
    user_id, event_type = key
    if state.exists:
        last_us, kept, dropped = state.get
    else:
        last_us, kept, dropped = -1, 0, 0
    pairs = sorted(
        (int(t), int(e)) for pdf in pdfs for t, e in zip(pdf["ts_us"], pdf["event_id"])
    )
    for t, _eid in pairs:
        if last_us >= 0 and t - last_us < DEBOUNCE_GAP_US:
            dropped += 1
        else:
            kept += 1
        last_us = t
    state.update((last_us, kept, dropped))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_type": [event_type],
            "n_kept": [kept],
            "n_dropped": [dropped],
        }
    )


def debounce_stateful(events: DataFrame) -> DataFrame:
    """events stream → per-(user, type) cumulative kept/dropped debounce
    counts, updated each micro-batch (``update``-mode sink).

    The streaming half of t131: unbounded state is avoided because the
    state per key is three longs — the 100 TB-stream shape for
    dedup-adjacent hygiene operators (state size is O(keys), never
    O(events))."""
    from pyspark.sql import functions as F

    with_us = events.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
    )
    return with_us.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
