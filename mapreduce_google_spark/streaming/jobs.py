"""Structured Streaming surface.

The reference is batch-only (jobs from a FIFO queue, SURVEY.md §2c); the
new engine adds the streaming counterparts of the event-time operators so
the same logic runs over a live stream: file source → watermark → windowed
aggregation → sink. Batch parity is asserted by tests
(`tests/test_streaming.py`): a ``Trigger.AvailableNow`` run over the events
table must reproduce the batch operator's result.

At production scale the file source is swapped for Kafka (same plan after
the source exchange); state stores are RocksDB-backed and watermarks bound
state size — the session-window state per user is O(open sessions), not
O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_google_spark.io import load_table
from mapreduce_google_spark.operators.events import TS_FMT


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table.

    Schema comes from the batch reader (streams can't infer), with the same
    nanos→µs timestamp normalization as :func:`io.load_table`.
    """
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_window_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming T15: 1-hour tumbling windows with a late-data watermark.

    Late rows beyond the watermark are dropped; in ``availableNow`` replay
    over a static table nothing is late, so the result equals the batch
    operator (asserted in tests).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming T16: native ``session_window`` sessionization.

    State per user = currently-open session windows; the watermark closes
    sessions and evicts state, so memory is bounded by active users, not
    history.
    """
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT).alias("session_start"),
            "n_events",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Replay the whole source with Trigger.AvailableNow into a memory sink
    and return the materialized result (batch-parity harness)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: keep the first arrival of each
    key, dropping re-deliveries that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` is the at-least-once → effectively-
    once repair stage every production event pipeline needs (Kafka
    redelivery, producer retries). State = one entry per key seen within
    the watermark window, evicted as event time advances — bounded by
    arrival rate × horizon, NOT by stream history, which is what makes it
    runnable forever at 100 TB/day. Batch parity: over a static replay the
    result is exactly ``dropDuplicates(keys)``.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T49 — end-to-end streaming dedup over a doubled source: the events
    table is written twice (two files = simulated redelivery), streamed
    with :func:`dedup_stream`, and the deduped rows are aggregated per
    event_type. The result must equal the plain batch counts of the
    ORIGINAL table — the oracle the driver checks.
    """
    import os
    import re

    tag = re.sub(r"[^a-z0-9]+", "_", os.path.basename(sf_dir.rstrip("/")).lower())
    doubled = f"/tmp/mgs_doubled_events_{tag}"
    if not os.path.exists(os.path.join(doubled, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        ev.union(ev).repartition(4).write.mode("overwrite").parquet(doubled)
    schema = spark.read.parquet(doubled).schema
    stream = spark.readStream.schema(schema).parquet(doubled)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = dedup_stream(stream, keys=["event_id"])
    sink = run_available_now(
        deduped, f"t49_dedup_{tag}", output_mode="append"
    )
    return (
        sink.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count_distinct("event_id").cast("long").alias("n_unique"),
        )
        .orderBy("event_type")
    )
