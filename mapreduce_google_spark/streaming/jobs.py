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


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Replay the whole source with Trigger.AvailableNow into a memory sink
    and return the materialized result (batch-parity harness)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
