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

from mapreduce_google_spark.functions.numeric import dsum, money
from mapreduce_google_spark.io import (
    _ensure_read_confs,
    _normalize_events_ts,
    cache_tag,
    load_table,
)
from mapreduce_google_spark.operators.events import TS_FMT


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table.

    Schema comes from the batch reader (streams can't infer), with the same
    nanos→µs timestamp normalization as :func:`io.load_table`.
    """
    _ensure_read_confs(spark)  # vanilla sessions reject TIMESTAMP(NANOS)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_events_ts(stream)


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
            dsum(money("value")).alias("sum_value"),
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

    tag = cache_tag(sf_dir, "events")
    doubled = f"/tmp/mgs_doubled_events_{tag}"
    if not os.path.exists(os.path.join(doubled, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        ev.union(ev).repartition(4).write.mode("overwrite").parquet(doubled)
    schema = spark.read.parquet(doubled).schema
    stream = _normalize_events_ts(spark.readStream.schema(schema).parquet(doubled))
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


def stream_event_pairs(
    spark: SparkSession, sf_dir: str, window_s: int = 60
) -> DataFrame:
    """T55 — watermarked stream-stream self-join: same-user event pairs
    within ``window_s`` seconds, counted per (earlier, later) event type.

    The streaming twin of T45. Where the batch plan buckets time to turn
    the interval join into an equi join, Structured Streaming's join
    state does the bucketing for us: both sides carry a watermark and the
    join condition bounds ``ts_b`` to ``(ts_a, ts_a + window_s]``, so
    each side's state retains only rows inside
    watermark + window — bounded by arrival rate × horizon, never by
    stream history. That state bound is the difference between a join
    that runs forever at 100 TB/day and one that OOMs after an hour.

    The join runs in the stream (append mode, one stateful operator);
    the tiny type-pair rollup happens on the materialized sink, mirroring
    T49's harness. Oracle: identical to T45's batch semantics.
    """
    tag, staged = _staged_events_dir(spark, sf_dir)
    schema = spark.read.parquet(staged).schema

    def src() -> DataFrame:
        return _normalize_events_ts(spark.readStream.schema(schema).parquet(staged))

    left = (
        src()
        .select(
            F.col("user_id").alias("u_a"),
            F.col("ts").alias("ts_a"),
            F.col("event_type").alias("type_a"),
        )
        .withWatermark("ts_a", "2 hours")
    )
    right = (
        src()
        .select(
            F.col("user_id").alias("u_b"),
            F.col("ts").alias("ts_b"),
            F.col("event_type").alias("type_b"),
        )
        .withWatermark("ts_b", "2 hours")
    )
    joined = left.join(
        right,
        (F.col("u_a") == F.col("u_b"))
        & (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {window_s} SECONDS")),
        "inner",
    )
    sink = run_available_now(joined, f"t55_pairs_{tag}", output_mode="append")
    return (
        sink.groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )



def _store_last_batch_id(store: str) -> int:
    """Last batch id applied to a foreachBatch merge store (-1 if none).

    foreachBatch is AT-LEAST-once: after a mid-merge failure Spark
    replays the batch with the SAME batch_id. Recording the id inside
    the store (an underscore-prefixed marker parquet ignores) lets the
    merge skip already-applied replays, making it effectively
    exactly-once."""
    import os

    try:
        with open(os.path.join(store, "_BATCH_ID"), encoding="ascii") as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return -1


def _recover_store(store: str) -> None:
    """Roll back a swap interrupted between the two renames: if the
    store is missing but the rename-aside copy exists, restore it — the
    prior state is never lost (unlike rmtree-then-rename)."""
    import os

    old = store + "_old"
    if not os.path.exists(store) and os.path.exists(old):
        os.rename(old, store)


def _swap_store(merged: DataFrame, store: str, batch_id: int) -> None:
    """Atomically replace a merge store via rename-aside (store → _old,
    tmp → store, drop _old) and stamp the applied batch_id. A crash at
    any point leaves either the old state (recoverable via
    :func:`_recover_store`) or the new state — never neither."""
    import os
    import shutil

    tmp = store + "_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_BATCH_ID"), "w", encoding="ascii") as fh:
        fh.write(str(batch_id))
    old = store + "_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(store):
        os.rename(store, old)
    os.rename(tmp, store)
    shutil.rmtree(old, ignore_errors=True)


def _staged_events_dir(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage the events table into a multi-file /tmp directory (the file
    stream source requires a directory; 4 files → 4 micro-batches under
    ``maxFilesPerTrigger=1``). Returns (tag, path); idempotent per sf."""
    import os

    tag = cache_tag(sf_dir, "events")
    staged = f"/tmp/mgs_events_dir_{tag}"
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        load_table(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(staged)
    return tag, staged


def _staged_docs_dir(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage the documents table (ALL columns) into a multi-file /tmp
    directory shared by every documents-driven stream. Single writer for
    the shared path: a consumer-specific projection here once poisoned
    the cache for full-column consumers (whoever staged first won), so
    staging always writes the full schema and consumers project in
    their own pipelines. Returns (tag, path); idempotent per sf."""
    import os

    tag = cache_tag(sf_dir, "documents")
    staged = f"/tmp/mgs_docs_dir_{tag}"
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        load_table(spark, sf_dir, "documents").repartition(4).write.mode(
            "overwrite"
        ).parquet(staged)
    return tag, staged


def foreachbatch_ingest_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T56 — streaming ingest through an idempotent ``foreachBatch`` sink.

    The production pattern for exactly-once file output from an
    at-least-once stream: each micro-batch lands in its own
    ``batch_id=N`` partition with ``overwrite`` mode, so a replayed batch
    (driver restart between sink-write and offset-commit) overwrites its
    own previous attempt instead of appending duplicates. State lives in
    the checkpoint + directory layout — nothing driver-resident, which is
    what lets the pattern run indefinitely at 100 TB/day.

    Harness: the staged events table streams in 1-file micro-batches
    (4 batches); batch 0 is deliberately written TWICE through the sink
    function to simulate a post-write replay. The final table — read back
    from the sink directory, counted per event_type — must still equal
    the plain batch counts of the source, which is the oracle.
    """
    import os
    import shutil

    tag, staged = _staged_events_dir(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    out_dir = f"/tmp/mgs_fbsink_{tag}"
    ckpt = f"{out_dir}_ckpt"
    for d in (out_dir, ckpt):
        if os.path.exists(d):
            shutil.rmtree(d)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(target)
        if batch_id == 0:  # simulated replay: same batch delivered again
            batch_df.write.mode("overwrite").parquet(target)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    landed = spark.read.option("basePath", out_dir).parquet(out_dir)
    return (
        landed.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .orderBy("event_type")
    )


def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T72 — streaming dedup-store compaction: documents arrive in
    micro-batches, a ``foreachBatch`` merge keeps a parquet store of
    (fingerprint → min doc_id, total dups) that must equal batch T17
    EXACTLY when the stream drains.

    The streaming twin of :func:`~...operators.dedup.incremental_dedup`:
    a 100 TB corpus is deduped incrementally, so the store is the
    long-lived asset and every batch is a MERGE into it. Merge state is
    (min, sum) per fingerprint — both associative+commutative, so the
    result is independent of batch order and count, which is what makes
    it oracle-checkable (same output as one-shot T17) and what makes the
    pattern safe under replays of the *merge result* (each version dir is
    rewritten whole from prev+batch; an interrupted attempt re-derives
    the same content). Store versions alternate directories because a
    parquet dir can't be overwritten while being read; at scale this is
    the same copy-on-write discipline table formats (Delta/Iceberg)
    provide natively.
    """
    import os
    import shutil

    tag, staged = _staged_docs_dir(spark, sf_dir)

    work = f"/tmp/mgs_dedup_store_{tag}"
    if os.path.exists(work):
        shutil.rmtree(work)
    schema = spark.read.parquet(staged).schema
    state: dict = {"cur": None, "last_batch": -1}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a replay after a post-write
        # failure would merge v_N into itself (double-counting n_dups
        # and overwriting the file being read) — skip applied batches.
        if batch_id <= state["last_batch"]:
            return
        mins = (
            batch_df.select(
                F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
                "doc_id",
            )
            .groupBy("fingerprint")
            .agg(
                F.min("doc_id").cast("long").alias("doc_id"),
                F.count("*").cast("long").alias("n_dups"),
            )
        )
        if state["cur"] is not None:
            prev = batch_df.sparkSession.read.parquet(state["cur"])
            mins = (
                prev.unionByName(mins)
                .groupBy("fingerprint")
                .agg(
                    F.min("doc_id").cast("long").alias("doc_id"),
                    F.sum("n_dups").cast("long").alias("n_dups"),
                )
            )
        out = os.path.join(work, f"v{batch_id}")
        mins.write.mode("overwrite").parquet(out)
        state["cur"] = out
        state["last_batch"] = batch_id

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["cur"] is not None, "stream produced no batches"
    return (
        spark.read.parquet(state["cur"])
        .select("fingerprint", "doc_id", "n_dups")
        .orderBy("doc_id")
    )


def stream_enriched_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T109 — stream-static enrichment join: the events stream joined to
    the static customer dimension (user_id → market segment) inside the
    micro-batch, then aggregated per (segment, event_type).

    THE canonical streaming-ETL shape: a static (or slowly-refreshed)
    dimension is broadcast into every micro-batch — no state store, no
    watermark needed for the join itself, and at 100 TB/day the stream
    side never shuffles for the join. Events whose user has no customer
    row keep flowing as segment='UNKNOWN' (left join — an enrichment
    must never drop facts).

    Oracle: identical batch join/agg straight from the parquet tables.
    """
    stream = read_events_stream(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    enriched = stream.join(dim, "user_id", "left")
    agg = enriched.groupBy(
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        dsum(F.col("value").cast("decimal(20,12)")).alias("total_value"),
    )
    tag = cache_tag(sf_dir, "events", "customer")
    sink = run_available_now(
        agg, f"t109_enrich_{tag}", output_mode="complete"
    )
    return sink.orderBy("segment", "event_type")


def stream_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T157 — streaming volume monitor: events arrive in micro-batches, a
    ``foreachBatch`` merge maintains a parquet store of per-(type, hour)
    COUNTS (associative+commutative, so replay-safe to merge), and the
    anomaly report — hours beyond 2 population std-devs of their type's
    hourly mean — is computed FROM THE STORE when the stream drains.
    Must equal batch t154 exactly.

    The production monitoring shape: the mergeable-state trick that made
    t72's dedup store work applies to moments too — counts merge by sum,
    and mean/std/z derive from merged counts at read time, so the
    z-scores are always consistent with everything ingested so far (a
    running z computed per-batch would depend on arrival order). Store
    size is (types × hours), independent of event volume.
    """
    import os
    import shutil

    from mapreduce_google_spark.operators.events import TS_FMT

    tag, staged = _staged_events_dir(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    store = f"/tmp/mgs_anom_store_{tag}"
    ckpt = f"{store}_ckpt"
    # A prior invocation killed mid-_swap_store leaves store+'_old' /
    # store+'_tmp' behind; if only (store, ckpt) were removed here,
    # _recover_store would resurrect the stale previous-run store and its
    # _BATCH_ID would make the batch-id skip drop this run's early batches
    # (fresh checkpoints restart ids at 0). Sweep the whole family.
    for d in (store, store + "_old", store + "_tmp", ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _recover_store(store)
        if batch_id <= _store_last_batch_id(store):
            return  # at-least-once replay of an applied batch: skip
        delta = batch_df.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")), TS_FMT).alias("hour"),
        ).agg(F.count("*").cast("long").alias("n_events"))
        if os.path.exists(store):
            prev = batch_df.sparkSession.read.parquet(store)
            merged = (
                prev.unionByName(delta)
                .groupBy("event_type", "hour")
                .agg(F.sum("n_events").cast("long").alias("n_events"))
            )
        else:
            merged = delta
        _swap_store(merged, store, batch_id)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    hourly = spark.read.parquet(store)
    moments = hourly.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_hours"),
        F.sum(F.col("n_events").cast("decimal(20,0)")).cast("double").alias("sc"),
        F.sum((F.col("n_events") * F.col("n_events")).cast("decimal(20,0)"))
        .cast("double")
        .alias("scc"),
    )
    mean = F.col("sc") / F.col("n_hours")
    std = F.sqrt(F.col("scc") / F.col("n_hours") - mean * mean)
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .withColumn("z", (F.col("n_events") - mean) / std)
        .where(F.abs(F.col("z")) > 2.0)
        .select(
            "event_type",
            "hour",
            "n_events",
            F.round(mean, 6).alias("mean_hourly"),
            F.round("z", 6).alias("z_score"),
        )
        .orderBy("event_type", "hour")
    )


def stream_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T169 — incremental view maintenance of the TPC-H Q1 pricing
    summary (t08): lineitem arrives in micro-batches, a ``foreachBatch``
    merge maintains a store of EXACT-DECIMAL partial sums per
    (returnflag, linestatus), and the summary — including the averages —
    derives from merged state at drain time. Must hash-equal batch t08.

    The mergeable-moments pattern for money: decimal sums are
    associative and order-independent, so per-batch partials merge into
    the store in any arrival order and the final avg is one IEEE
    division of exactly-maintained operands — a running double mean
    would depend on batch boundaries. Store size is the 6-row group
    grid regardless of volume. ``foreachBatch`` is at-least-once, so
    exactly-once is earned, not assumed: the store records the last
    applied batch_id (replays skip), and the swap is rename-aside, so a
    crash at any point leaves either the old or the new state intact
    (``_swap_store``/``_recover_store``).
    """
    import os
    import shutil

    from mapreduce_google_spark.functions.numeric import (
        money,
        one_minus,
        one_plus,
        rate,
    )

    tag = cache_tag(sf_dir, "lineitem")
    staged = f"/tmp/mgs_li_dir_{tag}"
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        load_table(spark, sf_dir, "lineitem").repartition(4).write.mode(
            "overwrite"
        ).parquet(staged)
    schema = spark.read.parquet(staged).schema
    store = f"/tmp/mgs_q1_store_{tag}"
    ckpt = f"{store}_ckpt"
    # A prior invocation killed mid-_swap_store leaves store+'_old' /
    # store+'_tmp' behind; if only (store, ckpt) were removed here,
    # _recover_store would resurrect the stale previous-run store and its
    # _BATCH_ID would make the batch-id skip drop this run's early batches
    # (fresh checkpoints restart ids at 0). Sweep the whole family.
    for d in (store, store + "_old", store + "_tmp", ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def partials(df: DataFrame) -> DataFrame:
        disc_price = money("l_extendedprice") * one_minus("l_discount")
        charge = disc_price * one_plus("l_tax")
        return (
            df.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(money("l_quantity")).alias("s_qty"),
                F.sum(money("l_extendedprice")).alias("s_price"),
                F.sum(disc_price).alias("s_disc_price"),
                F.sum(charge).alias("s_charge"),
                F.sum(rate("l_discount")).alias("s_disc"),
                F.count("*").cast("long").alias("n"),
            )
        )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _recover_store(store)
        if batch_id <= _store_last_batch_id(store):
            return  # at-least-once replay of an applied batch: skip
        delta = partials(batch_df)
        if os.path.exists(store):
            prev = batch_df.sparkSession.read.parquet(store)
            merged = (
                prev.unionByName(delta)
                .groupBy("l_returnflag", "l_linestatus")
                .agg(
                    F.sum("s_qty").alias("s_qty"),
                    F.sum("s_price").alias("s_price"),
                    F.sum("s_disc_price").alias("s_disc_price"),
                    F.sum("s_charge").alias("s_charge"),
                    F.sum("s_disc").alias("s_disc"),
                    F.sum("n").cast("long").alias("n"),
                )
            )
        else:
            merged = delta
        _swap_store(merged, store, batch_id)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = spark.read.parquet(store)
    return state.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("s_qty").cast("double"), 6).alias("sum_qty"),
        F.round(F.col("s_price").cast("double"), 6).alias("sum_base_price"),
        F.round(F.col("s_disc_price").cast("double"), 6).alias("sum_disc_price"),
        F.round(F.col("s_charge").cast("double"), 6).alias("sum_charge"),
        F.round(F.col("s_qty").cast("double") / F.col("n"), 6).alias("avg_qty"),
        F.round(F.col("s_price").cast("double") / F.col("n"), 6).alias("avg_price"),
        F.round(F.col("s_disc").cast("double") / F.col("n"), 6).alias("avg_disc"),
        F.col("n").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


def stream_top_tokens(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """T214 — streaming twin of the top-k token query (t06): documents
    arrive in micro-batches, a ``foreachBatch`` merge maintains the
    token-count store (sums — replay-safe to merge in any order), and
    the global top-k with the token-asc tiebreak is taken from merged
    state at drain. Must hash-equal batch t06.

    Closes the loop on the text surface: the same mergeable-state
    recipe that served dedup (t72), anomalies (t157), and pricing IVM
    (t169) applied to the engine's oldest query — top-k is NOT
    incrementally maintainable per batch (a token outside today's top-k
    can enter it tomorrow), which is exactly why the store keeps FULL
    counts and the cut happens at read time.
    """
    import os
    import shutil

    from mapreduce_google_spark.functions.text import tokenize

    tag, staged = _staged_docs_dir(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    store = f"/tmp/mgs_toptok_store_{tag}"
    ckpt = f"{store}_ckpt"
    # A prior invocation killed mid-_swap_store leaves store+'_old' /
    # store+'_tmp' behind; if only (store, ckpt) were removed here,
    # _recover_store would resurrect the stale previous-run store and its
    # _BATCH_ID would make the batch-id skip drop this run's early batches
    # (fresh checkpoints restart ids at 0). Sweep the whole family.
    for d in (store, store + "_old", store + "_tmp", ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _recover_store(store)
        if batch_id <= _store_last_batch_id(store):
            return  # at-least-once replay of an applied batch: skip
        delta = (
            batch_df.select(
                F.explode(F.filter(tokenize("text"), lambda t: t != "")).alias(
                    "token"
                )
            )
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        if os.path.exists(store):
            prev = batch_df.sparkSession.read.parquet(store)
            merged = (
                prev.unionByName(delta)
                .groupBy("token")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        else:
            merged = delta
        _swap_store(merged, store, batch_id)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.parquet(store)
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


def stream_intradoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the intra-doc repetition screen (t222):
    documents arrive in micro-batches; each batch contributes its
    per-source ADDITIVE state (doc/flag counts + word/2-gram/3-gram
    occurrence and distinct sums — every column a sum, every doc whole
    within one batch, so merge order cannot matter), maintained
    crash-safe and replay-idempotent by the shared
    ``_swap_store``/``_recover_store`` + batch-id-skip recipe; the
    micro-averaged rates are computed from merged state at drain.
    Must hash-equal batch t222.
    """
    import os
    import shutil

    from mapreduce_google_spark.operators.textstats import (
        repetition_rollup,
        repetition_sums,
    )

    tag, staged = _staged_docs_dir(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    store = f"/tmp/mgs_rep_store_{tag}"
    ckpt = f"{store}_ckpt"
    # sweep the whole swap family (see stream_hourly_anomalies)
    for d in (store, store + "_old", store + "_tmp", ckpt):
        shutil.rmtree(d, ignore_errors=True)

    sum_cols = ["n_docs", "n_flagged", "tw", "dw", "t2", "d2", "t3", "d3"]

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _recover_store(store)
        if batch_id <= _store_last_batch_id(store):
            return  # at-least-once replay of an applied batch: skip
        delta = repetition_sums(batch_df)
        if os.path.exists(store):
            prev = batch_df.sparkSession.read.parquet(store)
            merged = (
                prev.unionByName(delta)
                .groupBy("source")
                .agg(
                    *[F.sum(c).cast("long").alias(c) for c in sum_cols]
                )
            )
        else:
            merged = delta
        _swap_store(merged, store, batch_id)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return repetition_rollup(spark.read.parquet(store))


def stream_event_corrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T229 — the t225 corrections merge as a STREAM: correction
    micro-batches arrive continuously and each is MERGEd into the
    day-partitioned events table via ``io.partition_upsert``; when the
    stream drains, daily totals equal the one-shot batch upsert exactly
    (same oracle as t225).

    This is the production shape of a corrections feed at 100 TB: the
    table is the long-lived asset, each micro-batch rewrites only the
    partitions it touches, and the merge is IDEMPOTENT — delta rows
    carry absolute corrected values (not increments), so an
    at-least-once redelivery anti-joins its own previous application
    away and rewrites the same bytes. The harness proves it by pushing
    batch 0 through the sink twice. No checkpoint-side state beyond
    Spark's offsets; the table itself is the state.
    """
    import os
    import shutil

    from mapreduce_google_spark.io import partition_upsert
    from mapreduce_google_spark.operators.scale import (
        UPSERT_INSERT_OFFSET,
        _corrections_delta,
        _events_source,
    )

    tag = cache_tag(sf_dir, "events")
    table = f"/tmp/mgs_events_daily_stream_{tag}"
    # offset in the staged-delta path: a cached delta from a previous
    # process with a different UPSERT_INSERT_OFFSET must not be reused
    staged = f"/tmp/mgs_corrections_dir_{tag}_o{UPSERT_INSERT_OFFSET}"
    ckpt = f"{table}_ckpt"
    ev = _events_source(spark, sf_dir)
    # fresh base table + staged delta every run — the stream mutates the
    # table, so reusing a previous run's output would double-apply nothing
    # (idempotent) but hide a regression; rebuild keeps the proof honest
    for d in (table, ckpt):
        if os.path.exists(d):
            shutil.rmtree(d)
    ev.repartition("day").write.mode("overwrite").partitionBy("day").parquet(table)
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        # 3 files → 3 micro-batches under maxFilesPerTrigger=1
        _corrections_delta(ev).repartition(3).write.mode("overwrite").parquet(
            staged
        )
    schema = spark.read.parquet(staged).schema

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partition_upsert(
            batch_df.sparkSession, table, batch_df, "day", ["event_id"]
        )
        if batch_id == 0:  # simulated at-least-once redelivery
            partition_upsert(
                batch_df.sparkSession, table, batch_df, "day", ["event_id"]
            )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.parquet(table)
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .orderBy("day")
    )
