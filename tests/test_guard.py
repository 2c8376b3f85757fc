"""Throughput / driver-memory guard — the Spark analog of the reference's
only quantitative bar (reference ``tests/test_worker_11.py:140-150``:
map ~5.1 MB / 700k lines in < 10 s with < 1 MB traced Python heap).

The reference enforces O(1) task memory because its workers stream lines
through pipes; Spark's equivalent contract is (a) the scan+tokenize+agg
pipeline runs wholly in the JVM — the Python driver holds only the final
groups — and (b) throughput clears the reference's 0.5 MB/s/core floor
with a wide margin. A driver that accidentally ``collect()``s raw rows
mid-pipeline breaks (a) and this test catches it.
"""

from __future__ import annotations

import time
import tracemalloc

from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"
REPLICAS = 4  # ~1.45 MB raw text x4 ≈ the reference's ~5.1 MB task


def _word_count(spark):
    """Same plan shape as operators.text.word_count (T01), over the sf0.1
    documents table replicated to the reference's data scale."""
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("text")
    docs = docs.crossJoin(spark.range(REPLICAS).select(F.col("id").alias("_r")))
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    return tokens.groupBy("token").count().orderBy("token")


def _measure(spark, raw_bytes):
    """One measured run; returns (errors, peak_bytes, wall_s)."""
    tracemalloc.start()
    t0 = time.perf_counter()
    rows = _word_count(spark).collect()
    wall = time.perf_counter() - t0
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    errors = []
    if not rows:
        errors.append("word count returned nothing")
    # (a) driver memory is O(result), not O(input): the collected group
    # list is tiny (closed synthetic vocabulary) — 8 MB of driver headroom
    # is far under the ~6 MB x tokens raw stream a mid-pipeline collect
    # would materialize (each Row object costs ~10x its text).
    if peak >= 8 * 1024 * 1024:
        errors.append(f"driver traced heap {peak} bytes")
    # (b) reference floor: >= 0.5 MB/s on ~5 MB of text in one task;
    # demand the same floor on total wall clock regardless of cores.
    mb_per_s = raw_bytes / (1024 * 1024) / wall
    if mb_per_s < 0.5:
        errors.append(f"{mb_per_s:.2f} MB/s below reference floor")
    if wall >= 10:
        errors.append(f"word count took {wall:.1f}s (reference bound: 10s)")
    return errors, peak, wall


def test_word_count_throughput_and_driver_memory(spark):
    """Wall-clock bounds are load-sensitive on a shared machine, so a
    failing measurement gets ONE retry before it can fail the suite —
    a real mid-pipeline collect() or throughput regression fails both
    runs; a noisy-neighbor spike doesn't."""
    raw_bytes = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .agg(F.sum(F.length("text")))
        .first()[0]
    ) * REPLICAS

    # Warm-up run: first-call costs (py4j protocol setup, lazy imports,
    # plan-construction caches) are one-time driver overhead, not data-
    # proportional memory — excluded, as the reference's profiler excludes
    # interpreter startup (reference tests/utils/memory.py:6-47).
    _word_count(spark).collect()

    errors, _, _ = _measure(spark, raw_bytes)
    if errors:
        errors, _, _ = _measure(spark, raw_bytes)  # retry once under load
    assert not errors, "; ".join(errors)
