"""Streaming-executable compatibility surface (reference F3/F8).

The reference's entire UDF model is "pipe lines through an arbitrary
executable" (mapper: ``worker/__main__.py:167-186``, reducer:
``worker/__main__.py:241-249``) with md5 hash partitioning on the text
before the first TAB (``worker/__main__.py:62-65,183-185``) and sorted
runs merged per partition. This module reproduces that surface exactly on
Spark RDDs:

    lines.pipe(mapper) → md5-partition by key → sort within partition
    → pipe(reducer) → DataFrame

This is a COMPATIBILITY path, not the default: per-row Python + subprocess
transfer is 10-100× slower than the declarative equivalents (T01 vs T20
benchmarks this directly). Its value is that any mapper/reducer executable
written for the reference runs unmodified.
"""

from __future__ import annotations

import hashlib
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mapreduce_google_spark.io import load_table

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def md5_partition(key: str, num_partitions: int) -> int:
    """Reference partition function: ``int(md5(key),16) % n``
    (``worker/__main__.py:62-65``)."""
    return int(hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % num_partitions


def pipe_map_reduce(
    lines: DataFrame,
    mapper_cmd: str,
    reducer_cmd: str,
    num_reducers: int = 8,
) -> DataFrame:
    """Run a reference-style streaming-exec job over a 1-column DataFrame
    of text lines; returns ``DataFrame[key: string, value: string]``.

    Dataflow parity with the reference:
    * mapper sees raw lines on stdin, emits ``key\\tvalue`` (F3);
    * md5-mod hash partitioning on the key (F4) via a custom
      ``partitionFunc`` — byte-identical bucket assignment;
    * per-partition sort (F5) + contiguous-key grouping for the reducer
      (F7/F8) via ``repartitionAndSortWithinPartitions``;
    * reducer sees the sorted ``key\\tvalue`` stream, emits ``key\\tvalue``.
    """
    col = lines.columns[0]
    rdd = lines.select(col).rdd.map(lambda r: r[0] if r[0] is not None else "")
    mapped = rdd.pipe(mapper_cmd)
    keyed = mapped.map(lambda ln: (ln.partition("\t")[0], ln))
    shuffled = keyed.repartitionAndSortWithinPartitions(
        numPartitions=num_reducers,
        partitionFunc=lambda k: md5_partition(k, num_reducers),
    )
    reduced = shuffled.values().pipe(reducer_cmd)
    out = reduced.map(
        lambda ln: (ln.partition("\t")[0], ln.partition("\t")[2])
    )
    schema = StructType(
        [StructField("key", StringType()), StructField("value", StringType())]
    )
    return lines.sparkSession.createDataFrame(out, schema)


def pipe_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20 — T01 computed through the literal reference exec surface.

    Runs fresh mapper/reducer scripts (assets/) over documents.text via
    ``rdd.pipe``; the result must hash-match T01's declarative plan (same
    oracle SQL).
    """
    docs = load_table(spark, sf_dir, "documents")
    mapper = f"{sys.executable} {os.path.join(ASSETS, 'wc_mapper.py')}"
    reducer = f"{sys.executable} {os.path.join(ASSETS, 'wc_reducer.py')}"
    kv = pipe_map_reduce(docs.select("text"), mapper, reducer, num_reducers=8)
    return (
        kv.select(
            F.col("key").alias("token"), F.col("value").cast("long").alias("cnt")
        )
        .orderBy("token")
    )


def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T54 — per-token frequency + mean position via a Python UDTF.

    The modern analog of the reference's mapper-executable surface (F3):
    where the reference fans one input line out to N ``key\\tvalue``
    lines through an arbitrary subprocess, a Python UDTF declares the
    output schema and yields N typed rows per input row, applied with a
    SQL LATERAL join. Same extensibility contract — arbitrary user code,
    one-to-many — minus the subprocess and the untyped TAB protocol.

    Like T20 this is the slow (Python) path and exists as the
    extensibility surface; the declarative T01 family is the hot path.
    Scale: the UDTF runs per input partition with no shuffle before it;
    the only exchanges are the downstream groupBy and order.
    """
    from pyspark.sql.functions import udtf

    # useArrow: rows cross the Python boundary as Arrow batches
    # (ArrowEvalPythonUDTF) instead of pickled row-at-a-time
    # (BatchEvalPythonUDTF) — same contract, vectorized transfer
    @udtf(returnType="token: string, pos: int", useArrow=True)
    class Tokenize:
        def eval(self, text: str):  # noqa: D102 — UDTF contract method
            if text is None:
                return
            pos = 0
            for tok in text.lower().split():
                if tok:
                    yield tok, pos
                    pos += 1

    spark.udtf.register("mgs_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_documents"
    )
    return spark.sql(
        """
        SELECT t.token,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(t.pos), 6) AS avg_pos
        FROM udtf_documents d, LATERAL mgs_tokenize(d.text) t
        GROUP BY t.token
        ORDER BY t.token
        """
    )
