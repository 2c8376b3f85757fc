"""Text-processing operators — the reference's native query surface.

Reference lineage: word count (``tests/testdata/exec/wc_map.sh:12``,
``wc_reduce.sh:14``), grep (``tests/testdata/exec/grep_map.py:14-28``),
identity/`cat` (``tests/test_worker_11.py:38``), and the md5 hash
partitioner (``mapreduce/worker/__main__.py:62-65``). Each is re-expressed
as a declarative plan: tokenize/filter run inside whole-stage codegen, the
only shuffle is the final aggregation/sort, and partial (map-side)
aggregation comes free from Catalyst — strictly better than the reference,
which has no combiner (SURVEY.md §2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_google_spark.functions.hashing import md5_bucket
from mapreduce_google_spark.functions.text import tokens_of
from mapreduce_google_spark.io import load_table


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T01 — count of each lowercased whitespace token of documents.text.

    scan → explode(split(lower)) → hash-agg (partial+final) → range-sort.
    This is the reference's entire dataflow (F1→F8) in one declarative plan;
    at 100 TB the token-count shuffle carries only (token, partial_count)
    pairs thanks to map-side partial aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        tokens_of(docs, "text")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("token")
    )


def grep(spark: SparkSession, sf_dir: str, query: str = "product") -> DataFrame:
    """T02 — case-insensitive substring filter over documents.text.

    Reference ``grep_map.py:27`` keeps lines with `query in line.lower()`
    (default query "product", ``grep_map.py:14-15``) and drops blank lines;
    ``grep_reduce.py:24-27`` projects the line back out. Here it is a
    σ+π that Catalyst pushes into the parquet scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.length(F.col("text")) > 0)
        .where(F.lower(F.col("text")).contains(query.lower()))
        .select("doc_id", "text")
        .orderBy("doc_id")
    )


def identity_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T03 — pass-through scan ordered by doc_id (reference `cat` mapper)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id")


def md5_partition_histogram(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> DataFrame:
    """T04 — rows per reference-compatible md5 partition bucket.

    Reproduces the reference partition function
    ``int(md5(key).hexdigest(),16) % num_partitions``
    (``worker/__main__.py:62-65``) as a JVM-side expression over tokens and
    histograms the bucket assignment — byte-identical bucketing without a
    Python partitioner.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_of(docs, "text")
    return (
        toks.select(md5_bucket(F.col("token"), num_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("bucket")
    )


def distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T05 — exact distinct token count (partial-agg'd count distinct)."""
    docs = load_table(spark, sf_dir, "documents")
    return tokens_of(docs, "text").agg(
        F.count_distinct(F.col("token")).cast("long").alias("n_tokens")
    )


def top_k_tokens(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """T06 — top-k tokens by count, ties broken by token asc.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps a
    k-element heap and only k rows per partition reach the driver — no
    global sort even at 100 TB.
    """
    counts = (
        tokens_of(load_table(spark, sf_dir, "documents"), "text")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)


def approx_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T39 — approximate distinct-token count via HyperLogLog++.

    The sketch is tiny (KB), mergeable, and single-pass — the partial
    sketches combine map-side, so the shuffle carries one sketch per
    partition instead of every distinct token (T05's exact variant
    shuffles the full token set). rsd=0.01 targets 1% relative error;
    tests assert the estimate lands within 2% of the exact count.
    Rows-only for the driver: HLL internals aren't SQL-portable.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_of(docs)
    return toks.agg(
        F.approx_count_distinct("token", rsd=0.01).alias("approx_n_tokens")
    )
