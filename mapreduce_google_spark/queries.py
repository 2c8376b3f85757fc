"""Declared query registry — the engine's correctness & bench contract.

One :class:`QuerySpec` per query in SURVEY.md §2d (T01–T20) plus the
LLM-pipeline extensions. Each spec pairs the Spark builder with the
equivalent ANSI-SQL oracle that DuckDB runs over the same parquet tables;
the driver (and ``tests/``) hash-compares the two at sf0.01 / sf0.001.

Determinism rules (FIXTURES.md §5) applied uniformly:
* every query ends in a total ORDER BY (unique tie-break column);
* aggregate/computed columns aliased identically on both sides;
* float aggregates rounded to 6 decimals AFTER aggregation;
* timestamps emitted as formatted strings (UTC session tz) so both
  engines stringify identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from mapreduce_google_spark.operators import text as text_ops

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    REGISTRY[spec.name] = spec
    return spec


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


# --------------------------------------------------------------------------
# Text family (reference-native surface)
# --------------------------------------------------------------------------

register(
    QuerySpec(
        name="t01_word_count",
        builder=text_ops.word_count,
        oracle="""
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
                FROM documents
            )
            WHERE token <> ''
            GROUP BY token
            ORDER BY token
        """,
        doc="word count over documents.text (reference wc_map/wc_reduce)",
        tags=("text", "agg"),
        headline=True,
    )
)

register(
    QuerySpec(
        name="t02_grep",
        builder=text_ops.grep,
        oracle="""
            SELECT doc_id, text
            FROM documents
            WHERE length(text) > 0
              AND contains(lower(text), 'product')
            ORDER BY doc_id
        """,
        doc="case-insensitive substring grep (reference grep_map.py)",
        tags=("text", "filter"),
        headline=True,
    )
)

# The synthetic corpus never contains 'product' (checked at sf0.001/0.01/0.1),
# so t02 as declared is a 0-row parity check. This variant greps a term that
# matches rows, giving the filter path non-vacuous evidence.
register(
    QuerySpec(
        name="t02b_grep_hit",
        builder=lambda spark, sf_dir: text_ops.grep(spark, sf_dir, query="customer"),
        oracle="""
            SELECT doc_id, text
            FROM documents
            WHERE length(text) > 0
              AND contains(lower(text), 'customer')
            ORDER BY doc_id
        """,
        doc="grep variant over a term present in the corpus (non-vacuous)",
        tags=("text", "filter"),
    )
)

register(
    QuerySpec(
        name="t03_identity",
        builder=text_ops.identity_scan,
        oracle="""
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            ORDER BY doc_id
        """,
        doc="identity scan (reference `cat` mapper)",
        tags=("text", "scan"),
    )
)

register(
    QuerySpec(
        name="t04_md5_partition_histogram",
        builder=text_ops.md5_partition_histogram,
        oracle="""
            SELECT bucket, CAST(count(*) AS BIGINT) AS cnt
            FROM (
                SELECT CAST(('0x' || substr(md5(token), 31, 2)) AS INTEGER) % 8
                         AS bucket
                FROM (
                    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
                    FROM documents
                )
                WHERE token <> ''
            )
            GROUP BY bucket
            ORDER BY bucket
        """,
        doc="reference md5 partition function histogram (worker/__main__.py:62-65)",
        tags=("text", "partition"),
    )
)

register(
    QuerySpec(
        name="t05_distinct_tokens",
        builder=text_ops.distinct_tokens,
        oracle="""
            SELECT CAST(count(DISTINCT token) AS BIGINT) AS n_tokens
            FROM (
                SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
                FROM documents
            )
            WHERE token <> ''
        """,
        doc="exact distinct token count",
        tags=("text", "agg"),
    )
)

register(
    QuerySpec(
        name="t06_top_k_tokens",
        builder=text_ops.top_k_tokens,
        oracle="""
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
                FROM documents
            )
            WHERE token <> ''
            GROUP BY token
            ORDER BY cnt DESC, token ASC
            LIMIT 20
        """,
        doc="top-20 tokens, tie-break token asc (TakeOrderedAndProject)",
        tags=("text", "topk"),
    )
)
