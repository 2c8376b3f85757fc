"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`mapreduce_google_spark.queries` — the registry is
the single source of truth for the Spark builders AND their DuckDB oracle
SQL (SURVEY.md §2d inventory T01–T20 + LLM-pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_google_spark import queries as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: T01 word count on sf0.001 (the reference's own
    golden-test query, re-expressed as scan→explode→agg→sort)."""
    return _registry.REGISTRY["t01_word_count"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query from SURVEY.md §2d."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return _registry.oracle_sql()
