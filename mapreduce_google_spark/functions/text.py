"""Tokenization expressions.

Token semantics follow the reference word-count mapper
(``tests/testdata/exec/wc_map.sh:12`` — translate runs of space/TAB to
newlines, lowercase), declared locale-independently per SURVEY.md §7:
**a token is a non-empty maximal run of non-whitespace characters of the
lowercased text**. Empty tokens produced by leading/trailing whitespace are
dropped on both the engine and oracle side, so the definition is identical
in Spark and DuckDB regardless of their split() edge-case behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: whitespace splitter shared by engine-side tokenization
WHITESPACE_RE = r"\s+"


def tokenize(text: Column | str) -> Column:
    """lowercased whitespace-split tokens as ``array<string>`` (may contain
    '' entries at the boundaries — filter with :func:`tokens_of`)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(col), WHITESPACE_RE)


def tokens_of(df: DataFrame, text_col: str = "text", out: str = "token") -> DataFrame:
    """Explode a text column to one non-empty token per row.

    ``explode`` + the filter both run inside codegen; the filter lands
    before the aggregation so empty tokens never enter the shuffle.
    """
    return df.select(F.explode(tokenize(text_col)).alias(out)).where(F.col(out) != "")
