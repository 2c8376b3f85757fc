"""Column-level building blocks (all JVM-side ``pyspark.sql.functions``).

Everything here returns ``Column`` expressions that stay inside
whole-stage codegen — no Python UDFs on the hot path.
"""

from mapreduce_google_spark.functions.text import tokenize, tokens_of
from mapreduce_google_spark.functions.hashing import md5_bucket, rolling_hash
from mapreduce_google_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "tokenize",
    "tokens_of",
    "md5_bucket",
    "rolling_hash",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
