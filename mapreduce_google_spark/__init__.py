"""mapreduce_google_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce framework (HaolingPu/MapReduce_Google), re-expressed
Spark-first: the reference's fixed dataflow (scan → map → hash-partition →
sort → merge → group-reduce → sink; see reference
``mapreduce/manager/__main__.py:313-395`` and
``mapreduce/worker/__main__.py:143-252``) is subsumed by Spark's
DataFrame/Catalyst execution, and the declarative query surface is extended
with the relational, windowed, streaming, and LLM-data-pipeline operators
enumerated in ``SURVEY.md §2``.

Layout:
    session      SparkSession factory tuned for scale-out defaults
    io           sources/sinks for the test star schema + generic readers
    functions/   column-level building blocks (tokenize, hashing, vectors)
    operators/   DataFrame → DataFrame operators (text, relational, dedup,
                 similarity, events, pipe-compat, multimodal)
    streaming/   Structured Streaming jobs with batch-parity semantics
    plans/       plan-inspection helpers (pushdown / broadcast assertions)
    queries      the declared query registry (Spark builder + DuckDB oracle)
"""

__version__ = "0.1.0"

from mapreduce_google_spark.session import get_spark  # noqa: F401
