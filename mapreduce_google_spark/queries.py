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

from mapreduce_google_spark.operators import relational as rel_ops
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

# --------------------------------------------------------------------------
# Relational core (gap-table families: joins/aggs/windows/set ops/scalars)
# --------------------------------------------------------------------------

register(
    QuerySpec(
        name="t07_filter_agg_revenue",
        builder=rel_ops.filter_agg_revenue,
        oracle="""
            SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.02 AND 0.08
              AND l_quantity < 24
        """,
        doc="TPC-H Q6 shape: pushed-down filter + global agg",
        tags=("relational", "agg"),
        headline=True,
    )
)

register(
    QuerySpec(
        name="t08_pricing_summary",
        builder=rel_ops.pricing_summary,
        oracle="""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 6) AS sum_qty,
                   round(sum(l_extendedprice), 6) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
                       AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        doc="TPC-H Q1 shape: grouped pricing summary",
        tags=("relational", "agg"),
        headline=True,
    )
)

register(
    QuerySpec(
        name="t09_revenue_per_region",
        builder=rel_ops.revenue_per_region,
        oracle="""
            SELECT r_name,
                   round(sum(o_totalprice), 6) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name
            ORDER BY r_name
        """,
        doc="4-way equi-join (broadcast dims) + agg",
        tags=("relational", "join"),
        headline=True,
    )
)

register(
    QuerySpec(
        name="t10_semi_anti_join",
        builder=rel_ops.customers_with_without_orders,
        oracle="""
            SELECT 'with_orders' AS kind, c_custkey
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT 'without_orders' AS kind, c_custkey
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY kind, c_custkey
        """,
        doc="left-semi / left-anti joins, labeled union",
        tags=("relational", "join"),
    )
)

register(
    QuerySpec(
        name="t11_top_orders_per_customer",
        builder=rel_ops.top_orders_per_customer,
        oracle="""
            SELECT o_custkey, o_orderkey, o_totalprice, rn
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       CAST(row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS INTEGER) AS rn
                FROM orders
            )
            WHERE rn <= 3
            ORDER BY o_custkey, rn
        """,
        doc="window row_number top-3 per customer, total tie-break",
        tags=("relational", "window"),
        headline=True,
    )
)

register(
    QuerySpec(
        name="t12_revenue_rollup",
        builder=rel_ops.revenue_rollup,
        oracle="""
            SELECT r_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
        """,
        doc="rollup subtotals over a 5-way join",
        tags=("relational", "rollup"),
        headline=True,
    )
)

register(
    QuerySpec(
        name="t13_segment_set_ops",
        builder=rel_ops.segment_set_ops,
        oracle="""
            WITH seg_a AS (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            ),
            seg_b AS (
                SELECT c_custkey FROM customer WHERE c_acctbal > 0
            )
            SELECT 'union' AS op, c_custkey FROM (
                SELECT c_custkey FROM seg_a UNION SELECT c_custkey FROM seg_b
            )
            UNION ALL
            SELECT 'intersect' AS op, c_custkey FROM (
                SELECT c_custkey FROM seg_a INTERSECT SELECT c_custkey FROM seg_b
            )
            UNION ALL
            SELECT 'except' AS op, c_custkey FROM (
                SELECT c_custkey FROM seg_a EXCEPT SELECT c_custkey FROM seg_b
            )
            ORDER BY op, c_custkey
        """,
        doc="union/intersect/except of two customer segments",
        tags=("relational", "setop"),
    )
)

register(
    QuerySpec(
        name="t14_scalar_functions",
        builder=rel_ops.scalar_functions,
        oracle="""
            SELECT l_orderkey, l_linenumber,
                   CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                   CAST(month(l_shipdate) AS BIGINT) AS ship_month,
                   CAST(day(l_shipdate) AS BIGINT) AS ship_day,
                   substr(l_returnflag, 1, 1) AS flag1,
                   concat_ws('|', l_returnflag, l_linestatus) AS flag_status,
                   upper(l_linestatus) AS status_uc,
                   CAST(length(l_returnflag) AS BIGINT) AS flag_len,
                   round(l_extendedprice * (1 - l_discount), 6) AS net_price,
                   round(sqrt(abs(l_quantity)), 6) AS qty_sqrt,
                   CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                   l_quantity % 5 AS qty_mod5
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber
        """,
        doc="string/date/math scalar expressions (codegen, no shuffle)",
        tags=("relational", "scalar"),
    )
)

# --------------------------------------------------------------------------
# Event-time family (batch halves of the streaming surface)
# --------------------------------------------------------------------------

from mapreduce_google_spark.operators import events as event_ops  # noqa: E402

register(
    QuerySpec(
        name="t15_tumbling_window",
        builder=event_ops.tumbling_window_counts,
        oracle="""
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                       AS bucket_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        doc="1-hour tumbling event-time windows (batch parity of streaming)",
        tags=("events", "window"),
        headline=True,
    )
)

register(
    QuerySpec(
        name="t15b_sliding_window",
        builder=event_ops.sliding_window_counts,
        oracle="""
            SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S')
                       AS window_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM (
                SELECT unnest([
                           (epoch_us(ts) // 1800000000) * 1800000000,
                           (epoch_us(ts) // 1800000000) * 1800000000
                               - 1800000000
                       ]) AS ws,
                       event_type, value
                FROM events
            )
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        doc="1h/30min sliding windows; oracle re-derives Spark's window alignment",
        tags=("events", "window"),
    )
)

register(
    QuerySpec(
        name="t16_session_window",
        builder=event_ops.session_window_stats,
        oracle="""
            WITH flagged AS (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                       CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                    > 1800000000
                            THEN 1 ELSE 0 END AS is_start
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ),
            numbered AS (
                SELECT user_id, ts_us,
                       sum(is_start) OVER (
                           PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_id
                FROM flagged
            ),
            per_session AS (
                SELECT user_id, session_id,
                       CAST(count(*) AS BIGINT) AS n_events,
                       max(ts_us) - min(ts_us) AS duration_us
                FROM numbered
                GROUP BY user_id, session_id
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   CAST(max(duration_us) AS BIGINT) AS max_session_us
            FROM per_session
            GROUP BY user_id
            ORDER BY user_id
        """,
        doc="30-min-gap sessionization (gaps-and-islands), per-user rollup",
        tags=("events", "session"),
        headline=True,
    )
)
