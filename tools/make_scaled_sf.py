"""Synthesize a K×-scaled replica of an sf dir for SCALING BENCHMARKS.

Usage: python tools/make_scaled_sf.py [K] [src_sf_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=/tmp/mgs_sf1

This exists solely to measure the sf0.1 → sf1 scaling curve
(BENCH_sf1.json) — correctness inputs remain the driver-generated
parquet. Each fact table is replicated K times with aligned key
offsets so referential structure survives (events.user_id ⊂
customer.c_custkey, lineitem.l_orderkey ⊂ orders.o_orderkey, …);
dimension tables (region, nation) stay as-is, matching how TPC-H
scales. Document text is deterministically token-shuffled per replica
(replica 0 keeps the original) so the duplicate/near-duplicate RATE
stays roughly constant instead of every doc gaining K−1 exact copies —
a K× corpus with K× the dup density would make the dedup queries
artificially quadratic rather than 10× the work.
"""

from __future__ import annotations

import os
import sys

import duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/mgs_sf1"

# shared offsets keep cross-table key relations aligned per replica
CUST_OFF = 100_000   # c_custkey, o_custkey, user_id
ORD_OFF = 1_000_000  # o_orderkey, l_orderkey
PART_OFF = 100_000   # p_partkey, l_partkey
SUPP_OFF = 10_000    # s_suppkey, l_suppkey
DOC_OFF = 100_000    # doc_id
VEC_OFF = 100_000    # vec_id
EVT_OFF = 10_000_000  # event_id

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads={os.cpu_count() or 8}")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
    )
con.execute(f"CREATE TABLE reps AS SELECT unnest(range({K})) AS i")

# The offsets above are only collision-free if every source key fits
# under its table's offset; pointing this tool at a larger src sf dir
# would otherwise silently produce colliding keys across replicas and
# break the referential alignment the tool exists to preserve.
_KEY_BOUNDS = {
    "customer.c_custkey": CUST_OFF,
    "orders.o_orderkey": ORD_OFF,
    "part.p_partkey": PART_OFF,
    "supplier.s_suppkey": SUPP_OFF,
    "documents.doc_id": DOC_OFF,
    "embeddings.vec_id": VEC_OFF,
    "events.event_id": EVT_OFF,
}
for qual, off in _KEY_BOUNDS.items():
    tbl, col = qual.split(".")
    mx = con.execute(f"SELECT max({col}) FROM {tbl}").fetchone()[0]
    if mx is not None and mx >= off:
        raise SystemExit(
            f"source {qual} max={mx} >= replica offset {off}: replicas "
            f"would collide. Use a smaller src sf dir or raise the offset."
        )


def emit(name: str, sql: str) -> None:
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
    ).fetchone()[0]
    print(f"{name}: {n} rows")


emit("region", "SELECT * FROM region")
emit("nation", "SELECT * FROM nation")
emit("customer", f"""
    SELECT c_custkey + i*{CUST_OFF} AS c_custkey, c_name, c_nationkey,
           c_acctbal, c_mktsegment
    FROM customer, reps""")
emit("supplier", f"""
    SELECT s_suppkey + i*{SUPP_OFF} AS s_suppkey, s_name, s_nationkey,
           s_acctbal
    FROM supplier, reps""")
emit("part", f"""
    SELECT p_partkey + i*{PART_OFF} AS p_partkey, p_name, p_brand, p_type,
           p_size, p_retailprice
    FROM part, reps""")
emit("orders", f"""
    SELECT o_orderkey + i*{ORD_OFF} AS o_orderkey,
           o_custkey + i*{CUST_OFF} AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM orders, reps""")
emit("lineitem", f"""
    SELECT l_orderkey + i*{ORD_OFF} AS l_orderkey,
           l_partkey + i*{PART_OFF} AS l_partkey,
           l_suppkey + i*{SUPP_OFF} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM lineitem, reps""")
emit("events", f"""
    SELECT event_id + i*{EVT_OFF} AS event_id, ts,
           user_id + i*{CUST_OFF} AS user_id, event_type, value, props
    FROM events, reps""")
# replica>0 text: deterministic per-replica token shuffle (same tokens,
# different order) so replicas are neither exact nor near duplicates of
# the original under n-gram shingling
emit("documents", f"""
    WITH shuffled AS (
        SELECT d.doc_id, r.i,
               array_to_string(
                   list_transform(
                       list_sort(
                           list_transform(
                               range(1, len(string_split(d.text, ' ')) + 1),
                               j -> md5(d.doc_id || '-' || r.i || '-' || j)
                                    || '|' || string_split(d.text, ' ')[j])),
                       s -> substr(s, 34)),
                   ' ') AS text
        FROM documents d CROSS JOIN reps r
        WHERE r.i > 0
    )
    SELECT d.doc_id + s.i*{DOC_OFF} AS doc_id, s.text, d.lang, d.source,
           CAST(length(s.text) AS BIGINT) AS n_chars
    FROM shuffled s JOIN documents d USING (doc_id)
    UNION ALL
    SELECT doc_id, text, lang, source, n_chars FROM documents""")
emit("embeddings", f"""
    SELECT vec_id + i*{VEC_OFF} AS vec_id,
           CASE WHEN i = 0 THEN embedding
                ELSE list_transform(embedding,
                     x -> CAST(x * (1.0 + 0.001*i) AS FLOAT))
           END AS embedding,
           label
    FROM embeddings, reps""")
print(f"done: {OUT} (K={K}, src={SRC})")
