"""tools/make_scaled_sf.py validity: the synthesized K× corpus must
preserve referential structure and duplicate RATE, or the sf1 scaling
bench (BENCH_sf1.json, the opt-in sf1 smoke) measures a different
workload than it claims."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_scaled"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "make_scaled_sf.py"),
            "2",
            "/root/testdata/sf0.001",
            out,
        ],
        check=True,
        timeout=300,
        capture_output=True,
    )
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')"
        )
        con.execute(
            f"CREATE VIEW src_{t} AS "
            f"SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    yield con
    con.close()


def test_fact_tables_scale_and_dims_do_not(scaled):
    for t in ["customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"]:
        n = scaled.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        n0 = scaled.execute(f"SELECT count(*) FROM src_{t}").fetchone()[0]
        assert n == 2 * n0, t
    for t in ["region", "nation"]:
        n = scaled.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        n0 = scaled.execute(f"SELECT count(*) FROM src_{t}").fetchone()[0]
        assert n == n0, t


def test_referential_alignment_survives_scaling(scaled):
    orphans = {
        "lineitem->orders": scaled.execute(
            "SELECT count(*) FROM lineitem l LEFT JOIN orders o "
            "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
        ).fetchone()[0],
        "lineitem->part": scaled.execute(
            "SELECT count(*) FROM lineitem l LEFT JOIN part p "
            "ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL"
        ).fetchone()[0],
        "orders->customer": scaled.execute(
            "SELECT count(*) FROM orders o LEFT JOIN customer c "
            "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
        ).fetchone()[0],
        "events->customer": scaled.execute(
            "SELECT count(*) FROM events e LEFT JOIN customer c "
            "ON e.user_id = c.c_custkey WHERE c.c_custkey IS NULL"
        ).fetchone()[0],
    }
    assert all(v == 0 for v in orphans.values()), orphans


def test_keys_remain_unique(scaled):
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("part", "p_partkey"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")]:
        dup = scaled.execute(
            f"SELECT count(*) - count(DISTINCT {k}) FROM {t}"
        ).fetchone()[0]
        assert dup == 0, t


def test_document_replicas_are_shuffled_not_duplicated(scaled):
    # exact-dup RATE must not change: replica texts are token-shuffled,
    # so the fingerprint distinct-count scales with the corpus
    n_docs, n_fp = scaled.execute(
        "SELECT count(*), count(DISTINCT md5(lower(trim(text)))) FROM documents"
    ).fetchone()
    n0_docs, n0_fp = scaled.execute(
        "SELECT count(*), count(DISTINCT md5(lower(trim(text)))) "
        "FROM src_documents"
    ).fetchone()
    assert n_docs == 2 * n0_docs
    # dup rate preserved within a small tolerance (shuffled replicas of
    # single-token or empty docs can still collide)
    rate0 = 1 - n0_fp / n0_docs
    rate = 1 - n_fp / n_docs
    assert abs(rate - rate0) < 0.02, (rate0, rate)
    # replicas keep the token multiset of their source doc
    mismatch = scaled.execute(
        """
        WITH norm AS (
            SELECT doc_id, list_sort(string_split(text, ' ')) AS toks
            FROM documents WHERE doc_id >= 100000
        ), src AS (
            SELECT doc_id, list_sort(string_split(text, ' ')) AS toks
            FROM src_documents
        )
        SELECT count(*) FROM norm n JOIN src s
        ON n.doc_id - 100000 = s.doc_id
        WHERE n.toks <> s.toks
        """
    ).fetchone()[0]
    assert mismatch == 0
