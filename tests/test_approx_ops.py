"""Quality gates for the approximate operators that have no SQL oracle:
MinHash-LSH near-dup (vs exact n-gram Jaccard) and IVF top-k (vs exact
brute-force cosine)."""

from __future__ import annotations

from mapreduce_google_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from mapreduce_google_spark.operators.similarity import cosine_topk, ivf_topk


def test_minhash_lsh_precision_and_recall(spark, sf_dir):
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, sf_dir).collect()}
    # exact-verify stage ⇒ precision 1.0 by construction
    assert lsh <= set(exact), "LSH returned a pair the exact join rejects"
    if exact:
        recall = len(lsh) / len(exact)
        # 8 bands × 4 rows at threshold 0.5 ⇒ P(candidate) ≈ 1-(1-s^4)^8,
        # ≈0.88 at s=0.7, ≈1.0 at s≥0.9 — demand most pairs are found
        assert recall >= 0.5, f"LSH recall {recall:.2f} too low ({len(lsh)}/{len(exact)})"


def test_ivf_recall(spark, sf_dir):
    exact = {
        (r.probe_id, r.vec_id) for r in cosine_topk(spark, sf_dir).collect()
    }
    approx = {(r.probe_id, r.vec_id) for r in ivf_topk(spark, sf_dir).collect()}
    assert len(approx) == len(exact)
    recall = len(exact & approx) / len(exact)
    # probing 3/8 cells on clustered embeddings should keep most true
    # neighbors; this is a sanity floor, not a tuning target
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_ivf_scans_fraction_of_vectors(spark, sf_dir):
    """The point of IVF: the candidate set is a strict subset of the
    corpus (here ≤ n_probe_cells/n_cells plus skew)."""
    from mapreduce_google_spark.io import load_table
    from mapreduce_google_spark.operators.similarity import ivf_assignments

    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = ivf_assignments(emb, n_cells=8)
    per_cell = {r.cell_id: r.n for r in assigned.groupBy("cell_id").count().withColumnRenamed("count", "n").collect()}
    assert sum(per_cell.values()) == emb.count()  # every vector in exactly one cell
    assert len(per_cell) > 1, "all vectors collapsed into one IVF cell"


def test_approx_distinct_within_error(spark, sf_dir):
    """HLL++ estimate (rsd=0.01) must land within 2% of the exact
    distinct-token count."""
    from mapreduce_google_spark.operators.text import (
        approx_distinct_tokens,
        distinct_tokens,
    )

    exact = distinct_tokens(spark, sf_dir).collect()[0].n_tokens
    approx = approx_distinct_tokens(spark, sf_dir).collect()[0].approx_n_tokens
    assert abs(approx - exact) / exact <= 0.02, (approx, exact)
