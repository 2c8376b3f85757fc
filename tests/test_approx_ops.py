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


def test_cosine_topk_gemm_equals_hof(spark, sf_dir):
    """t18's registered GEMM form must produce exactly the HOF form's
    rows — both compute dot/(|a|·|b|) and round to 6 BEFORE ranking, so
    the rank order is defined on identical values; this pins that the
    numpy batch path never drifts from the codegen expression path."""
    from mapreduce_google_spark.operators.similarity import cosine_topk_gemm

    hof = [tuple(r) for r in cosine_topk(spark, sf_dir).collect()]
    gemm = [tuple(r) for r in cosine_topk_gemm(spark, sf_dir).collect()]
    assert gemm == hof


def test_gemm_scored_relation_is_bounded(spark, sf_dir):
    """The r14 scale fix for t18's rank stage (VERDICT r13 "What's
    wrong #1"): the GEMM kernel folds each Arrow batch to its per-probe
    top-k, so the relation feeding the probe_id merge window carries at
    most P·k rows per batch — NOT the N·P it shuffled before (10^11
    rows into 10 non-empty partitions at 10^10 vectors). Upper-bounds
    the batch count by partitions + N/arrow_batch_size (Spark may split
    a partition into several Arrow batches, never merge across
    partitions)."""
    from mapreduce_google_spark.io import load_table
    from mapreduce_google_spark.operators.similarity import _gemm_scored

    emb = load_table(spark, sf_dir, "embeddings")
    n, n_parts = emb.count(), emb.rdd.getNumPartitions()
    p, k = 10, 5
    scored = _gemm_scored(spark, sf_dir, n_probes=p, k=k)
    batches_max = n_parts + n // 10_000 + 1
    count = scored.count()
    assert count <= p * k * batches_max, (count, p, k, batches_max)
    assert count < n * p, "kernel emitted the unbounded scored relation"
    # no self-matches survive the kernel mask
    assert scored.where("vec_id = probe_id").count() == 0


def test_partial_topk_per_batch_is_exact_and_bounded(spark):
    """partial_topk_per_batch (t25's map-side combine): folding batches
    to per-probe top-k must not change the final ranked result (union
    containment under the shared total order, ties broken by vec_id),
    and the folded relation is bounded by k·P·num_batches. Built on a
    synthetic relation with deliberate ties across partitions so the
    tie-break path is exercised, not just the happy path."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduce_google_spark.operators.similarity import (
        partial_topk_per_batch,
    )

    n_parts, k = 8, 3
    scored = (
        spark.range(0, 4000, 1, n_parts)
        .selectExpr(
            "id % 5 AS probe_id",
            "id AS vec_id",
            # heavy ties: only 7 distinct cosine values
            "round((id % 7) / 10.0, 6) AS cosine",
        )
    )
    folded = partial_topk_per_batch(scored, k)
    assert folded.count() <= k * 5 * n_parts

    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )

    def topk(df):
        return [
            tuple(r)
            for r in df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("probe_id", "rank")
            .collect()
        ]

    assert topk(folded) == topk(scored)


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up_6 vs F.round (ADVICE r13): np.round is
    half-to-EVEN while Spark/DuckDB round HALF_UP, a systematic
    divergence at exact .5e-6 boundaries. Pins the boundary cases both
    signs (2.5e-6 → 3e-6, where half-even gives 2e-6) and agreement
    with Spark's own rounding over a seeded generic sample."""
    import numpy as np

    from mapreduce_google_spark.operators.similarity import _round_half_up_6

    # exact decimal boundaries: HALF_UP rounds away from zero
    got = _round_half_up_6(np.array([2.5e-6, -2.5e-6, 1.5e-6, -1.5e-6]))
    assert got.tolist() == [3e-6, -3e-6, 2e-6, -2e-6]
    # np.round would have given the half-even 2e-6 here — the exact
    # divergence this helper exists to remove
    assert np.round(np.array([2.5e-6]), 6).tolist() == [2e-6]

    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [rng.uniform(-1, 1, 500), np.array([0.1234565, -0.9999995, 0.5e-6])]
    )
    import pandas as pd
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    spark_rounded = [
        r.r for r in sdf.select(F.round("x", 6).alias("r")).collect()
    ]
    ours = _round_half_up_6(vals).tolist()
    assert ours == spark_rounded


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


def test_ivf_from_index_equals_in_session(spark, sf_dir):
    """t25's registered from-index form must produce exactly the
    in-session operator's rows: the store holds the same deterministic
    assignment (seed centroids = lowest vec_ids), so the only difference
    is WHERE the assignment pass ran — build time, not query time."""
    from mapreduce_google_spark.operators.similarity import ivf_topk_from_index

    a = [tuple(r) for r in ivf_topk(spark, sf_dir).collect()]
    b = [tuple(r) for r in ivf_topk_from_index(spark, sf_dir).collect()]
    assert a == b


def test_ivf_fused_kernel_equals_registered(spark, sf_dir):
    """The registered t25 default since r15 (fused Arrow score+fold
    kernel, VERDICT r14 wrong #2) must produce exactly the from-index
    reference form's rows — same routing, same HALF_UP rounding, same
    tie-exact per-probe fold, one Arrow crossing instead of
    JVM-HOF-score + separate fold crossing; the chain to the in-session
    operator closes via test_ivf_from_index_equals_in_session."""
    from mapreduce_google_spark.operators.similarity import (
        ivf_topk_from_index,
        ivf_topk_from_index_fused,
    )

    a = [tuple(r) for r in ivf_topk_from_index(spark, sf_dir).collect()]
    b = [tuple(r) for r in ivf_topk_from_index_fused(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_ivf_fused_kernel_equality_at_degenerate_params(spark, sf_dir):
    """The fused kernel's group-wise fold must honor the total order at
    the settings that stress its edges: k=1 (every boundary is a tie
    cut), k far above any cell's candidate count (kk=min(k, B) per
    batch, merge window completes the union), and single-cell probing
    (fewest candidates per probe, most ties at the k-th value). Each
    must equal the reference form exactly."""
    from mapreduce_google_spark.operators.similarity import (
        ivf_topk_from_index,
        ivf_topk_from_index_fused,
    )

    for kwargs in (
        {"k": 1},
        {"k": 50},
        {"n_probe_cells": 1, "k": 3},
        {"n_probes": 3, "k": 7},
    ):
        a = [
            tuple(r)
            for r in ivf_topk_from_index(spark, sf_dir, **kwargs).collect()
        ]
        b = [
            tuple(r)
            for r in ivf_topk_from_index_fused(spark, sf_dir, **kwargs).collect()
        ]
        assert a == b and len(a) > 0, kwargs


def test_cosine_checked_raises_on_zero_norm(spark):
    """ADVICE r16: the fused Arrow kernel raises on any non-finite
    cosine, so the JVM scoring expression its reference form uses must
    fail identically on a degenerate (zero-norm) embedding — loudly,
    via raise_error inside the expression, not by silently ordering
    NaN rows. On non-degenerate rows the checked expression must equal
    the unchecked one exactly (the equality chain to the fused kernel
    rests on it)."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_google_spark.functions.vectors import (
        cosine_similarity,
        cosine_similarity_checked,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 2.0]), (2, [1.0, 3.0], [1.0, 2.0])],
        "id long, a array<float>, b array<float>",
    )
    ok = (
        df.where("id = 2")
        .select(
            F.round(cosine_similarity_checked("a", "b"), 6).alias("c"),
            F.round(cosine_similarity("a", "b"), 6).alias("u"),
        )
        .collect()[0]
    )
    assert ok.c == ok.u and ok.c is not None
    with pytest.raises(Exception, match="zero-norm"):
        df.select(cosine_similarity_checked("a", "b", "test")).collect()
    # ADVICE r17: the contract is the FULL non-finite set, not just
    # zero norms — a NaN or Inf component must raise identically
    # (the Arrow kernel raises on any non-finite cosine).
    for bad_component in (float("nan"), float("inf"), float("-inf")):
        bad = spark.createDataFrame(
            [(1, [bad_component, 1.0], [1.0, 2.0])],
            "id long, a array<float>, b array<float>",
        )
        with pytest.raises(Exception, match="zero-norm or non-finite"):
            bad.select(cosine_similarity_checked("a", "b", "test")).collect()


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


def test_hyperplane_lsh_recall_and_exactness(spark, sf_dir):
    from mapreduce_google_spark.operators.similarity import hyperplane_lsh_topk

    exact_rows = cosine_topk(spark, sf_dir).collect()
    exact = {(r.probe_id, r.vec_id) for r in exact_rows}
    exact_cos = {(r.probe_id, r.vec_id): r.cosine for r in exact_rows}
    approx_rows = hyperplane_lsh_topk(spark, sf_dir).collect()
    # returned cosines must be the TRUE cosines (verify stage is exact)
    for r in approx_rows:
        if (r.probe_id, r.vec_id) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.probe_id, r.vec_id)]) < 1e-9
    # per-probe ranks are 1..n with no self matches
    for r in approx_rows:
        assert r.probe_id != r.vec_id
    recall = len(exact & {(r.probe_id, r.vec_id) for r in approx_rows}) / len(exact)
    # 8 tables x 6 bits OR-amplification on random-ish vectors: a floor,
    # not a tuning target
    assert recall >= 0.15, f"hyperplane LSH recall {recall:.2f}"


def test_dedup_clusters_cover_exact_dup_groups(spark, sf_dir):
    """Exact duplicates (identical normalized text ⇒ jaccard 1.0 ⇒
    identical MinHash signatures) MUST land in the same cluster, and every
    cluster label must be the min doc_id of its members."""
    from collections import defaultdict

    from mapreduce_google_spark.operators.dedup import dedup_clusters, exact_dedup

    clusters = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    assert clusters, "no near-dup clusters found at all"
    # cluster label == min member id
    members = defaultdict(list)
    for doc, lbl in clusters.items():
        members[lbl].append(doc)
    for lbl, docs in members.items():
        assert lbl == min(docs), (lbl, docs)
    # every LSH near-dup pair must be in ONE cluster (edges respected)
    for r in minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b").collect():
        assert clusters[r.doc_a] == clusters[r.doc_b], (r.doc_a, r.doc_b)
    # exact duplicates (identical signatures) must co-cluster — the
    # fixture has none at sf0.001, so this arm only fires when present
    for r in exact_dedup(spark, sf_dir).collect():
        if r.n_dups >= 2:
            assert r.doc_id in clusters


def test_packing_invariants(spark, sf_dir):
    """T64: every document lands in exactly one pack; no pack exceeds the
    budget unless it holds a single oversized doc; the result is
    deterministic across runs; pack count is near the lower bound."""
    from pyspark.sql import functions as F

    from mapreduce_google_spark.operators.text import pack_documents

    budget = 256
    packs = pack_documents(spark, sf_dir, budget=budget).collect()
    n_docs_total = sum(r.n_docs for r in packs)
    assert (
        n_docs_total
        == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    for r in packs:
        assert r.n_tokens <= budget or r.n_docs == 1, r
    # deterministic re-run
    again = pack_documents(spark, sf_dir, budget=budget).collect()
    assert [tuple(r) for r in packs] == [tuple(r) for r in again]
    # waste bound: shard-local greedy stays within 2x of the global
    # lower bound at this corpus' doc-length distribution
    total_tokens = sum(r.n_tokens for r in packs)
    assert len(packs) <= 2 * (total_tokens // budget + 16)


def test_boilerplate_footer_does_not_explode_candidates(spark, tmp_path):
    """max_df / max_bucket skew guards: a shared footer must not turn
    near-dup detection into an all-pairs join.

    Corpus: 30 docs with unique 20-word bodies + one shared 60-word
    footer (footer shingles dominate ⇒ uncapped Jaccard ≈ 0.59 between
    EVERY pair), plus one true duplicate pair (ids 100/101).
    """
    footer = " ".join(f"footer{k}" for k in range(60))
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(20)) + " " + footer)
            for i in range(30)]
    dup_body = " ".join(f"dup{j}" for j in range(20))
    rows += [(100, dup_body + " " + footer), (101, dup_body + " " + footer)]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )

    uncapped = ngram_jaccard_pairs(spark, sf).count()
    assert uncapped == 32 * 31 // 2, "footer should force every pair over threshold"

    capped = ngram_jaccard_pairs(spark, sf, max_df=5).collect()
    assert [(r.doc_a, r.doc_b) for r in capped] == [(100, 101)]
    assert capped[0].jaccard == 1.0  # identical docs once footer is stripped

    lsh = minhash_lsh_pairs(spark, sf, max_df=5).collect()
    assert [(r.doc_a, r.doc_b) for r in lsh] == [(100, 101)]

    # bucket cap alone: max_bucket=1 drops every bucket that could emit a
    # candidate pair — the guard must reach the candidate join
    assert minhash_lsh_pairs(spark, sf, max_bucket=1).count() == 0

    # warn_df guard (non-semantic): fires on the boilerplate corpus
    # (footer df=32 > warn_df=5), names the fan-out, and changes NOTHING
    # about the result set
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        warned = ngram_jaccard_pairs(spark, sf, warn_df=5).count()
    hot = [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert hot and "quadratic" in str(hot[0].message)
    assert warned == uncapped, "warn_df must not change results"

    # the REGISTERED default (max_bucket=1000) is a pure safety net: on
    # buckets under the cap it must change nothing vs guards-off
    unguarded = minhash_lsh_pairs(spark, sf, max_bucket=None).count()
    assert minhash_lsh_pairs(spark, sf).count() == unguarded


def test_t21_warn_df_guard_silent_on_clean_corpus(spark, sf_dir):
    """The default warn_df=1000 guard must be a no-op on the real test
    corpus: no warning, identical pairs to the guard-off run."""
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        guarded = {tuple(r) for r in ngram_jaccard_pairs(spark, sf_dir).collect()}
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]
    bare = {
        tuple(r) for r in ngram_jaccard_pairs(spark, sf_dir, warn_df=None).collect()
    }
    assert guarded == bare and len(guarded) > 0


def test_embedding_lsh_pairs_equal_exact(spark, sf_dir):
    """t24's LSH-candidate → verify pipeline must reproduce the exact
    all-pairs result on the oracle datasets (64 tables x 3 bits ⇒
    expected misses ~5e-6 — see operator docstring)."""
    from mapreduce_google_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )

    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_dup_pairs_exact(spark, sf_dir).collect()
    }
    lsh = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_dup_pairs(spark, sf_dir).collect()
    }
    assert lsh == exact


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """T71's GK sketch vs T35's exact interpolation: with accuracy=1000
    the rank error is ≤ 0.1%, so on ~300-member segments the approx
    value must land within the neighborhood of the exact one (a few
    adjacent order statistics — bounded here by 2% of the value range)."""
    from mapreduce_google_spark.operators.relational import (
        approx_segment_percentiles,
        segment_percentiles,
    )

    from mapreduce_google_spark.io import load_table

    exact = {r.c_mktsegment: r for r in segment_percentiles(spark, sf_dir).collect()}
    approx = {
        r.c_mktsegment: r for r in approx_segment_percentiles(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    vals: dict[str, list[float]] = {}
    for r in load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    ).collect():
        vals.setdefault(r.c_mktsegment, []).append(r.c_acctbal)

    def rank_q(seg: str, v: float) -> float:
        s = sorted(vals[seg])
        import bisect

        return bisect.bisect_left(s, v) / max(len(s) - 1, 1)

    for seg, a in approx.items():
        assert a.n_customers == exact[seg].n_customers
        # GK guarantees the returned value is an actual element whose rank
        # is within 1/accuracy of the target quantile; on tiny sf0.001
        # groups (~30 rows) grant ±2 order statistics of slack
        slack = 1 / 1000 + 2.5 / a.n_customers
        assert round(a.median_acctbal, 2) in [round(v, 2) for v in vals[seg]]
        assert abs(rank_q(seg, a.median_acctbal) - 0.5) <= slack, (seg, a)
        assert abs(rank_q(seg, a.p90_acctbal) - 0.9) <= slack, (seg, a)


def test_lsh_from_band_table_equals_direct(spark, sf_dir):
    """The materialized-band-table LSH path (signature pass paid once,
    candidate-only verify) must produce exactly the direct operator's
    pairs."""
    from mapreduce_google_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_from_bands,
    )

    direct = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }
    from_tbl = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs_from_bands(spark, sf_dir).collect()
    }
    assert from_tbl == direct
    # the retokenizing (store-less) verify is the fallback contract —
    # pin it to the same pair set
    retok = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs_from_bands(
            spark, sf_dir, use_shingle_store=False
        ).collect()
    }
    assert retok == direct


def test_lsh_retok_fallback_matches_direct_with_max_df(spark, sf_dir):
    """ADVICE r14: with max_df set, the store-less fallback verify used
    to compute the stop-set over only the CANDIDATE-pruned documents —
    document frequencies from a tiny subset — while the direct operator
    and the store path both derive it from the full corpus, so the two
    verify paths could disagree on Jaccard values. Pin all three forms
    equal at a max_df low enough that the stop-set is non-empty (so the
    test actually exercises the divergent computation)."""
    from pyspark.sql import functions as F

    from mapreduce_google_spark.operators.dedup import (
        _doc_shingle_arrays,
        minhash_lsh_pairs,
        minhash_lsh_pairs_from_bands,
    )
    from mapreduce_google_spark.io import load_table

    max_df = 3
    stop_n = (
        _doc_shingle_arrays(load_table(spark, sf_dir, "documents"))
        .select(F.explode("shingles").alias("s"))
        .groupBy("s")
        .count()
        .where(F.col("count") > max_df)
        .count()
    )
    assert stop_n > 0, "max_df too high to exercise the stop-set"
    direct = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(spark, sf_dir, max_df=max_df).collect()
    }
    stored = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs_from_bands(
            spark, sf_dir, max_df=max_df
        ).collect()
    }
    retok = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs_from_bands(
            spark, sf_dir, max_df=max_df, use_shingle_store=False
        ).collect()
    }
    assert stored == direct
    assert retok == direct


def test_signatures_from_hashes_equal_string_pipeline(spark, sf_dir):
    """The band-table build derives MinHash signatures from the stored
    xxhash64 values via a PARALLEL fold (``_signatures_from_hashes``),
    deliberately duplicated so the fingerprint-pinned in-session
    pipeline stays byte-identical — this test is what keeps the two
    folds from drifting apart: per-doc signatures must be EQUAL, not
    merely produce the same candidate pairs."""
    from pyspark.sql import functions as F

    from mapreduce_google_spark.io import load_table
    from mapreduce_google_spark.operators.dedup import (
        _doc_shingle_arrays,
        _signatures_from_hashes,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sets = _doc_shingle_arrays(docs, 3)
    ref = {
        r.doc_id: tuple(r.signature)
        for r in minhash_signatures(docs, 3, 32, shingle_arrays=sets).collect()
    }
    hashed = sets.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(F.transform("shingles", lambda s: F.xxhash64(s)))
        ).alias("xh"),
    )
    got = {
        r.doc_id: tuple(r.signature)
        for r in _signatures_from_hashes(hashed, 32).collect()
    }
    assert got == ref and len(ref) > 0


def test_lsh_steady_state_never_scans_raw_corpus(spark, sf_dir):
    """With both durable assets in place (band table + shingle store),
    a t22 run must not touch documents.parquet at all: candidates come
    from the band table, verify arrays from the shingle store. This is
    the steady-state property the r14 store buys — re-tokenizing
    candidates was the remaining per-run cost (VERDICT r13 item 4)."""
    from mapreduce_google_spark.operators.dedup import (
        minhash_lsh_pairs_from_bands,
    )
    from mapreduce_google_spark.plans import formatted_plan

    df = minhash_lsh_pairs_from_bands(spark, sf_dir)
    plan = formatted_plan(df)
    assert "documents.parquet" not in plan, plan
    # and the store-backed run still returns a plausible pair set
    assert df.count() > 0


def test_kmeans_clusters_invariants(spark, sf_dir):
    """Lloyd's fit (t82): full coverage, deterministic across runs, and
    training must improve mean assignment cosine over the raw seeds."""
    from mapreduce_google_spark.operators.similarity import kmeans_cluster_stats

    trained = kmeans_cluster_stats(spark, sf_dir, n_cells=8, iters=3).collect()
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in trained) == total
    assert len(trained) <= 8
    assert all(r.min_cos <= r.mean_cos for r in trained)

    again = kmeans_cluster_stats(spark, sf_dir, n_cells=8, iters=3).collect()
    assert [tuple(r) for r in trained] == [tuple(r) for r in again]

    seed = kmeans_cluster_stats(spark, sf_dir, n_cells=8, iters=0).collect()
    wm = lambda rows: sum(r.mean_cos * r.n_members for r in rows) / total
    assert wm(trained) > wm(seed), (wm(trained), wm(seed))


def test_t222_repetition_flags_planted_docs(spark, tmp_path):
    """The Gopher-threshold screen must flag a planted pathological doc
    (one token repeated: dup rates ~1 across all three grams), must NOT
    flag an all-distinct doc (rates exactly 0), and the reported rates
    must be the exact micro-averages."""
    from mapreduce_google_spark.operators.textstats import intradoc_repetition

    diverse = " ".join(f"w{i}" for i in range(40))  # all words distinct
    spammy = " ".join(["spam"] * 40)
    rows = [(1, diverse, "en", "clean", len(diverse)),
            (2, spammy, "en", "spam", len(spammy))]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = {r.source: r for r in intradoc_repetition(spark, sf).collect()}
    assert got["clean"].n_flagged == 0
    assert got["clean"].dup_word_rate == 0.0
    assert got["clean"].dup_2gram_rate == 0.0
    assert got["spam"].n_flagged == 1
    # 40 occurrences, 1 distinct → (40-1)/40; 39 bigrams, 1 distinct...
    assert got["spam"].dup_word_rate == round(39 / 40, 6)
    assert got["spam"].dup_2gram_rate == round(38 / 39, 6)
    assert got["spam"].dup_3gram_rate == round(37 / 38, 6)


def test_incremental_dedup_from_store_equals_direct(spark, sf_dir):
    """The bucketed-store ingest path must reproduce t65's exact
    result (same survivors, same batch-dup counts)."""
    from mapreduce_google_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_from_store,
    )

    direct = [tuple(r) for r in incremental_dedup(spark, sf_dir).collect()]
    stored = [tuple(r) for r in incremental_dedup_from_store(spark, sf_dir).collect()]
    assert stored == direct and len(direct) > 0


def test_bucketed_tables_adopted_not_rebuilt_across_sessions(spark, sf_dir):
    """A fresh session's in-memory catalog loses the table entry while
    the bucketed parquet survives; the builder must ADOPT the files via
    DDL (metadata-only, file mtimes untouched) instead of re-running the
    signature pass, and the adopted table must keep the bucketed-scan
    property (exchange-free candidate join)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from mapreduce_google_spark.io import shared_store_path
    from mapreduce_google_spark.operators.dedup import minhash_band_table
    from mapreduce_google_spark.plans import formatted_plan

    name = minhash_band_table(spark, sf_dir)
    # the effective name doubles as the store's directory name under the
    # per-user root (r14 moved stores off the world-writable /tmp/{name})
    path = shared_store_path(name)
    before = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/part-*")}
    assert before, "band table has no files"
    # simulate the fresh-session state: catalog entry gone, files kept
    # (DROP on this external table removes metadata only)
    spark.sql(f"DROP TABLE {name}")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))

    name2 = minhash_band_table(spark, sf_dir)
    assert name2 == name
    after = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/part-*")}
    assert after == before, "adoption rewrote the table"
    banded = spark.table(name)
    a, b = banded.hint("merge").alias("a"), banded.alias("b")
    plan = formatted_plan(
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
    )
    assert "SortMergeJoin" in plan and "Exchange" not in plan, plan


def test_adoption_refuses_non_bucketed_files(spark, tmp_path):
    """A warm directory holding PLAIN parquet at the table's path (e.g.
    left by an older layout or a foreign writer) must be rebuilt, never
    adopted — adopting it would make every scan fail with
    'Invalid bucket file' or silently mis-route co-located joins. Plain
    parquet carries no ``_BUCKET_SPEC.json`` sidecar, so the adoption
    check rejects it; a retired-scheme sibling (``_k4``, pre-r12) is
    additionally SWEPT — it can never be adopted again (VERDICT r12)."""
    import os

    from mapreduce_google_spark.io import (
        adopt_or_build_bucketed_table,
        bucket_table_suffix,
    )

    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    base = str(tmp_path / "poisoned")
    suffix = bucket_table_suffix(4, ["k"])
    # plant non-bucketed files at the EXACT path the builder will use,
    # plus a stranded store under the retired pre-r12 suffix scheme
    df.write.mode("overwrite").parquet(f"{base}{suffix}")
    df.write.mode("overwrite").parquet(f"{base}_k4")
    assert os.path.exists(f"{base}{suffix}/_SUCCESS")
    # age the stranded sibling past the sweep's retention floor (a
    # YOUNG sidecar-less dir is skipped — it may be a peer mid-build)
    os.utime(f"{base}_k4", (1.0, 1.0))

    name = adopt_or_build_bucketed_table(
        spark, "mgs_test_poisoned_adopt", base, ["k"], 4, lambda: df
    )
    try:
        assert name.endswith(suffix)
        # scan + bucket metadata must both be healthy after the rebuild
        assert spark.table(name).count() == 100
        data_files = [
            f for f in os.listdir(f"{base}{suffix}") if f.startswith("part-")
        ]
        assert all("_000" in f for f in data_files), data_files
        # the rebuilt store is sidecar-stamped (adoptable next session)
        assert os.path.exists(f"{base}{suffix}/_BUCKET_SPEC.json")
        # the retired-scheme sibling was swept, not left as junk
        assert not os.path.exists(f"{base}_k4")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucket_count_is_part_of_table_identity(spark, tmp_path):
    """Calling with a different num_buckets must land on a DIFFERENT
    table+path — files hashed mod M adopted under metadata declaring N
    silently break co-located anti-joins (the incremental-dedup wrong-
    results scenario)."""
    from mapreduce_google_spark.io import (
        adopt_or_build_bucketed_table,
        bucket_table_suffix,
    )

    df = spark.range(50).selectExpr("id", "id % 3 AS k")
    base = str(tmp_path / "identity")
    n4 = adopt_or_build_bucketed_table(
        spark, "mgs_test_identity", base, ["k"], 4, lambda: df
    )
    n8 = adopt_or_build_bucketed_table(
        spark, "mgs_test_identity", base, ["k"], 8, lambda: df
    )
    try:
        assert n4 != n8
        assert n4.endswith(bucket_table_suffix(4, ["k"]))
        assert n8.endswith(bucket_table_suffix(8, ["k"]))
        # both sidecar-stamped stores coexist — the sweep removes only
        # sidecar-LESS (retired-scheme) siblings, never live specs
        assert spark.table(n4).count() == spark.table(n8).count() == 50
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {n4}")
        spark.sql(f"DROP TABLE IF EXISTS {n8}")


def test_t24_auto_param_derivation():
    """The r18-staged auto-sizing (VERDICT r17 item 4): oracle scale
    must resolve to EXACTLY the certified (3, 64); bigger corpora get
    log-scaled bits with the table count re-derived from the collision
    probability at the threshold boundary, floored at 64 and capped at
    256 (at theta=0.4 / b=12 the delta=1e-3 count is ~1,740 — the cap
    is the documented recall tradeoff, while theta=0.7 fits under it)."""
    import math

    from mapreduce_google_spark.operators.similarity import (
        _auto_lsh_near_dup_params,
    )

    assert _auto_lsh_near_dup_params(500, 0.4) == (3, 64)
    assert _auto_lsh_near_dup_params(0, 0.4) == (3, 64)  # missing table
    b_01, t_01 = _auto_lsh_near_dup_params(5_000, 0.4)
    assert (b_01, t_01) == (7, 174)
    b_1, t_1 = _auto_lsh_near_dup_params(200_000, 0.4)
    assert (b_1, t_1) == (12, 256)  # capped: low-threshold tradeoff
    # expected bucket stays ~target regardless of N
    for n in (5_000, 200_000, 20_000_000):
        b, _ = _auto_lsh_near_dup_params(n, 0.4)
        assert 32 <= n / 2**b <= 128, (n, b)
    # at a true near-dup threshold the re-derived table count fits the
    # cap with delta honored
    b7, t7 = _auto_lsh_near_dup_params(200_000, 0.7)
    p7 = 1 - math.acos(0.7) / math.pi
    assert t7 < 256 and (1 - p7**b7) ** t7 <= 1e-3


def test_t24_auto_equals_registered_at_oracle_scale(spark, sf_dir):
    """Staging gate (t22/t77 precedent): at oracle scale the auto form
    resolves to (3, 64) and its result must be IDENTICAL to the
    registered builder (which equals the exact all-pairs form); the
    max_bucket guard never fires at N=500 (cap 10,000) and must appear
    in the plan exactly when on."""
    from mapreduce_google_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_auto,
    )
    from mapreduce_google_spark.plans import formatted_plan
    from mapreduce_google_spark.queries import REGISTRY

    # the r19 flip: the auto form IS the registered default now, and
    # the fixed-(3,64) form below is the certified reference it must
    # equal at oracle scale
    assert (
        REGISTRY["t24_embedding_near_dup"].builder
        is embedding_near_dup_pairs_auto
    )
    registered = [
        tuple(r) for r in embedding_near_dup_pairs(spark, sf_dir).collect()
    ]
    auto = [
        tuple(r) for r in embedding_near_dup_pairs_auto(spark, sf_dir).collect()
    ]
    assert auto == registered and len(auto) > 0
    nocap = [
        tuple(r)
        for r in embedding_near_dup_pairs_auto(
            spark, sf_dir, max_bucket=None
        ).collect()
    ]
    assert nocap == registered
    # r19 verify kernel: the Arrow einsum verify (default) must equal
    # the interpreted HOF verify row-for-row — the rounding-parity
    # contract the t18/t25 kernels ship on (_round_half_up_6)
    hof = [
        tuple(r)
        for r in embedding_near_dup_pairs_auto(
            spark, sf_dir, verify="hof"
        ).collect()
    ]
    assert hof == auto
    plan_on = formatted_plan(embedding_near_dup_pairs_auto(spark, sf_dir))
    plan_off = formatted_plan(
        embedding_near_dup_pairs_auto(spark, sf_dir, max_bucket=None)
    )
    assert "LeftAnti" in plan_on, plan_on
    assert "LeftAnti" not in plan_off, plan_off


def test_t145_auto_cells_derivation_and_oracle_equality(spark, sf_dir):
    """Staging gate for the t145 auto-cells form: the derivation clamps
    to the certified 8 cells at oracle scale (bit-identical output) and
    scales the cell count linearly with N in between the clamps."""
    from mapreduce_google_spark.operators.similarity import (
        _auto_semantic_cells,
        semantic_dedup,
        semantic_dedup_auto,
        semantic_dedup_invariants_auto,
    )
    from mapreduce_google_spark.queries import REGISTRY

    # the r19 flip: the registered t145 builder derives its cell count
    # through the same _auto_semantic_cells pinned below
    assert (
        REGISTRY["t145_semantic_dedup_invariants"].builder
        is semantic_dedup_invariants_auto
    )
    assert _auto_semantic_cells(500) == 8
    assert _auto_semantic_cells(0) == 8
    assert _auto_semantic_cells(5_000) == 10
    assert _auto_semantic_cells(200_000) == 400
    assert _auto_semantic_cells(10_000_000) == 4096  # broadcast cap
    registered = [tuple(r) for r in semantic_dedup(spark, sf_dir).collect()]
    auto = [tuple(r) for r in semantic_dedup_auto(spark, sf_dir).collect()]
    assert auto == registered and len(auto) > 0
