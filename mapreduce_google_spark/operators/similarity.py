"""Similarity search over the ``embeddings`` table (``array<float>``).

Brute-force cosine top-k is the exact baseline: probes are broadcast, the
dot product runs JVM-side via higher-order functions (zip_with/aggregate),
and the per-probe top-k is a TakeOrdered-style window — the big side is
scanned once with no shuffle of the embedding column.

The IVF variant is the scale path: vectors are bucketed by nearest
centroid once (one narrow shuffle), probes search only their ``n_probe``
closest buckets — at 100 TB this turns a full scan per probe into a
~(n_probe/n_cells) fraction scan. It is approximate; tests measure recall
against the brute-force baseline rather than pretending equivalence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_google_spark.functions.vectors import cosine_similarity, dot
from mapreduce_google_spark.io import load_table


def _probes(emb: DataFrame, n_probes: int) -> DataFrame:
    """Deterministic probe set: the ``n_probes`` lowest vec_ids."""
    return (
        emb.orderBy("vec_id")
        .limit(n_probes)
        .select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
        )
    )


def cosine_topk(
    spark: SparkSession, sf_dir: str, n_probes: int = 10, k: int = 5
) -> DataFrame:
    """T18 — exact top-k cosine neighbors for the 10 lowest-vec_id probes.

    Similarity is rounded to 6 decimals BEFORE ranking so the rank order
    (and the oracle's) is defined on identical values; ties break on
    vec_id asc. Self-matches excluded.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probes = F.broadcast(_probes(emb, n_probes))
    scored = (
        emb.crossJoin(probes)
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_similarity("probe_vec", "embedding"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.select("probe_id", "vec_id", "cosine", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def _round_half_up_6(x: np.ndarray) -> np.ndarray:
    """Vectorized HALF_UP (round-half-away-from-zero) at 6 decimals —
    the same rounding mode as Spark's ``F.round`` and DuckDB's
    ``round`` (ADVICE r13: ``np.round`` is half-to-EVEN, a systematic
    divergence on exact .5e-6 boundaries). Residual caveat, accepted:
    Spark rounds the SHORTEST-DECIMAL-REPR of the double
    (``BigDecimal.valueOf``) while this rounds the binary value, so a
    double whose true value and repr straddle a half boundary (a
    sub-ulp coincidence) can still differ — the pre-round BLAS vs
    codegen dots already differ in the last ulp anyway, which is why
    the cross-form contract is pinned by equality tests on real
    corpora, not claimed absolute."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _batch_topk_rows(
    cos: np.ndarray, vec_ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-probe partial top-k within one scored batch: for each column
    of the (B, P) rounded-cosine matrix, the row indices of its top
    ``min(k, B)`` entries under the FINAL total order (cosine desc,
    vec_id asc). Returns (row_idx, col_idx) flat index arrays.

    Containment is exact, not approximate: the global top-k of a union
    under a total order is contained in the union of per-part top-k
    under the SAME order, so feeding only these rows to the merge
    window cannot change the result. Ties at the k-th value are why the
    selection can't be a bare ``argpartition`` — boundary ties must
    break by vec_id exactly as the window will, so candidates at or
    above the k-th value are re-ordered lexicographically before the
    cut. ``-inf`` entries (masked self-matches) are never emitted."""
    b = cos.shape[0]
    kk = min(k, b)
    rows_out, cols_out = [], []
    for j in range(cos.shape[1]):
        c = cos[:, j]
        if kk < b:
            thresh = np.partition(c, b - kk)[b - kk]  # k-th largest
            cand = np.flatnonzero(c >= thresh)
        else:
            cand = np.arange(b)
        # lexsort: last key is primary → cosine desc, then vec_id asc
        sel = cand[np.lexsort((vec_ids[cand], -c[cand]))[:kk]]
        sel = sel[np.isfinite(c[sel])]
        rows_out.append(sel)
        cols_out.append(np.full(len(sel), j, dtype=np.int64))
    return np.concatenate(rows_out), np.concatenate(cols_out)


def _gemm_scored(
    spark: SparkSession, sf_dir: str, n_probes: int = 10, k: int = 5
) -> DataFrame:
    """The t18 GEMM scoring kernel with PER-BATCH PARTIAL TOP-K: each
    Arrow batch computes ``(batch × d) @ (d × n_probes)`` once, rounds
    HALF_UP to 6 decimals, masks self-matches, and emits only its
    per-probe top-k rows — ≤ ``n_probes·k`` rows per batch instead of
    ``batch_rows·n_probes``.

    This is the r13→r14 scale fix (VERDICT r13 "What's wrong #1"): the
    final ``Window.partitionBy(probe_id)`` rank previously received the
    FULL scored relation — N·P rows hash-partitioned into effectively
    P non-empty partitions, so 10 probes over 10^10 vectors meant ~10^11
    rows sorted by 10 tasks while every other stage scaled with the
    cluster. With the fold inside the kernel the exchange carries
    ``k·P·num_batches`` rows (k·P per scan task), the merge window is
    probe-sized work, and the scan+GEMM remain the only O(N) stages."""
    emb = load_table(spark, sf_dir, "embeddings")
    # n_probes rows — probe-sized collect (same class as IVF centroids)
    probe_rows = _probes(emb, n_probes).collect()
    pids = np.asarray([r.probe_id for r in probe_rows], dtype=np.int64)
    pmat = np.vstack(
        [np.asarray(r.probe_vec, dtype=np.float64) for r in probe_rows]
    )  # (P, d)
    pnorm = np.sqrt((pmat * pmat).sum(axis=1))  # (P,)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch — vstack would raise
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            dots = mat @ pmat.T  # (B, P)
            norms = np.sqrt((mat * mat).sum(axis=1))  # (B,)
            cos = _round_half_up_6(dots / (norms[:, None] * pnorm[None, :]))
            # self-matches masked BEFORE the fold — excluding them after
            # a top-k cut could leave a batch one candidate short
            cos[vec_ids[:, None] == pids[None, :]] = -np.inf
            ri, ci = _batch_topk_rows(cos, vec_ids, k)
            yield pd.DataFrame(
                {
                    "probe_id": pids[ci],
                    "vec_id": vec_ids[ri],
                    "cosine": cos[ri, ci],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        score, "probe_id bigint, vec_id bigint, cosine double"
    )


def cosine_topk_gemm(
    spark: SparkSession, sf_dir: str, n_probes: int = 10, k: int = 5
) -> DataFrame:
    """T18, GEMM form — identical results to :func:`cosine_topk`
    (equality pinned in ``tests/test_approx_ops.py``), with the scoring
    loop as ONE Arrow-batched matrix multiply per partition instead of
    a per-pair higher-order-function expression, and a per-batch
    partial top-k (:func:`_gemm_scored`) so the final merge window
    receives ``k·P·num_batches`` rows, not ``N·P``.

    The HOF form evaluates dot+norms per (probe, vector) pair inside
    codegen — fine, but the probe fan-out re-reads each embedding
    ``n_probes`` times through the expression tree. Here each Arrow
    batch computes ``(batch × d) @ (d × n_probes)`` once; probes ride
    along as a broadcast numpy constant (they are n_probes rows —
    probe-sized, the same driver-collect class as IVF centroids). The
    cosine is assembled exactly like the HOF form — raw dot divided by
    the norm product, then rounded HALF_UP to 6 decimals exactly like
    ``F.round`` — so the two paths agree to the rounding that defines
    the rank order. At 100 TB the GEMM batch is the difference between
    FLOPs limited by expression interpretation and FLOPs at BLAS speed,
    and the kernel fold is what keeps the rank stage off the O(N) path.
    """
    scored = _gemm_scored(spark, sf_dir, n_probes, k).where(
        F.col("vec_id") != F.col("probe_id")  # defensive: kernel masks
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.select(
            "probe_id", "vec_id", "cosine", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def embedding_near_dup_pairs_exact(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    """Embedding-cosine near-dup, brute all-pairs form.

    Quadratic (BroadcastNestedLoopJoin on ``id_a < id_b``) — kept ONLY as
    the verification baseline for tests and as the semantic definition
    the DuckDB oracle mirrors. The registered t24 operator is
    :func:`embedding_near_dup_pairs` (LSH candidates → exact verify),
    which produces the same rows without the quadratic join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("vec_a", "vec_b"), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def embedding_near_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    n_tables: int = 64,
    n_bits: int = 3,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """T24 — embedding near-dup pairs: hyperplane-LSH candidate buckets →
    exact cosine verify. Same candidate-then-verify shape as
    :func:`~mapreduce_google_spark.operators.dedup.minhash_lsh_pairs`.

    Stage 1 (candidates): each vector gets ``n_tables`` bucket ids —
    ``n_bits`` sign bits of dot products against fixed random hyperplanes
    — computed as ONE Arrow-batched matrix multiply per partition
    (``pandas_udf``: (batch × dim) @ (dim × tables·bits); a GEMM beats
    per-element codegen for hundreds of planes). Candidates are pairs
    sharing any (table, bucket) — an EQUI-join, so the plan is a hash
    join on the bucket key, never a nested loop over all pairs.

    Stage 2 (verify): exact JVM-side cosine on candidates only, then the
    threshold — so precision is 1.0 by construction and any candidate
    miss is the only error source.

    Parameter choice: with bit-collision probability p = 1 − θ/π ≈ 0.63
    at cosine 0.4, a qualifying pair misses ALL 64 3-bit tables with
    probability (1 − p³)^64 ≈ 9e-9 — ~5e-6 expected missing pairs on the
    oracle datasets (measured), so the result equals the all-pairs form
    (``tests/test_approx_ops.py`` asserts exact equality; the driver
    hash-checks it against the brute-force SQL oracle). At 100 TB you
    raise ``n_bits`` with corpus size to keep buckets bounded and accept
    the measured recall; the dataflow is unchanged.
    """
    lsh_buckets = _lsh_bucket_udf(dim, n_tables, n_bits, seed)
    emb = load_table(spark, sf_dir, "embeddings")
    banded = emb.select(
        "vec_id",
        F.posexplode(lsh_buckets("embedding")).alias("tbl", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("vec_a", "vec_b"), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _auto_lsh_near_dup_params(
    n_vecs: int,
    threshold: float,
    target_bucket: int = 64,
    max_tables: int = 256,
    delta: float = 1e-3,
) -> tuple[int, int]:
    """Derive (n_bits, n_tables) for :func:`embedding_near_dup_pairs_auto`
    from the corpus size — the tables/recall re-derivation VERDICT r17
    item 4 asked for (the registered t24 fixes n_bits=3, whose 8
    buckets/table over 200k vectors reconstruct ~1.6e11 candidates and
    HANG at sf1).

    Math (Charikar 2002 sign-random-projection): a pair at cosine θ
    agrees on one sign bit w.p. p = 1 − arccos(θ)/π, on a b-bit bucket
    w.p. p^b, and misses all T tables w.p. (1 − p^b)^T.

    * ``n_bits``: ceil(log2(N / target_bucket)) so the EXPECTED bucket
      holds ~target_bucket vectors regardless of N — candidate volume
      is then T·N·target_bucket/2 (linear in N), never quadratic.
      Floored at 3 = the certified oracle-scale regime (N = 500 ≤
      8·target_bucket keeps 3 bits, so sf0.01 results are bit-identical
      to the registered builder).
    * ``n_tables``: ceil(ln(1/δ)/p^b) for per-pair miss rate δ at the
      THRESHOLD boundary (pairs further above θ recall strictly
      better), floored at the certified 64 and capped at ``max_tables``
      — the cap is the honest LSH tradeoff: at θ = 0.4 (p = 0.631) and
      b = 12 the δ=1e-3 table count is ~1,740, so the capped detector's
      boundary recall degrades to 1−(1−p^b)^256 ≈ 0.64 while cos ≥ 0.7
      pairs still recall ≥ 0.9996. Low-threshold exhaustiveness at
      scale is a job for the exact/oracle path on samples, not for
      more LSH tables.
    """
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    n_bits = 3
    if n_vecs > 8 * target_bucket:
        n_bits = max(3, math.ceil(math.log2(n_vecs / target_bucket)))
    need = math.ceil(math.log(1.0 / delta) / (p**n_bits))
    n_tables = max(64, min(max_tables, need))
    return n_bits, n_tables


def _pairwise_cosine_verify(pairs: DataFrame, threshold: float) -> DataFrame:
    """Arrow-batched exact-cosine verify for candidate pairs: one
    vectorized ``einsum`` per batch over the attached (vec_a, vec_b)
    columns, rounded HALF_UP to 6 decimals exactly like ``F.round``
    (:func:`_round_half_up_6` — the t18/t25 GEMM parity treatment),
    thresholded INSIDE the kernel so only passing rows re-enter the JVM.

    Why (r19, guide §4.2 — BENCH_t24_verify_kernel_probe.json): the
    higher-order-function cosine is interpreted per element
    (StringSplit/t129 lesson applies to ``aggregate``/``zip_with``
    too), so a verify stage over tens of millions of candidates costs
    ~190 interpreted lambda frames per pair; the kernel pays one Arrow
    transfer of exactly the four needed columns and scores the whole
    batch at NumPy speed. Rounding parity with the HOF form carries the
    same pinned contract as the t18/t25 kernels (equality on real
    corpora; the pre-round last-ulp BLAS-vs-codegen difference is
    absorbed by the 6-decimal round away from sub-ulp boundary
    coincidences)."""
    import pandas as _pd

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.vstack(pdf["vec_a"].to_numpy()).astype(np.float64)
            B = np.vstack(pdf["vec_b"].to_numpy()).astype(np.float64)
            dots = np.einsum("bi,bi->b", A, B)
            na = np.sqrt(np.einsum("bi,bi->b", A, A))
            nb = np.sqrt(np.einsum("bi,bi->b", B, B))
            cos = _round_half_up_6(dots / (na * nb))
            keep = cos >= threshold
            yield _pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": cos[keep],
                }
            )

    return pairs.select("id_a", "id_b", "vec_a", "vec_b").mapInPandas(
        score, "id_a bigint, id_b bigint, cosine double"
    )


def embedding_near_dup_pairs_auto(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    target_bucket: int = 64,
    max_tables: int = 256,
    delta: float = 1e-3,
    max_bucket: int | None = 10_000,
    dim: int = 64,
    seed: int = 42,
    verify: str = "arrow",
) -> DataFrame:
    """t24's pipeline with corpus-sized LSH parameters — the r19 flip
    candidate, STAGED r18 (closure-disjoint from the registered builder
    until its REPROVE slot lands; the t22/t77 staging precedent).

    Identical candidate→verify dataflow to
    :func:`embedding_near_dup_pairs`; the two changes are (1)
    ``(n_bits, n_tables)`` derived from the parquet-footer row count by
    :func:`_auto_lsh_near_dup_params` (metadata-only — no Spark job;
    N = 500 at oracle scale resolves to exactly the certified (3, 64),
    so sf0.01 results are bit-identical), and (2) the family-contract
    ``max_bucket`` guard: (tbl, bucket) groups larger than the cap are
    pruned from the left self-join side (duplicate-heavy corpora
    collapse LSH buckets exactly like simhash bands — exact dedup
    should run upstream; the cap documents that contract). The default
    cap is ~150× the target bucket size, so it fires only on true
    collapse, never on Poisson skew.
    """
    from mapreduce_google_spark.io import parquet_rows

    n_vecs = parquet_rows(sf_dir, "embeddings")
    n_bits, n_tables = _auto_lsh_near_dup_params(
        n_vecs if n_vecs is not None else 0,
        threshold,
        target_bucket=target_bucket,
        max_tables=max_tables,
        delta=delta,
    )
    lsh_buckets = _lsh_bucket_udf(dim, n_tables, n_bits, seed)
    emb = load_table(spark, sf_dir, "embeddings")
    banded = emb.select(
        "vec_id",
        F.posexplode(lsh_buckets("embedding")).alias("tbl", "bucket"),
    ).repartition("tbl", "bucket")
    # cache: the guard profile and both self-join sides read the banded
    # set (the t77 recipe); left to in-session LRU like its siblings
    banded = banded.cache()
    left = banded
    if max_bucket is not None:
        oversized = (
            banded.groupBy("tbl", "bucket")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > max_bucket)
            .select("tbl", "bucket")
        )
        left = banded.join(
            F.broadcast(oversized), ["tbl", "bucket"], "left_anti"
        )
    a, b = left.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    pairs = candidates.join(va, "id_a").join(vb, "id_b")
    if verify == "arrow":
        # r19 (BENCH_t24_verify_kernel_probe.json): the verify stage
        # dominated the sf1 cost — 83M surviving candidate pairs each
        # paying ~190 interpreted HOF lambda frames (~85 of 133 s).
        # The Arrow kernel scores whole batches vectorized; the HOF
        # form stays reachable below (shootout/equality substrate).
        return _pairwise_cosine_verify(pairs, threshold).orderBy(
            "id_a", "id_b"
        )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("vec_a", "vec_b"), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def ivf_assignments(
    emb: DataFrame, n_cells: int = 8
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: centroids = embeddings of the ``n_cells`` lowest
    vec_ids (deterministic seed choice); every vector is assigned to its
    max-cosine centroid. Returns (centroids, assignments)."""
    centroids = F.broadcast(
        emb.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cell_cos").desc(), F.col("cell_id").asc()
    )
    assigned = (
        emb.crossJoin(centroids)
        .select(
            "vec_id",
            "embedding",
            "cell_id",
            F.round(cosine_similarity("embedding", "centroid"), 6).alias("cell_cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell_id")
    )
    return centroids, assigned


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_probes: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe_cells: int = 3,
) -> DataFrame:
    """Approximate top-k: search only the ``n_probe_cells`` cells whose
    centroids are closest to each probe. Rows-only for the driver;
    ``tests/test_approx_ops.py::test_ivf_recall`` measures recall vs
    :func:`cosine_topk`.

    Honest scale accounting (benched next to exact t18, BENCH_sf1):
    at sf1 with the default 10 probes IVF is SLOWER than brute force
    (4.77 s vs 3.92 s, recall 1.0) — the centroid assignment pass over
    the full corpus is a fixed cost that only amortizes when the probe
    workload is large. Per-probe scan cost is corpus·(n_probe_cells/
    n_cells) vs corpus for exact, so the crossover is at roughly
    n_probes > assignment_cost/(scan_saving_per_probe): thousands of
    probes (the ANN-serving shape), not ten. At 100 TB the assignment
    is precomputed once into a partitioned index (the band-table
    pattern) and every query-time probe pays only the bucketed scan —
    that is the regime the IVF path exists for.

    Measured crossover (tools/ann_crossover.py at sf1, recorded in
    BENCH_ann_crossover.json): 10 probes — brute 4.9 s vs IVF 5.6 s
    (the losing point above); 100 probes — brute 34.9 s vs IVF 15.9 s;
    1000 probes — brute 322 s vs IVF 124 s, recall 1.0 throughout. The
    1000-probe speedup (2.6x) sits at the n_cells/n_probe_cells = 8/3
    arithmetic cap, confirming the scan-fraction model.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assigned = ivf_assignments(emb, n_cells)
    probes = F.broadcast(_probes(emb, n_probes))
    wc = Window.partitionBy("probe_id").orderBy(
        F.col("c_cos").desc(), F.col("cell_id").asc()
    )
    probe_cells = (
        probes.crossJoin(centroids)
        .select(
            "probe_id",
            "probe_vec",
            "cell_id",
            F.round(cosine_similarity("probe_vec", "centroid"), 6).alias("c_cos"),
        )
        .withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") <= n_probe_cells)
        .select("probe_id", "probe_vec", "cell_id")
    )
    scored = (
        probe_cells.join(assigned, "cell_id")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_similarity("probe_vec", "embedding"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.select(
            "probe_id", "vec_id", "cosine", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def partial_topk_per_batch(scored: DataFrame, k: int) -> DataFrame:
    """Per-Arrow-batch partial top-k fold over a scored relation
    ``(probe_id, vec_id, cosine)`` — the map-side combine of a top-k:
    each batch emits at most ``k`` rows per probe under the final total
    order (cosine desc, vec_id asc), so the downstream merge window
    shuffles ``k·P·num_batches`` rows instead of the full candidate
    set. Exact by the union-containment property (the global top-k is
    contained in the union of per-part top-k under the same order);
    ``cosine`` must already carry its final rounded value, which both
    callers guarantee (``F.round`` JVM-side here, the kernel's HALF_UP
    in :func:`_gemm_scored`). Batch-local: adds NO exchange — the plan
    gate in tests/test_plans.py pins the bounded row count."""
    schema = scored.schema

    def fold(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(
                ["probe_id", "cosine", "vec_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            yield pdf.groupby("probe_id", sort=False).head(k)

    return scored.mapInPandas(fold, schema)


def ivf_index_table(
    spark: SparkSession, sf_dir: str, n_cells: int = 8
) -> str:
    """Materialized IVF assignment index: ``(vec_id, embedding,
    cell_id)`` bucketed on ``cell_id``, built once per corpus version
    (the band-table pattern, ``io.adopt_or_build_bucketed_table``) and
    adopted by later sessions.

    This IS the regime the ivf_topk docstring's crossover analysis
    points at: the full-corpus centroid-assignment pass is the fixed
    cost that made 10-probe IVF lose to brute force — paying it once
    per corpus version instead of once per query moves every
    query-time probe to the bucketed candidate scan only. At 100 TB
    ``n_cells`` scales with the corpus and the bucketed layout routes
    each probe to its cells' buckets without an exchange."""
    from mapreduce_google_spark.io import (
        adopt_or_build_bucketed_table,
        cache_tag,
        shared_store_path,
    )

    tag = cache_tag(sf_dir, "embeddings")
    name = f"mgs_ivf_idx_{tag}_c{n_cells}"

    def build():
        emb = load_table(spark, sf_dir, "embeddings")
        return ivf_assignments(emb, n_cells)[1]

    return adopt_or_build_bucketed_table(
        spark, name, shared_store_path(name), ["cell_id"], n_cells, build
    )


def ivf_topk_from_index(
    spark: SparkSession,
    sf_dir: str,
    n_probes: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe_cells: int = 3,
) -> DataFrame:
    """t25's r13/r14 registered form — identical results to
    :func:`ivf_topk` (equality pinned in ``tests/test_approx_ops.py``),
    with the assignment pass served from the materialized
    :func:`ivf_index_table` instead of recomputed per query. Demoted to
    the pinned equality reference in r15 by the fused-kernel shootout
    (:func:`ivf_topk_from_index_fused`).

    Query-time work is ONLY: route each probe to its ``n_probe_cells``
    closest centroids (n_probes × n_cells — probe-sized), then score
    candidates read from the probed cells' buckets. Centroids are
    re-derived from the same deterministic seed rule (the ``n_cells``
    lowest vec_ids), so routing agrees with the stored assignment by
    construction."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = spark.table(ivf_index_table(spark, sf_dir, n_cells))
    centroids = F.broadcast(
        emb.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid"))
    )
    probes = F.broadcast(_probes(emb, n_probes))
    wc = Window.partitionBy("probe_id").orderBy(
        F.col("c_cos").desc(), F.col("cell_id").asc()
    )
    probe_cells = (
        probes.crossJoin(centroids)
        .select(
            "probe_id",
            "probe_vec",
            "cell_id",
            F.round(cosine_similarity("probe_vec", "centroid"), 6).alias("c_cos"),
        )
        .withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") <= n_probe_cells)
        .select("probe_id", "probe_vec", "cell_id")
    )
    # checked cosine (ADVICE r16): the fused kernel this form is
    # equality-pinned against raises on any non-finite candidate
    # cosine, so the JVM scoring expression must fail identically on a
    # zero-norm embedding instead of silently ordering NaN rows
    from mapreduce_google_spark.functions.vectors import (
        cosine_similarity_checked,
    )

    scored = (
        probe_cells.join(assigned, "cell_id")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                cosine_similarity_checked(
                    "probe_vec", "embedding", "ivf_topk_from_index"
                ),
                6,
            ).alias("cosine"),
        )
    )
    # map-side combine for the rank stage (VERDICT r13 "What's wrong
    # #1", shared shape with t18): fold each scan batch to its
    # per-probe top-k before the probe_id window, so the exchange
    # carries k*P*num_batches rows instead of every probed-cell
    # candidate — the IVF pruning bounds the constant, this bounds the
    # shape
    scored = partial_topk_per_batch(scored, k)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.select(
            "probe_id", "vec_id", "cosine", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def ivf_topk_from_index_fused(
    spark: SparkSession,
    sf_dir: str,
    n_probes: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe_cells: int = 3,
) -> DataFrame:
    """T25, registered form since r15 — the FUSED score+fold Arrow
    kernel (VERDICT r14 "What's wrong #2"; result equality with
    :func:`ivf_topk_from_index` and transitively :func:`ivf_topk` is
    pinned in ``tests/test_approx_ops.py``).

    The r13/r14 form scored probed-cell candidates JVM-side with the
    ``cosine_similarity`` higher-order function, then crossed to Python
    once more for :func:`partial_topk_per_batch` — correct and bounded,
    but the fold's crossing was the one ABBA regression r14 accepted
    (+2.6%). This form gives scoring and folding ONE shared crossing in
    the t18 kernel shape: candidates arrive as ``(probe_id, vec_id,
    embedding)`` straight off the cell-bucketed index join, each Arrow
    batch groups by probe, scores the group with a vectorized
    matrix-vector product, rounds HALF_UP exactly like ``F.round``
    (:func:`_round_half_up_6`), and folds to the per-probe top-k via
    the SAME tie-exact selection the t18 kernel uses
    (:func:`_batch_topk_rows`, one column per call) — ≤ ``k`` rows per
    probe per batch reach the merge window, the bounded shape the
    previous form already guaranteed. Probe vectors ride the closure
    (probe-sized collect, same class as the IVF centroids), so the
    Arrow crossing carries each candidate's embedding ONCE and no
    probe_vec duplication per candidate row.

    Measured (tools/ivf_fused_shootout.py,
    BENCH_ivf_fused_shootout.json, equality-gated in-tool): medians
    0.848 vs 0.897 s at sf0.1 (−5.5%) and 0.841 vs 0.973 s at sf1
    (−13.6%) — the win GROWS with scale because the crossing it removes
    carries the full probed-cell candidate relation. No REPROVE slot
    consumed: t25 is rows-only (its hash row cannot exist) and t165's
    invariant closure pins the in-session :func:`ivf_topk`, unchanged
    here; the equality chain carries the evidence across.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = spark.table(ivf_index_table(spark, sf_dir, n_cells))
    probe_rows = _probes(emb, n_probes).collect()  # probe-sized collect
    pvecs = {
        int(r.probe_id): np.asarray(r.probe_vec, dtype=np.float64)
        for r in probe_rows
    }
    pnorms = {pid: float(np.sqrt(v @ v)) for pid, v in pvecs.items()}
    centroids = F.broadcast(
        emb.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid"))
    )
    probes = F.broadcast(_probes(emb, n_probes))
    wc = Window.partitionBy("probe_id").orderBy(
        F.col("c_cos").desc(), F.col("cell_id").asc()
    )
    probe_cells = (
        probes.crossJoin(centroids)
        .select(
            "probe_id",
            "cell_id",
            F.round(cosine_similarity("probe_vec", "centroid"), 6).alias("c_cos"),
        )
        .withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") <= n_probe_cells)
        .select("probe_id", "cell_id")
    )
    cand = (
        probe_cells.join(assigned, "cell_id")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", "embedding")
    )

    def score_fold(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frames = []
            for pid, g in pdf.groupby("probe_id", sort=False):
                mat = np.vstack(g["embedding"].to_numpy()).astype(np.float64)
                vec_ids = g["vec_id"].to_numpy(dtype=np.int64)
                pv = pvecs[int(pid)]
                dots = mat @ pv  # (B,)
                norms = np.sqrt((mat * mat).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = _round_half_up_6(
                        dots / (norms * pnorms[int(pid)])
                    )
                # a zero-norm embedding (or probe) must fail LOUDLY, not
                # order a NaN silently: the JVM cosine_similarity path
                # this kernel is equality-pinned against never produces
                # one on the test corpora, so a non-finite here means
                # the corpora diverged from that assumption (ADVICE r15)
                if not np.isfinite(cos).all():
                    bad = vec_ids[~np.isfinite(cos)][:5].tolist()
                    raise ValueError(
                        f"non-finite cosine for probe {int(pid)} "
                        f"(zero-norm embedding?): vec_ids {bad}"
                    )
                # one-column reuse of the t18 tie-exact selection
                ri, _ = _batch_topk_rows(cos[:, None], vec_ids, k)
                frames.append(
                    pd.DataFrame(
                        {
                            "probe_id": np.full(len(ri), int(pid), dtype=np.int64),
                            "vec_id": vec_ids[ri],
                            "cosine": cos[ri],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = cand.mapInPandas(
        score_fold, "probe_id bigint, vec_id bigint, cosine double"
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.select(
            "probe_id", "vec_id", "cosine", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T46 — per-label L2-norm statistics of the embedding column.

    The norm is a per-row higher-order-function fold (``aggregate`` over
    the array, JVM-side, no Python) — the whole query is one narrow pass
    plus one hash-agg on the low-cardinality label. This is the shape
    embedding QA sweeps take at 100 TB (detect unnormalized / degenerate
    vectors per shard): the scan is the cost, everything else is free.
    Floats are cast to double INSIDE the fold, summed left-to-right, so
    DuckDB's ``list_sum(list_transform(...))`` reproduces the value
    bit-for-bit.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    from mapreduce_google_spark.functions.vectors import l2_norm

    norms = emb.select("label", l2_norm("embedding").alias("norm"))
    # mean via exact decimal accumulation (functions.numeric recipe): the
    # per-row norm is a deterministic double; quantize it to 12 decimals
    # (decimal(20,12)) so the SUM is order-independent, then one double
    # division — avg(double) would drift with partitioning.
    norm_dec = F.col("norm").cast("decimal(20,12)")
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.round(
                F.sum(norm_dec).cast("double") / F.count("norm"), 6
            ).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


def _hyperplanes(
    dim: int, n_tables: int, n_bits: int, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic Gaussian hyperplanes, planes[table][bit][dim]."""
    import random

    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def _lsh_bucket_udf(dim: int, n_tables: int, n_bits: int, seed: int = 42):
    """THE hyperplane-signature kernel, shared by every LSH operator
    (t24 near-dup pairs, t47 ANN top-k): one Arrow-batched GEMM per
    partition — (batch × dim) @ (dim × tables·bits) — then sign-bit
    packing per table. Returns a ``pandas_udf`` mapping
    ``array<float> → array<int>`` of ``n_tables`` bucket ids.

    A GEMM beats both per-element codegen AND per-row literal plane
    expressions (the r2-flagged anti-shape: n_tables·n_bits array
    literals per row bloat the expression tree and fall out of
    whole-stage codegen as the parameters grow); here plane count only
    changes a broadcast numpy constant.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.asarray(_hyperplanes(dim, n_tables, n_bits, seed))  # (T, r, d)
    proj = planes.reshape(n_tables * n_bits, dim).T  # (d, T·r)
    weights = 1 << np.arange(n_bits)  # pack r sign bits per table

    @pandas_udf("array<int>")
    def lsh_buckets(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())  # (batch, d)
        bits = (mat @ proj >= 0).reshape(len(mat), n_tables, n_bits)
        ids = (bits * weights).sum(axis=2).astype("int32")  # (batch, T)
        return pd.Series(list(ids))

    return lsh_buckets


def hyperplane_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_probes: int = 10,
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """T47 — approximate top-k via random-hyperplane (SimHash-for-cosine)
    LSH with OR-amplification across ``n_tables`` tables.

    Signature: bit b of table t = sign(v · plane_{t,b}); bucket key =
    (table, packed bits). Collision probability per bit is 1 − θ/π, so
    near neighbors (small angle) collide with high probability in at
    least one table. Signatures come from the SAME Arrow-GEMM kernel as
    t24 (:func:`_lsh_bucket_udf` — one matrix multiply per batch, no
    per-row plane literals); the only exchanges are the candidate join
    against the broadcast probe buckets and the final per-probe top-k.
    Versus IVF (:func:`ivf_topk`): no training/assignment pass — the
    index is stateless, which at 100 TB means new data buckets itself
    on ingestion with zero coordination.

    Rows-only for the driver (the plane family isn't SQL-portable);
    ``tests/test_approx_ops.py`` checks recall vs :func:`cosine_topk`
    and exactness of returned cosines.
    """
    lsh_buckets = _lsh_bucket_udf(dim, n_tables, n_bits, seed)

    emb = load_table(spark, sf_dir, "embeddings")
    buckets_of = lambda df, vec_col: df.select(  # noqa: E731
        "*",
        F.posexplode(lsh_buckets(vec_col)).alias("tbl", "bucket"),
    )
    vec_buckets = buckets_of(emb.select("vec_id", "embedding"), "embedding").select(
        "vec_id", "tbl", "bucket"
    )
    probes = _probes(emb, n_probes)
    probe_buckets = F.broadcast(
        buckets_of(probes, "probe_vec").select("probe_id", "tbl", "bucket")
    )
    candidates = (
        vec_buckets.join(probe_buckets, ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
    )
    scored = (
        candidates.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(probes), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_similarity("probe_vec", "embedding"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.select(
            "probe_id", "vec_id", "cosine", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def embedding_quantization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T73 — int8 symmetric quantization QA: per-label scale and
    reconstruction-error profile.

    The storage/serving step of every large ANN deployment: fp32
    embeddings quantize to int8 codes with a per-vector scale
    (max|x|/127), cutting the index 4×; this op reports how much
    fidelity that costs, per label shard. Everything is per-row
    higher-order functions (zip_with/aggregate — JVM-side, no Python,
    no shuffle) plus one hash-agg on the label: at 100 TB the scan IS
    the cost, same shape as t46's norm sweep.

    Determinism: per-vector scale/error are fixed-order fold results
    (identical in DuckDB's list_transform/list_sum); label means
    quantize per-vector values to decimal(20,12) before the exact sum
    (functions/numeric recipe).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda v: v.cast("double"))
    scale = F.array_max(F.transform(xd, F.abs)) / F.lit(127.0)
    # STAGE the scale as a named column before the error fold: inlining
    # it into the per-element lambda re-evaluates the O(d) max fold per
    # element — O(d²) per row (measured 1.46 s → 0.56 s at sf0.1; no
    # CSE across/inside projection expressions).
    pre = emb.select("label", "embedding", scale.alias("scale"))
    sc = F.col("scale")
    per_vec = pre.select(
        "label",
        "scale",
        (
            F.aggregate(
                F.transform(
                    F.transform("embedding", lambda v: v.cast("double")),
                    lambda v: F.abs(v - F.round(v / sc) * sc),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size("embedding")
        ).alias("err"),
    )
    dec = lambda c: F.col(c).cast("decimal(20,12)")  # noqa: E731
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.round(F.sum(dec("scale")).cast("double") / F.count("scale"), 6).alias(
                "avg_scale"
            ),
            F.round(F.sum(dec("err")).cast("double") / F.count("err"), 6).alias(
                "avg_recon_err"
            ),
            F.round(F.max("err"), 6).alias("max_recon_err"),
        )
        .orderBy("label")
    )


def _cell_scores(centroids: list[list[float]]) -> tuple["F.Column", "F.Column"]:
    """(best_cos, best_cell) of the max-cosine centroid for the
    ``embedding`` column — a PURE PROJECTION: the centroid state is
    inlined as literals, so assignment needs no join and no shuffle.
    Ties take the lowest cell index (``array_position`` returns the
    FIRST exact match of the max).
    """
    import math

    cos_exprs = []
    emb_norm = F.sqrt(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    for c in centroids:
        lit = F.array(*[F.lit(float(v)) for v in c])
        num = F.aggregate(
            F.zip_with(F.col("embedding"), lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        c_norm = math.sqrt(sum(v * v for v in c)) or 1.0
        cos_exprs.append(num / (emb_norm * F.lit(c_norm)))
    arr = F.array(*cos_exprs)
    best_cos = F.array_max(arr)
    best_cell = (F.array_position(arr, best_cos) - 1).cast("int")
    return best_cos, best_cell


def kmeans_fit(
    emb: DataFrame, n_cells: int = 8, iters: int = 5
) -> list[list[float]]:
    """Distributed Lloyd's k-means over the embedding column (cosine
    assignment, mean update) — the missing *training* step for the IVF
    index (:func:`ivf_assignments` seeds cells from low vec_ids only).

    The MLlib recipe, restated in DataFrame ops: cluster state is k×dim
    floats (tiny), so each iteration collects it to the driver and
    inlines it as literals — assignment is then a narrow projection
    (zero shuffle, no join), and the update is ONE map-side-combined
    aggregation of (cell, dim) partial sums. Per-iteration cluster sums
    accumulate in decimal(20,12) (order-independent), so the fit — and
    every downstream assignment — is bit-deterministic regardless of
    partitioning; empty cells keep their previous centroid.

    Driver traffic per iteration: k·dim·partitions partial rows in, one
    k·dim state out. At 100 TB that is still KBs — the data never moves.
    """
    seed = emb.orderBy("vec_id").limit(n_cells).select("embedding").collect()
    centroids = [[float(v) for v in r.embedding] for r in seed]
    dim = len(centroids[0])
    for _ in range(iters):
        # GEMM assignment: constant plan shape across iterations (no
        # per-round codegen recompile of a k·dim-literal tree)
        assign = _cell_scores_gemm(centroids)
        stats = (
            emb.select(
                assign("embedding").getField("cell").alias("cell"),
                F.posexplode("embedding").alias("pos", "x"),
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(20,12)")).alias("s"),
                F.count("*").cast("long").alias("c"),
            )
            .collect()
        )
        nxt = [list(c) for c in centroids]
        for r in stats:
            nxt[r.cell][r.pos] = float(r.s) / r.c
        centroids = nxt
    return centroids


def kmeans_cluster_stats(
    spark: SparkSession, sf_dir: str, n_cells: int = 8, iters: int = 5
) -> DataFrame:
    """T82 — per-cluster QA report of a Lloyd's k-means fit: member
    count, mean/min cosine to the owned centroid.

    Rows-only for the driver (iterative fits aren't SQL-portable);
    ``tests/test_approx_ops.py::test_kmeans_clusters_invariants`` pins
    the invariants: full coverage,
    determinism across runs, and that training improves mean
    assignment cosine over the untrained seed centroids.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, n_cells, iters)
    assign = _cell_scores_gemm(centroids)
    assigned = emb.select("vec_id", assign("embedding").alias("a")).select(
        "vec_id",
        F.col("a.cell").alias("cell_id"),
        F.col("a.cos").alias("cos"),
    )
    return (
        assigned.groupBy("cell_id")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.round(
                F.sum(F.col("cos").cast("decimal(20,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_cos"),
            F.round(F.min("cos"), 6).alias("min_cos"),
        )
        .orderBy("cell_id")
    )


def kmeans_invariants(
    spark: SparkSession, sf_dir: str, n_cells: int = 8, iters: int = 5
) -> DataFrame:
    """T84 — SQL-checkable invariant summary of the k-means fit +
    assignment (t82's training loop is iterative and not SQL-portable,
    but its coverage laws are):

    - every vector assigned exactly once → ``n_assigned`` equals
      ``count(embeddings)`` and ``n_distinct_vecs`` matches;
    - every assigned cell id is in ``[0, n_cells)`` → 0 violations;
    - every assignment cosine is a valid cosine (|cos| ≤ 1 + ε) →
      0 violations.

    A dropped vector, duplicated assignment, or out-of-range cell in the
    driver-held centroid loop breaks a count against the DuckDB oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, n_cells, iters)
    assign = _cell_scores_gemm(centroids)
    assigned = emb.select("vec_id", assign("embedding").alias("a")).select(
        "vec_id",
        F.col("a.cell").alias("cell_id"),
        F.col("a.cos").alias("cos"),
    )
    return assigned.agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.countDistinct("vec_id").cast("long").alias("n_distinct_vecs"),
        F.sum(
            F.when(
                (F.col("cell_id") < 0) | (F.col("cell_id") >= n_cells), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("bad_cells"),
        F.sum(F.when(F.abs("cos") > 1.000001, 1).otherwise(0))
        .cast("long")
        .alias("bad_cosines"),
    )


def _cell_scores_gemm(centroids: list[list[float]]):
    """GEMM form of :func:`_cell_scores`: one Arrow-batched
    ``pandas_udf`` computing ``struct(cos, cell)`` of the max-cosine
    centroid via ``(batch × dim) @ (dim × k)``.

    Why it exists: the literal-expression form re-materializes k·dim
    literals into the plan — fine for ONE assignment pass (t25 IVF), but
    Lloyd's loop rebuilds it EVERY iteration, paying a fresh
    whole-stage-codegen compile of a 512-literal tree per round (the
    dominant cost of t82 at small data: ~39 s for 5 rounds at sf0.1).
    Here the centroid state is a broadcast numpy constant — the plan
    shape (and its compiled code) is identical every iteration, and the
    kernel is one BLAS call per batch. Same argmax/lowest-index
    tie-break; numpy float64 vs expression-fold sums may differ in the
    last ulp, which only matters for exact-tie pathologies absent from
    real embeddings.
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, d)
    c_norms = np.linalg.norm(C, axis=1)
    c_norms[c_norms == 0.0] = 1.0

    @pandas_udf("struct<cos: double, cell: int>")
    def assign(emb: pd.Series) -> pd.DataFrame:
        mat = np.vstack(emb.to_numpy()).astype(np.float64)  # (b, d)
        v_norms = np.linalg.norm(mat, axis=1)
        v_norms[v_norms == 0.0] = 1.0
        cos = (mat @ C.T) / (v_norms[:, None] * c_norms[None, :])
        cell = cos.argmax(axis=1).astype("int32")  # first max = lowest idx
        return pd.DataFrame(
            {"cos": cos[np.arange(len(cell)), cell], "cell": cell}
        )

    return assign


def ann_topk_invariants(
    spark: SparkSession,
    sf_dir: str,
    n_probes: int = 10,
    k: int = 5,
) -> DataFrame:
    """T122 — SQL-checkable invariant summary of
    :func:`hyperplane_lsh_topk` (t47; the plane family isn't SQL-portable
    — t83/t84 recipe).

    - ``bad_cosines = 0`` — every reported cosine re-verified by an
      INDEPENDENT kernel (numpy float64 dot in a ``pandas_udf``, vs the
      JVM ``aggregate``-HOF the operator used) to 6 decimals;
    - ``rank_violations = 0`` — per probe: ranks contiguous from 1,
      at most ``k`` rows, cosine non-increasing in rank, ties broken by
      ascending vec_id;
    - ``beats_exact = 0`` — ANN's rank-r cosine can never exceed the
      EXACT brute-force operator's rank-r cosine (:func:`cosine_topk`)
      for the same probe;
    - ``probes_over_limit = 0`` — every probe_id is one of the
      ``n_probes`` lowest vec_ids (the declared probe set);
    - ``found_nonempty = 1`` — deterministic non-vacuity anchor (fixed
      plane seed + deterministic corpus).
    """
    from pyspark.sql.functions import pandas_udf

    ann = hyperplane_lsh_topk(spark, sf_dir, n_probes=n_probes, k=k).localCheckpoint()
    emb = load_table(spark, sf_dir, "embeddings")

    @pandas_udf("double")
    def np_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy()).astype(np.float64)
        mb = np.vstack(b.to_numpy()).astype(np.float64)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", ma, mb) / (na * nb))

    pv = emb.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv"))
    vv = emb.select("vec_id", F.col("embedding").alias("vv"))
    rechecked = (
        ann.join(pv, "probe_id")
        .join(vv, "vec_id")
        .select(
            "probe_id",
            "vec_id",
            "cosine",
            "rank",
            F.round(np_cosine("pv", "vv"), 6).alias("np_cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("rank")
    seq = rechecked.select(
        "*",
        F.lag("rank", 1, 0).over(w).alias("prev_rank"),
        F.lag("cosine").over(w).alias("prev_cos"),
        F.lag("vec_id").over(w).alias("prev_vec"),
    )
    exact = cosine_topk(spark, sf_dir, n_probes=n_probes, k=k).select(
        "probe_id", "rank", F.col("cosine").alias("exact_cos")
    )
    vs_exact = ann.join(exact, ["probe_id", "rank"], "left")
    checks = seq.agg(
        F.count(F.when(F.abs(F.col("cosine") - F.col("np_cos")) > 1e-6, 1))
        .cast("long")
        .alias("bad_cosines"),
        F.count(
            F.when(
                (F.col("rank") != F.col("prev_rank") + 1)
                | (F.col("rank") > k)
                | (
                    F.col("prev_cos").isNotNull()
                    & (
                        (F.col("cosine") > F.col("prev_cos"))
                        | (
                            (F.col("cosine") == F.col("prev_cos"))
                            & (F.col("vec_id") < F.col("prev_vec"))
                        )
                    )
                ),
                1,
            )
        )
        .cast("long")
        .alias("rank_violations"),
        F.least(F.count("*"), F.lit(1)).cast("long").alias("found_nonempty"),
    )
    beats = vs_exact.agg(
        F.count(
            F.when(
                F.col("exact_cos").isNull()
                | (F.col("cosine") > F.col("exact_cos")),
                1,
            )
        )
        .cast("long")
        .alias("beats_exact")
    )
    over = (
        ann.join(
            F.broadcast(_probes(emb, n_probes).select("probe_id")),
            "probe_id",
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("probes_over_limit"))
    )
    return (
        checks.crossJoin(beats)
        .crossJoin(over)
        .select(
            "bad_cosines",
            "rank_violations",
            "beats_exact",
            "probes_over_limit",
            "found_nonempty",
        )
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T127 — per-label embedding centroid (element-wise mean vector),
    emitted long-form as (label, dim_idx, n_vectors, mean_val).

    The distributed vector-mean recipe: ``posexplode`` the array (narrow,
    no shuffle), then ONE hash-agg on (label, dim) — partial sums combine
    map-side, so the exchange carries labels × dims rows, not vectors.
    This is how per-cluster centroids / class prototypes are computed
    over a 100 TB embedding corpus; the result is small enough to
    broadcast back for assignment passes (cf. k-means, t82).

    Determinism (oracle rule 6): each float is cast to double then
    quantized to decimal(20,12); the decimal SUM is order-independent;
    one IEEE division at the end. Long form (not re-assembled arrays)
    keeps the result hash-comparable (cf. t114's array lesson).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("idx", "v")
    )
    return (
        exploded.groupBy(
            "label", (F.col("idx") + 1).cast("int").alias("dim_idx")
        )
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.round(
                F.sum(
                    F.col("v").cast("double").cast("decimal(20,12)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_val"),
        )
        .orderBy("label", "dim_idx")
    )


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = 8,
    iters: int = 3,
    tau: float = 0.4,
) -> DataFrame:
    """T145 (op) — SemDeDup (Abbas et al. 2023): cluster embeddings with
    k-means, then within each cluster drop every vector that has cosine
    ≥ tau with a LOWER-id vector of the same cluster (the deterministic
    keep-lowest-id restatement of the paper's per-cluster pruning).

    Emits one row per dropped vector: (vec_id, cell_id, keeper_id =
    lowest such partner, cosine to it).

    Scale shape — the whole point of SemDeDup: clustering first bounds
    the quadratic stage to within-cell self-joins (cost Σ|cell|² ≪ N²,
    and cells are capped in practice); assignment is the shared GEMM
    kernel, the self-join is an equi-join on cell_id, and the per-pair
    cosine is the JVM HOF kernel t24 uses. No global quadratic anywhere.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, n_cells, iters)
    assign = _cell_scores_gemm(centroids)
    assigned = emb.select(
        "vec_id",
        "embedding",
        assign("embedding").getField("cell").alias("cell_id"),
    )
    lo = assigned.select(
        F.col("vec_id").alias("keep_id"),
        F.col("embedding").alias("keep_emb"),
        F.col("cell_id"),
    )
    hi = assigned.select(
        F.col("vec_id").alias("drop_id"),
        F.col("embedding").alias("drop_emb"),
        F.col("cell_id"),
    )
    pairs = (
        lo.join(hi, "cell_id")
        .where(F.col("keep_id") < F.col("drop_id"))
        .select(
            "cell_id",
            "drop_id",
            "keep_id",
            F.round(cosine_similarity("keep_emb", "drop_emb"), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= tau)
    )
    w = Window.partitionBy("drop_id").orderBy("keep_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("drop_id").alias("vec_id"),
            F.col("cell_id").cast("int").alias("cell_id"),
            F.col("keep_id").alias("keeper_id"),
            "cosine",
        )
        .orderBy("vec_id")
    )


def _auto_semantic_cells(n_vecs: int, target_cell: int = 500) -> int:
    """Cell count for :func:`semantic_dedup_auto`: N/target_cell clamped
    to [8, 4096]. The within-cell self-join costs Σ|cell|² ≈ N·|cell|,
    so a FIXED cell count makes |cell| (and the join) grow linearly
    with the corpus — the r17-sweep defect that put t145 at 629 s at
    sf1 (8 cells over 200k vectors = 25k-vector cells = 2.5e9 pair
    cosines). Holding |cell| ≈ target_cell instead makes the join
    linear in N; the k-means assignment GEMM (N × cells) grows, but at
    N/target_cell cells it is N²/500 multiply-adds × dim — still dwarfed
    by the join it saves. Floor 8 = the certified oracle-scale regime
    (N = 500 → max(1, …) → clamp to 8: sf0.01 results bit-identical to
    the registered builder); cap 4096 bounds the broadcast centroid
    table (4096 × 64 doubles ≈ 2 MB)."""
    return max(8, min(4096, n_vecs // target_cell if target_cell else 8))


def semantic_dedup_auto(
    spark: SparkSession,
    sf_dir: str,
    target_cell: int = 500,
    iters: int = 3,
    tau: float = 0.4,
) -> DataFrame:
    """t145's SemDeDup pipeline with the cell count sized from the
    corpus — the r19 flip candidate, STAGED r18 (closure-disjoint from
    the registered builder until its REPROVE slot lands; the t22/t77
    staging precedent). Identical dataflow to :func:`semantic_dedup`;
    the one change is ``n_cells = _auto_semantic_cells(N)`` with N from
    the parquet footer (metadata-only, no Spark job). At oracle scale
    this resolves to the certified 8 cells, so sf0.01 results are
    bit-identical; at sf1 it yields 400 cells and the within-cell join
    drops from 2.5e9 to ~1e8 pair cosines. NOTE the flip changes
    RESULTS at sf ≥ 0.1: SemDeDup's output is clustering-dependent by
    design (Abbas et al. 2023 §3 — the cluster count is a quality/cost
    knob, not an implementation detail), which is exactly why this is
    a staged REPROVE flip and not a plan-only repair."""
    from mapreduce_google_spark.io import parquet_rows

    n_vecs = parquet_rows(sf_dir, "embeddings")
    n_cells = _auto_semantic_cells(n_vecs if n_vecs is not None else 0)
    return semantic_dedup(spark, sf_dir, n_cells=n_cells, iters=iters, tau=tau)


def semantic_dedup_invariants_auto(
    spark: SparkSession,
    sf_dir: str,
    target_cell: int = 500,
    iters: int = 3,
    tau: float = 0.4,
) -> DataFrame:
    """t145's registered form since the r19 REPROVE flip: the invariant
    summary computed over the AUTO-SIZED SemDeDup pipeline —
    ``n_cells = _auto_semantic_cells(N)`` with N from the parquet
    footer (metadata-only, no Spark job), then the unchanged
    :func:`semantic_dedup_invariants` body. At oracle scale the
    derivation resolves to the certified 8 cells, so sf0.01 results are
    bit-identical to the fixed-cell form; at sf1 it yields 400 cells
    and the within-cell join drops from 2.5e9 to ~1e8 pair cosines
    (629 → ~75 s, BENCH_autosize_probe.json — the r17-sweep defect,
    VERDICT r17 item 6 / r18 item 2). The invariant CONTRACT
    (bad_cosines/order_violations/kept_close_pairs all 0) is
    cell-count-independent, which is what makes the invariant oracle
    valid at every scale even though the dropped-pair SET is
    clustering-dependent by design (Abbas et al. 2023 §3)."""
    from mapreduce_google_spark.io import parquet_rows

    n_vecs = parquet_rows(sf_dir, "embeddings")
    n_cells = _auto_semantic_cells(n_vecs if n_vecs is not None else 0)
    return semantic_dedup_invariants(
        spark, sf_dir, n_cells=n_cells, iters=iters, tau=tau
    )


def semantic_dedup_invariants(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int = 8,
    iters: int = 3,
    tau: float = 0.4,
) -> DataFrame:
    """T145 — SQL-checkable invariant summary of :func:`semantic_dedup`
    (the k-means fit isn't SQL-portable — t83/t84 recipe):

    - ``bad_cosines = 0`` — every reported cosine re-verified by an
      independent numpy float64 kernel to 6 decimals, and ≥ tau;
    - ``order_violations = 0`` — keeper_id < vec_id always (the
      keep-lowest-id law);
    - ``kept_close_pairs = 0`` — no two SURVIVING vectors of the same
      cell sit at cosine ≥ tau (a survivor has, by definition, no
      lower-id partner at ≥ tau, so any close survivor pair disproves
      the drop rule — re-derived here by an independent self-join over
      the survivor set);
    - ``found_nonempty = 1`` — deterministic non-vacuity anchor.
    """
    from pyspark.sql.functions import pandas_udf

    dropped = semantic_dedup(spark, sf_dir, n_cells, iters, tau).localCheckpoint()
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, n_cells, iters)
    assign = _cell_scores_gemm(centroids)
    assigned = emb.select(
        "vec_id",
        "embedding",
        assign("embedding").getField("cell").alias("cell_id"),
    )

    @pandas_udf("double")
    def np_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy()).astype(np.float64)
        mb = np.vstack(b.to_numpy()).astype(np.float64)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", ma, mb) / (na * nb))

    ka = assigned.select(
        F.col("vec_id").alias("keeper_id"), F.col("embedding").alias("ke")
    )
    va = assigned.select("vec_id", F.col("embedding").alias("ve"))
    rechecked = (
        dropped.join(ka, "keeper_id")
        .join(va, "vec_id")
        .select(
            "vec_id",
            "keeper_id",
            "cosine",
            F.round(np_cosine("ke", "ve"), 6).alias("np_cos"),
        )
    )
    bad_cos = rechecked.where(
        (F.abs(F.col("np_cos") - F.col("cosine")) > 1e-6)
        | (F.col("np_cos") < tau - 1e-6)
    ).count()
    order_bad = dropped.where(F.col("keeper_id") >= F.col("vec_id")).count()
    survivors = assigned.join(
        dropped.select("vec_id"), "vec_id", "left_anti"
    ).select("vec_id", "embedding", "cell_id")
    s2 = survivors.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"), "cell_id"
    )
    kept_close = (
        survivors.join(s2, "cell_id")
        .where(F.col("vec_id") < F.col("v2"))
        .where(F.round(cosine_similarity("embedding", "e2"), 6) >= tau)
        .count()
    )
    n_dropped = dropped.count()
    return spark.createDataFrame(
        [
            (
                int(bad_cos),
                int(order_bad),
                int(kept_close),
                int(1 if n_dropped > 0 else 0),
            )
        ],
        "bad_cosines long, order_violations long, kept_close_pairs long, found_nonempty long",
    )


def source_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T151 — cross-table embedding QA: per SOURCE centroid of the
    document embeddings (documents ⋈ embeddings on doc_id = vec_id) and
    each doc's cosine to its own source centroid, reported as per-source
    mean/min — the "is this source internally coherent, and which docs
    are off-topic for it" screen run before mixing sources into a
    training corpus.

    Scale shape: the join is keyed on the id (bucketed/colocated at
    100 TB); centroids shrink to (source × dim) via one
    map-side-combined hash-agg of decimal-quantized partials, reassemble
    vocabulary-small, and ride back in as a BROADCAST — the per-doc
    cosine is then a narrow JVM fold, no second shuffle of the
    embedding table. Determinism: centroid means are exact-decimal sums
    with one IEEE division; per-doc cosines round to 6 before the
    decimal-quantized mean/min.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source", "vec_id", "embedding"
    )
    exploded = j.select("source", F.posexplode("embedding").alias("dim", "x"))
    cent = exploded.groupBy("source", "dim").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(20,12)")).cast("double")
            / F.count("*")
        ).alias("m")
    )
    carr = cent.groupBy("source").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s.m
        ).alias("cvec")
    )
    cos = j.join(F.broadcast(carr), "source").select(
        "source",
        "vec_id",
        F.round(cosine_similarity("embedding", "cvec"), 6).alias("c"),
    )
    return (
        cos.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("c").cast("decimal(20,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_cos"),
            F.round(F.min("c"), 6).alias("min_cos"),
        )
        .orderBy("source")
    )


def cluster_source_chi2(spark: SparkSession, sf_dir: str, n_cells: int = 8) -> DataFrame:
    """T158 — are embedding clusters independent of document source? The
    chi-square statistic over the (IVF cell × source) contingency table
    — the screen for "does my vector space just memorize the source
    field", run before trusting cluster-balanced sampling.

    Uses the deterministic IVF seed assignment (:func:`ivf_assignments`:
    centroids are the ``n_cells`` lowest vec_ids, assignment is rounded
    argmax cosine), which the SQL oracle re-derives exactly. The
    contingency table is one hash-agg; row/column totals are windows
    over it (tiny — cells × sources); EVERY grid combo contributes its
    (o−e)²/e term including empty ones (o=0 ⇒ term=e), each quantized
    to decimal(20,12) so the sum is order-independent.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    _, assigned = ivf_assignments(emb, n_cells)
    j = assigned.join(docs, assigned.vec_id == docs.doc_id)
    cont = j.groupBy("cell_id", "source").agg(
        F.count("*").cast("double").alias("o")
    )
    rows = cont.groupBy("cell_id").agg(F.sum("o").alias("rt"))
    cols = cont.groupBy("source").agg(F.sum("o").alias("ct"))
    tot = cont.groupBy().agg(F.sum("o").alias("n"))
    grid = (
        rows.crossJoin(F.broadcast(cols))
        .crossJoin(F.broadcast(tot))
        .join(cont, ["cell_id", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0.0)))
        .withColumn("e", (F.col("rt") * F.col("ct")) / F.col("n"))
    )
    term = ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))) / F.col("e")
    return grid.agg(
        F.countDistinct("cell_id").cast("long").alias("n_cells"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.max("n").cast("long").alias("n_docs"),
        F.round(F.sum(term.cast("decimal(20,12)")).cast("double"), 6).alias("chi2"),
        (
            (F.countDistinct("cell_id") - 1) * (F.countDistinct("source") - 1)
        )
        .cast("long")
        .alias("dof"),
    )


def ivf_topk_invariants(
    spark: SparkSession,
    sf_dir: str,
    n_probes: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe_cells: int = 3,
) -> DataFrame:
    """T165 — SQL-checkable invariant summary of :func:`ivf_topk` (t25;
    cell assignment + probe routing aren't one SQL query — the t83/t84
    recipe), completing the invariant-oracle shadow for every rows-only
    registry entry:

    - ``bad_cosines = 0`` — every reported cosine re-verified by the
      independent numpy kernel to 6 decimals;
    - ``rank_violations = 0`` — per probe: ranks contiguous from 1, ≤ k
      rows, cosine non-increasing, ties by ascending vec_id;
    - ``beats_exact = 0`` — IVF's rank-r cosine never exceeds the exact
      brute-force rank-r cosine (recall ≤ 1 by construction);
    - ``found_nonempty = 1`` — non-vacuity anchor.
    """
    from pyspark.sql.functions import pandas_udf

    ivf = ivf_topk(spark, sf_dir, n_probes, k, n_cells, n_probe_cells).localCheckpoint()
    emb = load_table(spark, sf_dir, "embeddings")

    @pandas_udf("double")
    def np_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy()).astype(np.float64)
        mb = np.vstack(b.to_numpy()).astype(np.float64)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", ma, mb) / (na * nb))

    pv = emb.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv"))
    vv = emb.select("vec_id", F.col("embedding").alias("vv"))
    rechecked = (
        ivf.join(pv, "probe_id")
        .join(vv, "vec_id")
        .select(
            "probe_id",
            "vec_id",
            "cosine",
            "rank",
            F.round(np_cosine("pv", "vv"), 6).alias("np_cos"),
        )
    )
    bad_cos = rechecked.where(
        F.abs(F.col("np_cos") - F.col("cosine")) > 1e-6
    ).count()
    w = Window.partitionBy("probe_id").orderBy("rank")
    seq = rechecked.select(
        "*",
        F.lag("rank", 1, 0).over(w).alias("prev_rank"),
        F.lag("cosine").over(w).alias("prev_cos"),
        F.lag("vec_id").over(w).alias("prev_vec"),
    )
    rank_bad = seq.where(
        (F.col("rank") != F.col("prev_rank") + 1)
        | (F.col("rank") > k)
        | (
            F.col("prev_cos").isNotNull()
            & (
                (F.col("cosine") > F.col("prev_cos"))
                | (
                    (F.col("cosine") == F.col("prev_cos"))
                    & (F.col("vec_id") < F.col("prev_vec"))
                )
            )
        )
    ).count()
    exact = cosine_topk(spark, sf_dir, n_probes=n_probes, k=k).select(
        "probe_id", "rank", F.col("cosine").alias("exact_cos")
    )
    beats = (
        ivf.join(exact, ["probe_id", "rank"])
        .where(F.col("cosine") > F.col("exact_cos") + 1e-6)
        .count()
    )
    n_rows = ivf.count()
    return spark.createDataFrame(
        [(int(bad_cos), int(rank_bad), int(beats), int(1 if n_rows > 0 else 0))],
        "bad_cosines long, rank_violations long, beats_exact long, found_nonempty long",
    )


_VELTKAMP = 134217729.0  # 2^27 + 1
_Q12 = 1e12
_Q12C = _Q12 * _VELTKAMP
_Q12H = _Q12C - (_Q12C - _Q12)
_Q12L = _Q12 - _Q12H


def _quantize12_scaled(P: "np.ndarray") -> "np.ndarray":
    """int64 of ``cast(P as decimal(20,12))`` scaled by 1e12 — the exact
    Spark semantics, vectorized: Spark's double→decimal cast is HALF_UP
    on the SHORTEST DECIMAL REPR of the double (BigDecimal.valueOf →
    Double.toString), which Python's ``Decimal(repr(x))`` reproduces but
    at ~µs/element. The vectorized path rounds the exact BINARY value
    ``P·1e12`` instead (Dekker two-product gives p + e == P·1e12
    exactly; 1e12 is dyadic), which agrees with the shortest-repr
    rounding everywhere except when a 12-dp rounding boundary falls in
    the ≤ ulp/2 gap between the double and its repr — those elements
    (and exact .5 ties, where binary HALF_UP must beat numpy's
    half-even) are detected by a window of ``|f−0.5| < |S|·2.3e-16 +
    1e-9`` and repaired per-element through Decimal. On the shipped
    float32-valued corpora the risky set is ~1e-4 of elements; exact
    ties (products like odd/8192, whose decimal expansion ends …5 at
    the 13th place) are covered by the same repair and pinned in
    tests/test_flip_fuzz.py."""
    from decimal import ROUND_HALF_UP, Decimal

    P = np.asarray(P, dtype=np.float64)
    p = P * _Q12
    ac = P * _VELTKAMP
    ah = ac - (ac - P)
    al = P - ah
    e = ((ah * _Q12H - p) + ah * _Q12L + al * _Q12H) + al * _Q12L
    sign = np.where(p < 0, -1.0, 1.0)
    ps = np.abs(p)
    # domain guard: above 2^53 the scaled value exceeds exact-double
    # range (and above 2^63 astype(int64) would wrap SILENTLY); the
    # embedding contract is |x| = O(1), so fail loudly instead of wrong
    if not np.all(ps < 9007199254740992.0):
        raise ValueError(
            "quantize12 domain: |x| must be < 9007 (x*1e12 must stay "
            "within exact-double range 2^53)"
        )
    es = e * sign
    n0 = np.floor(ps)
    f = (ps - n0) + es
    adj = f >= 1.0
    n0 += adj
    f -= adj
    adj = f < 0.0
    n0 -= adj
    f += adj
    out = (sign * (n0 + (f >= 0.5))).astype(np.int64)
    risky = np.abs(f - 0.5) < (ps * 2.3e-16 + 1e-9)
    if risky.any():
        q = Decimal("1e-12")
        flat_p = P.ravel()
        flat_o = out.ravel()
        for i in np.flatnonzero(risky.ravel()):
            flat_o[i] = int(
                Decimal(repr(float(flat_p[i])))
                .quantize(q, ROUND_HALF_UP)
                .scaleb(12)
            )
        out = flat_o.reshape(P.shape)
    return out


#: conservative per-row domain bound for the quarantine pre-filter: a
#: row is certainly quantizable iff every element AND every pairwise
#: product stays under the 2^53/1e12 ≈ 9007.199 exact-double ceiling —
#: i.e. max|x| and max|x|² both below it. The (1 − 1e-9) margin absorbs
#: the ≤2-ulp gap between max|x|² and an individual float product, so a
#: row the filter KEEPS can never trip the kernel's exact in-chunk
#: raise; rows inside the margin are quarantined although a few might
#: be exactly representable (a degradation mode is allowed to be
#: conservative at the domain edge — clean embedding corpora are O(1),
#: three orders of magnitude away).
_Q12_DOMAIN = 9007199254740992.0 / 1e12
_Q12_ROW_BOUND = min(_Q12_DOMAIN, _Q12_DOMAIN**0.5) * (1.0 - 1e-9)


def _cov_moments_arrow(
    spark: SparkSession, sf_dir: str, bad_rows: str = "quarantine"
):
    """One Arrow pass over the embeddings: per-partition scaled-int64
    partial sums of the quantized products / values (the exact
    ``sum(cast(x as decimal(20,12)))`` arithmetic, carried as integers
    at 1e-12 scale), combined by ONE metadata-sized long aggregation —
    no N·d² row explosion, no d²-keyed shuffle of 82M rows. Returns
    ``(n, {i: Σx_scaled}, {(i,j): Σxy_scaled}, n_bad)``; partial
    magnitudes are bounded by rows·1e12 per partition and 64-bit exact
    through the JVM long sum (decimal(20,12) itself caps |x| < 1e8, so
    overflow would need 9e6 rows × 1e20 — out of the type's own
    domain).

    ``bad_rows`` (r19, VERDICT r18 item 7): with the default
    ``"quarantine"``, rows containing any element outside the exact
    quantization domain (|x| or |x·y| ≥ 2^53·1e-12 — see
    ``_Q12_ROW_BOUND``) are EXCLUDED from every moment and counted
    per-partition, so one poisoned embedding at 100 TB degrades the
    statistic by one row instead of killing the job after four task
    retries; the caller decides how loud to be with ``n_bad``. On a
    clean corpus the filter drops nothing and the moments are
    bit-identical to the unfiltered pass (pinned in
    tests/test_flip_fuzz.py). ``"raise"`` keeps the r18 fail-fast
    contract: no pre-filter, the kernel's exact in-chunk domain check
    kills the task loudly (that check remains as the backstop on the
    quarantine path too — the conservative row bound makes it
    unreachable there)."""

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    quarantine = bad_rows == "quarantine"
    if not quarantine and bad_rows != "raise":
        raise ValueError(f"bad_rows must be 'quarantine' or 'raise': {bad_rows!r}")

    def partials(it):
        import numpy as np  # noqa: F811 — executor-side import
        import pyarrow as pa

        sxy = None
        sx = None
        n = 0
        n_bad = 0
        d = None
        for batch in it:
            col = batch.column(0)
            rows = len(col)
            if rows == 0:
                continue
            arr = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            d_ = len(arr) // rows
            assert len(arr) == rows * d_, "ragged embedding batch"
            X = arr.reshape(rows, d_)
            if quarantine:
                m = np.max(np.abs(X), axis=1)
                # NaN/Inf rows are out of every decimal domain too
                bad = ~(m < _Q12_ROW_BOUND)
                if bad.any():
                    n_bad += int(bad.sum())
                    X = X[~bad]
                    rows = X.shape[0]
                    if rows == 0:
                        continue
            if sxy is None:
                d = d_
                sxy = np.zeros((d, d), dtype=np.int64)
                sx = np.zeros(d, dtype=np.int64)
            assert d_ == d, "embedding width drifted within a partition"
            for s in range(0, rows, 512):
                xc = X[s : s + 512]
                P = np.einsum("bi,bj->bij", xc, xc)
                sxy += _quantize12_scaled(P).sum(axis=0)
            sx += _quantize12_scaled(X).sum(axis=0)
            n += rows
        if sxy is None and n_bad == 0:
            return
        if sxy is None:  # partition of ONLY quarantined rows
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.array([-2], dtype=np.int32)),
                    pa.array(np.array([-1], dtype=np.int32)),
                    pa.array(np.array([n_bad], dtype=np.int64)),
                ],
                names=["i", "j", "part"],
            )
            return
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        tail_i, tail_j, tail_s = [-1], [-1], [n]
        if n_bad:
            tail_i.append(-2)
            tail_j.append(-1)
            tail_s.append(n_bad)
        out_i = np.concatenate([ii.ravel(), np.arange(d), tail_i]).astype(np.int32)
        out_j = np.concatenate([jj.ravel(), np.full(d, -1), tail_j]).astype(np.int32)
        out_s = np.concatenate([sxy.ravel(), sx, tail_s]).astype(np.int64)
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_i), pa.array(out_j), pa.array(out_s)],
            names=["i", "j", "part"],
        )

    agg = (
        emb.mapInArrow(partials, "i int, j int, part long")
        .groupBy("i", "j")
        .agg(F.sum("part").alias("s"))
    )
    n = None
    n_bad = 0
    sx = {}
    sxy = {}
    for r in agg.collect():
        if r.i == -2:
            n_bad = int(r.s)
        elif r.i == -1:
            n = int(r.s)
        elif r.j == -1:
            sx[r.i] = int(r.s)
        else:
            sxy[(r.i, r.j)] = int(r.s)
    if n is None or n == 0:
        raise ValueError(
            "covariance moments: no in-domain embedding rows at all "
            f"({n_bad} quarantined) — the corpus is empty or entirely "
            "out of the decimal(20,12) exact domain"
        )
    return n, sx, sxy, n_bad


def top_principal_component(
    spark: SparkSession, sf_dir: str, iters: int = 20, moments: str = "arrow"
) -> DataFrame:
    """T189 — distributed PCA, the scalable way: the d×d covariance
    matrix is ONE pass over the embeddings (outer-product partial sums
    — 4096 cells for d=64, metadata-sized regardless of corpus size),
    then the top eigenvector comes from 20 power iterations on the
    DRIVER over that tiny matrix — exactly how PCA/whitening statistics
    are computed over a 100 TB embedding corpus (cf. k-means' k×dim and
    PageRank's k² driver state).

    Bit-exact with the unrolled SQL oracle: covariance entries are
    exact-decimal sums of quantized products with a fixed closed form;
    each matvec term cov·v is quantized to 12 decimals HALF_UP before
    its exact sum; the per-iteration normalization is one IEEE
    sqrt/division chain from deterministic operands. Start vector is
    the uniform unit vector (1/√d exact for d=64).

    ``moments`` (r18, results-identical — BIT-identical, cell by cell):
    the default ``"arrow"`` computes the quantized sums in one
    :func:`_cov_moments_arrow` pass — scaled-int64 partials per
    partition, one long aggregation — instead of the ``"sql"``
    reference's N·d² row explosion (posexplode self-join + d²-keyed
    decimal aggregation over 82M rows at sf1). The r17 covariance
    shootout refuted the JOIN as the cost (join-free generator form was
    within 1.5%); the cost was the 82M per-row decimal quantize+sum
    operations themselves, which the kernel performs as vectorized
    exact binary rounding with per-element Decimal repair inside the
    repr-divergence window (see :func:`_quantize12_scaled`). All 4096
    covariance cells bit-identical at sf0.01/sf0.1/sf1; 128.8 → 9.1 s
    at sf1 (−93%, BENCH_covariance_kernel_probe.json). ``"sql"`` keeps
    the reference pipeline verbatim."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if moments == "arrow":
        n, sx, sxy, n_bad = _cov_moments_arrow(spark, sf_dir)
        if n_bad:
            import warnings

            warnings.warn(
                f"top_principal_component: QUARANTINED {n_bad} embedding "
                f"row(s) outside the decimal(20,12) exact quantization "
                f"domain (|x| or |x*y| >= 2^53*1e-12); the covariance is "
                f"computed over the remaining {n} rows. Clean the corpus "
                "or pass moments='sql' to reproduce the reference "
                "pipeline's own overflow behavior.",
                RuntimeWarning,
                stacklevel=2,
            )
        nf = float(n)
        means_k = {i: float(Decimal(v).scaleb(-12)) / nf for i, v in sx.items()}
        C = {
            (i, j): float(Decimal(v).scaleb(-12)) / nf
            - means_k[i] * means_k[j]
            for (i, j), v in sxy.items()
        }
        d = max(i for i, _ in C) + 1
    else:
        emb = load_table(spark, sf_dir, "embeddings")
        exploded = emb.select(
            "vec_id", F.posexplode("embedding").alias("i", "x")
        )
        a = exploded.select(
            "vec_id", F.col("i"), F.col("x").cast("double").alias("xa")
        )
        b = exploded.select(
            "vec_id", F.col("i").alias("j"), F.col("x").cast("double").alias("xb")
        )
        moments_df = (
            a.join(b, "vec_id")
            .groupBy("i", "j")
            .agg(
                F.sum((F.col("xa") * F.col("xb")).cast("decimal(20,12)"))
                .cast("double")
                .alias("sxy"),
                F.count("*").cast("double").alias("n"),
            )
        )
        means = (
            exploded.groupBy("i")
            .agg(
                (
                    F.sum(
                        F.col("x").cast("double").cast("decimal(20,12)")
                    ).cast("double")
                    / F.count("*")
                ).alias("m")
            )
        )
        cov = (
            moments_df.join(means.select(F.col("i"), F.col("m").alias("mi")), "i")
            .join(means.select(F.col("i").alias("j"), F.col("m").alias("mj")), "j")
            .select(
                "i",
                "j",
                (F.col("sxy") / F.col("n") - F.col("mi") * F.col("mj")).alias(
                    "cov"
                ),
            )
        )
        rows = cov.collect()
        d = max(r.i for r in rows) + 1
        C = {(r.i, r.j): r.cov for r in rows}
    q12 = Decimal(1).scaleb(-12)
    v = [1.0 / (d ** 0.5)] * d
    for _ in range(iters):
        w = []
        for i in range(d):
            s = Decimal(0)
            for j in range(d):
                s += Decimal(C[(i, j)] * v[j]).quantize(
                    q12, rounding=ROUND_HALF_UP
                )
            w.append(float(s))
        nrm_sq = Decimal(0)
        for wi in w:
            nrm_sq += Decimal(wi * wi).quantize(q12, rounding=ROUND_HALF_UP)
        nrm = math.sqrt(float(nrm_sq))
        v = [wi / nrm for wi in w]
    out = spark.createDataFrame(
        [(i, v[i]) for i in range(d)], "dim_idx int, loading double"
    )
    return out.select("dim_idx", F.round("loading", 6).alias("loading")).orderBy(
        "dim_idx"
    )


def principal_score_stats(
    spark: SparkSession, sf_dir: str, iters: int = 20
) -> DataFrame:
    """T190 — USE the principal component: project every embedding onto
    the t189 eigenvector and report per-label score statistics — the
    "does the top direction of variance separate my labels" check run
    before trusting PCA features downstream.

    The eigenvector is driver-state (t189's power iteration); the
    projection is a narrow JVM fold against the broadcast-literal
    vector (no Python, no second shuffle of embeddings); per-label
    stats quantize each score before the exact sums.
    """
    from pyspark.sql import Row

    pc = top_principal_component(spark, sf_dir, iters).collect()
    v = [r.loading for r in sorted(pc, key=lambda r: r.dim_idx)]
    lit = F.array(*[F.lit(float(x)) for x in v])
    emb = load_table(spark, sf_dir, "embeddings")
    score = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"), lit, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    return (
        emb.select("label", score.alias("s"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.round(
                F.sum(F.col("s").cast("decimal(20,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_score"),
            F.round(F.min("s"), 6).alias("min_score"),
            F.round(F.max("s"), 6).alias("max_score"),
        )
        .orderBy("label")
    )


def dim_standardization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T196 — the feature-standardization table: per embedding dimension,
    exact mean and population std plus the count of |z| > 3 values — the
    per-dim scaler a training pipeline persists (and the screen for dead
    or exploding dimensions).

    One posexplode pass: Σx and Σx² accumulate in quantized decimal per
    dim (order-independent), mean/std are fixed IEEE expressions, and
    the outlier count re-uses the same per-row values against the
    derived bounds — all in one map-side-combined aggregation plus one
    broadcast join back.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim", F.col("x").cast("double").alias("x")
    )
    moments = exploded.groupBy("dim").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(20,12)")).cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(20,12)"))
        .cast("double")
        .alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(F.col("sxx") / F.col("n") - mean * mean)
    stats = moments.select(
        "dim",
        F.col("n").cast("long").alias("n_values"),
        mean.alias("m"),
        std.alias("s"),
    )
    joined = exploded.join(F.broadcast(stats), "dim")
    return (
        joined.groupBy("dim")
        .agg(
            F.max("n_values").alias("n_values"),
            F.round(F.max("m"), 6).alias("mean_val"),
            F.round(F.max("s"), 6).alias("std_val"),
            F.sum(
                F.when(F.abs(F.col("x") - F.col("m")) > 3.0 * F.col("s"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            F.col("dim").cast("integer").alias("dim_idx"),
            "n_values",
            "mean_val",
            "std_val",
            "n_outliers",
        )
        .orderBy("dim_idx")
    )


def source_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T205 — per-source embedding dispersion WITHOUT a pairwise join:
    mean squared distance to the source centroid via the identity
    E‖x − c‖² = E‖x‖² − ‖c‖² (c the exact mean vector) — the
    source-tightness number behind "is this source one topic or many",
    at O(rows·dim) instead of O(rows²).

    All moments are decimal-quantized sums: per-source Σ‖x‖² from one
    row-level fold, the centroid from per-dimension sums (t151's
    build); the final subtraction is fixed IEEE on deterministic
    operands. One scan + two metadata-sized aggregates.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source", "vec_id", "embedding"
    )
    sqnorm = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    row_stats = j.select(
        "source", sqnorm.cast("decimal(20,12)").alias("sq")
    ).groupBy("source").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("sq").cast("double").alias("ssq"),
    )
    cent = (
        j.select("source", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("source", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(20,12)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("m")
        )
        .groupBy("source")
        .agg(
            F.sum((F.col("m") * F.col("m")).cast("decimal(20,12)"))
            .cast("double")
            .alias("cnorm_sq")
        )
    )
    return (
        row_stats.join(cent, "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n_vectors"),
            F.round(F.col("ssq") / F.col("n") - F.col("cnorm_sq"), 6).alias(
                "mean_sq_dist"
            ),
        )
        .orderBy("source")
    )
