"""Decompose t22's post-guard-flip remaining per-query cost: the verify
tail (VERDICT r16 next-round #5 — the guard probe attributed ~0.6 s of
the sf0.1 stage budget to candidates and ~0.7 s to the shingle-store
semi-join + verify joins).

Hypothesis under test: the candidates subtree (band self-join +
distinct) is evaluated up to THREE times in the registered plan — once
as the pair spine and once inside each verify side's semi-join probe
(cand_ids) — unless Spark's ReuseExchange unifies them; and the
doc_id-bucketed shingle store is scanned once per verify side. Forms:

* ``registered``   — the registered builder, untouched.
* ``cached_cands`` — hand-built identical pipeline with the candidate
  pair set cached (bounded by the LSH near-dup rate — linear, never
  corpus-sized), so the band self-join executes once.
* ``cached_both``  — additionally caches the candidate-pruned shingle
  sets (bounded by candidate docs), so the store is scanned once.

Equality is gated in-tool on the full pair output. Interleaved reps —
the only measurement shape this repo accepts as flip evidence (the t33
sequential-probe refutation, BENCH_asof_tail_decomposition.json, is the
canonical lesson). Also prints per-form plan facts (band-table and
store scan counts) so the subtree-re-execution hypothesis is checked
against the PLAN, not inferred from timings.

Usage: python tools/lsh_tail_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
Prints one JSON line per sf dir with per-form medians and spreads.

VERDICT (r17, BENCH_lsh_tail_decomposition.json): REFUTED — every
caching combination loses at every tier and the gap grows with data
(sf1 cached_cands +117%). Spark's exchange reuse already serves the
repeated candidates subtree; the forced InMemoryRelation is a
materialization barrier that breaks pipelining for a 256-row
intermediate. The registered tail is structurally floored at measured
tiers — do not re-stage a caching form without a structurally new idea.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.operators.dedup import (  # noqa: E402
    minhash_band_table_counted,
    minhash_lsh_pairs_from_bands,
    shingle_store_table,
)
from mapreduce_google_spark.plans.explain import formatted_plan  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402


def _tail(spark, sf_dir, cache_cands: bool, cache_sets: bool):
    """Hand-built replica of the registered counted-guard pipeline with
    optional caching of the two bounded intermediates. Kept in the tool
    (not the package) until the evidence says which form r18 registers."""
    n, num_hashes, bands, max_df, max_bucket, threshold = 3, 32, 8, None, 1000, 0.5
    table = minhash_band_table_counted(spark, sf_dir, n, num_hashes, bands, max_df)
    banded = spark.table(table).where(F.col("bucket_n") <= max_bucket).drop(
        "bucket_n"
    )
    a, b_ = banded.hint("merge").alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    if cache_cands:
        candidates = candidates.cache()
    cand_ids = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        spark.table(shingle_store_table(spark, sf_dir, n, max_df))
        .join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", F.col("xh").alias("sh"), "set_size")
    )
    if cache_sets:
        sets = sets.cache()
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("set_size").alias("size_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("set_size").alias("size_b"),
    )
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jaccard = F.round(
        n_common / (F.col("size_a") + F.col("size_b") - n_common), 6
    ).alias("jaccard")
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jaccard)
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    argv = sys.argv[1:]
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dirs = args or ["/root/testdata/sf0.1", "/tmp/mgs_sf1"]
    spark = get_spark(app_name="mgs-lsh-tail-shootout")

    def forms():
        return {
            "registered": lambda: minhash_lsh_pairs_from_bands(spark, sf_dir),
            "cached_cands": lambda: _tail(spark, sf_dir, True, False),
            "cached_both": lambda: _tail(spark, sf_dir, True, True),
        }

    for sf_dir in sf_dirs:
        # plan facts first (cheap, no execution): scan counts per form
        plan_facts = {}
        fs = forms()
        for name, fn in fs.items():
            df = fn()
            plan = formatted_plan(df)
            plan_facts[name] = {
                "band_table_scans": plan.count("mgs_lsh_bands2_"),
                "shingle_store_scans": plan.count("mgs_shingle_hashes_"),
                "exchanges": plan.count("Exchange"),
            }
            spark.catalog.clearCache()
        # warm + full-output equality gate (fresh lineage per form so a
        # cache from the plan pass can't leak into another form's run)
        results = {}
        for name, fn in forms().items():
            results[name] = fn().toPandas()
            spark.catalog.clearCache()
        vals = {
            n_: sorted(map(tuple, df.itertuples(index=False)))
            for n_, df in results.items()
        }
        ref = vals["registered"]
        for n_, v in vals.items():
            assert v == ref, f"form {n_} disagrees with registered"
        samples: dict[str, list[float]] = {n_: [] for n_ in forms()}
        for _ in range(reps):
            for name, fn in forms().items():
                t0 = time.perf_counter()
                fn().toPandas()
                samples[name].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        out = {"sf_dir": sf_dir, "n_reps": reps, "rows": len(ref),
               "plan_facts": plan_facts}
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
