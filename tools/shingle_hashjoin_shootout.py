"""r19 probe: serve the exact-Jaccard family's shingle self-join from
the persisted shingle-hash store (t22's second durable asset,
``shingle_store_table``) instead of recomputing string shingles.

The registered t134/t21 bodies run ``_doc_shingles`` (tokenize +
n-gram assembly + array_distinct + explode) and self-join on the
~20-char SHINGLE STRING. The store already holds each doc's sorted
distinct ``xxhash64`` shingle values plus ``set_size`` (built once per
corpus version, doc_id-bucketed, built for the t22 verify stage since
r14). The candidate forms explode the store's ``xh`` and self-join on
the 8-byte LONG instead (guide §2.3 narrower types / §6 build-once
substrate):

* tokenize+shingle assembly — the most expensive expression in the
  dedup family — is paid at store-build time, never per query;
* the join key shrinks ~20 chars -> 8 bytes, so the self-join exchange
  carries a fraction of the bytes;
* per-doc set sizes are a store COLUMN, removing the sizes aggregation
  (one exchange) outright.

Pair counts over hashes equal pair counts over strings absent an
xxhash64 collision inside a document pair (~2^-64 per distinct shingle
pair) — the same accepted bound as the t22 verify stage, whose
from-bands == direct equality is pinned in tests. Equality is gated
in-tool at every tier here as well.

Forms (legacy bodies verbatim so the A/B stays reproducible):

* ``t134_registered`` / ``t134_store``  — containment_pairs A/B
* ``t21_registered``  / ``t21_store``   — ngram_jaccard_pairs A/B
  (warn_df profile pass disabled on both sides: it is memoized
  per-process and non-semantic, and the A/B must not time it once for
  one side only)

The store is built (or adopted) BEFORE the equality pass, and the
build wall time is reported separately — cold-build amortization is
the store-inventory contract (README), not part of the steady-state
claim. Usage:

    python tools/shingle_hashjoin_shootout.py [sf_dir ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.dedup import (  # noqa: E402
    _doc_shingles,
    containment_pairs,
    ngram_jaccard_pairs,
    shingle_store_table,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


# ---------------------------------------------------------------- t134
def t134_registered(spark, sf_dir, n=3, threshold=0.8):
    """containment_pairs body verbatim (pre-probe registered shape)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    return (
        common.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_common") / F.col("size_a"), 6).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def t134_store(spark, sf_dir, n=3, threshold=0.8):
    """Candidate: hashed-shingle self-join served from the store."""
    sets = spark.table(shingle_store_table(spark, sf_dir, n, None))
    sh = sets.select("doc_id", F.explode("xh").alias("h"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    return (
        common.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_common") / F.col("size_a"), 6).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# ----------------------------------------------------------------- t21
def t21_registered(spark, sf_dir, n=3, threshold=0.5):
    """ngram_jaccard_pairs body verbatim, warn_df profile skipped."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def t21_store(spark, sf_dir, n=3, threshold=0.5):
    """Candidate: hashed-shingle self-join served from the store."""
    sets = spark.table(shingle_store_table(spark, sf_dir, n, None))
    sh = sets.select("doc_id", F.explode("xh").alias("h"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


PAIRS = {
    "t134": ("t134_registered", "t134_store", t134_registered, t134_store),
    "t21": ("t21_registered", "t21_store", t21_registered, t21_store),
}
REGISTERED = {"t134": containment_pairs, "t21": ngram_jaccard_pairs}


def median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    argv = sys.argv[1:]
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dirs = args or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="mgs-shingle-hashjoin-shootout")
    for sf_dir in sf_dirs:
        spark.sparkContext.setJobDescription("shingle-hashjoin:store-build")
        t0 = time.perf_counter()
        shingle_store_table(spark, sf_dir, 3, None)
        build_s = time.perf_counter() - t0

        out = {"sf_dir": sf_dir, "n_reps": reps,
               "store_adopt_or_build_s": round(build_s, 3)}
        for key, (na, nb, fa, fb) in PAIRS.items():
            spark.sparkContext.setJobDescription(f"shingle-hashjoin:eq:{key}")
            va = sorted(tuple(r) for r in fa(spark, sf_dir).collect())
            vb = sorted(tuple(r) for r in fb(spark, sf_dir).collect())
            vr = sorted(
                tuple(r)
                for r in REGISTERED[key](
                    spark, sf_dir, warn_df=None
                ).collect()
            ) if key == "t21" else sorted(
                tuple(r) for r in REGISTERED[key](spark, sf_dir).collect()
            )
            assert va == vb, f"{key}: store form diverged ({len(va)} vs {len(vb)} rows)"
            assert va == vr, f"{key}: legacy body drifted from registered"
            out[f"{key}_rows"] = len(va)
            samples = {na: [], nb: []}
            for _ in range(reps):
                for name, fn in ((na, fa), (nb, fb)):
                    spark.sparkContext.setJobDescription(
                        f"shingle-hashjoin:time:{name}"
                    )
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).collect()
                    samples[name].append(time.perf_counter() - t0)
            for name, xs in samples.items():
                out[name] = [
                    round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)
                ]
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
