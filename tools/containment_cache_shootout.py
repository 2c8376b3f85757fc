"""t134's shingle-lineage recompute probe (r18): the containment
builder reads ``_doc_shingles`` THREE times — per-doc set sizes plus
both sides of the shingle self-join. Exchange reuse dedupes the two
identically-exchanged join sides, but the doc_id-keyed sizes
aggregation is a different exchange over the same child, so the
tokenize+shingle pass runs at least twice over the corpus
(BENCH_banded_tail_r18.json flagged the recompute as the residual cost
after the cold-store effects were separated). This tool measures
whether the t77 cache recipe (explode once, cache, let every consumer
read the InMemoryRelation) pays on the lexical side too — or whether
exchange reuse already covers it, as it did for t22's verify tail
(BENCH_lsh_tail_decomposition.json, forced caching LOST +117% there).

* ``no_cache``      — the registered body verbatim (pre-probe shape),
  kept local so the A/B stays reproducible if the recipe ever lands.
* ``cached``        — ``_doc_shingles(...).cache()`` fed to all three
  consumers.
* ``cached_repart`` — ``repartition("shingle").cache()`` (the exact
  t77 recipe: the cached layout also serves the self-join's exchange).
* ``registered``    — the registered builder (sanity anchor).

Equality is gated in-tool at every tier. Interleaved reps. Usage:
    python tools/containment_cache_shootout.py [sf_dir ...] [--reps N]
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
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


def _body(sh, threshold):
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
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
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


def no_cache(spark, sf_dir, n=3, threshold=0.8):
    docs = load_table(spark, sf_dir, "documents")
    return _body(_doc_shingles(docs, n), threshold)


def cached(spark, sf_dir, n=3, threshold=0.8):
    docs = load_table(spark, sf_dir, "documents")
    return _body(_doc_shingles(docs, n).cache(), threshold)


def cached_repart(spark, sf_dir, n=3, threshold=0.8):
    docs = load_table(spark, sf_dir, "documents")
    return _body(
        _doc_shingles(docs, n).repartition("shingle").cache(), threshold
    )


FORMS = {
    "no_cache": no_cache,
    "cached": cached,
    "cached_repart": cached_repart,
    "registered": containment_pairs,
}


def median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dirs = args or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="mgs-containment-cache-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            spark.sparkContext.setJobDescription(f"t134-cache:eq:{name}")
            vals[name] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
            spark.catalog.clearCache()
        base = vals["no_cache"]
        for name in ("cached", "cached_repart", "registered"):
            assert vals[name] == base, f"{name} diverged"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                spark.sparkContext.setJobDescription(f"t134-cache:time:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        out = {
            "sf_dir": sf_dir,
            "n_reps": reps,
            "rows": len(vals["registered"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
