"""t179's length pre-filter (r18, results-identical): the Levenshtein
DP is bounded below by the length difference — ``lev(a, b) >=
|len(a) - len(b)|`` — so a candidate pair with
``|len_a - len_b| > (1 - threshold) * max(len_a, len_b)`` cannot reach
``edit_sim >= threshold`` no matter what the DP computes. Measured on
the shipped corpus, 56% of the simhash band-join candidates at sf0.1
(43,295 / 77,379) are prunable this way: the bit-signature candidates
agree on token distribution, not on length, so excerpt/expansion pairs
flood the verify stage with doomed DP work. The registered builder now
applies the cheap length predicate BETWEEN the text joins and the DP
projection (rows that fail it never reach ``levenshtein``); the filter
threshold carries a +1e-6 relative margin so the 6-decimal rounding of
``edit_sim`` at the final filter cannot disagree with the exact-length
pre-filter at the boundary (round(x, 6) >= th only requires
x >= th - 5e-7).

* ``no_lenfilter``  — pre-filter-less body verbatim (the r18
  serial-DP repair WITHOUT the length guard), so the A/B stays
  reproducible after the flip.
* ``lenfiltered``   — the candidate form, kept local so the shape that
  was measured stays pinned in this file.
* ``registered``    — the registered builder (identical to
  ``lenfiltered`` after the flip; the redundant measurement is the
  sanity anchor that the rebind is faithful).

Equality is gated in-tool at every tier (row sets must be identical).
Interleaved reps. Usage:
    python tools/editdist_lenfilter_shootout.py [sf_dir ...] [--reps N]
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
    edit_distance_pairs,
    simhash_near_dup_pairs,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


def no_lenfilter(spark, sf_dir, threshold=0.8):
    cands = simhash_near_dup_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein(F.col("text_a"), F.col("text_b"))
    max_len = F.greatest(F.length("text_a"), F.length("text_b"))
    n_parts = spark.sparkContext.defaultParallelism * 2
    return (
        cands.repartition(n_parts, "doc_a", "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_distance"),
            F.round(
                F.lit(1.0) - lev.cast("double") / max_len.cast("double"), 6
            ).alias("edit_sim"),
        )
        .where(F.col("edit_sim") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def lenfiltered(spark, sf_dir, threshold=0.8):
    cands = simhash_near_dup_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein(F.col("text_a"), F.col("text_b"))
    max_len = F.greatest(F.length("text_a"), F.length("text_b"))
    len_gap = F.abs(F.length("text_a") - F.length("text_b"))
    n_parts = spark.sparkContext.defaultParallelism * 2
    return (
        cands.repartition(n_parts, "doc_a", "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(
            len_gap.cast("double")
            <= F.lit(1.0 - threshold + 1e-6) * max_len.cast("double")
        )
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_distance"),
            F.round(
                F.lit(1.0) - lev.cast("double") / max_len.cast("double"), 6
            ).alias("edit_sim"),
        )
        .where(F.col("edit_sim") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


FORMS = {
    "no_lenfilter": no_lenfilter,
    "lenfiltered": lenfiltered,
    "registered": edit_distance_pairs,
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
    spark = get_spark(app_name="mgs-editdist-lenfilter-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            spark.sparkContext.setJobDescription(f"t179-lenfilter:eq:{name}")
            vals[name] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
            spark.catalog.clearCache()
        assert vals["no_lenfilter"] == vals["lenfiltered"], "pre-filter diverged"
        assert vals["no_lenfilter"] == vals["registered"], "registered diverged"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                spark.sparkContext.setJobDescription(f"t179-lenfilter:time:{name}")
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
