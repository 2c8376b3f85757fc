"""t179's banded Levenshtein DP probe (r18): Spark's ``levenshtein``
takes an optional THRESHOLD (SPARK-44886) and the threshold variant
runs a banded DP — O((2k+1) * min_len) cells instead of the full
O(len_a * len_b) table — returning the exact distance when it is
<= k and -1 otherwise. Any row that survives t179's final
``edit_sim >= threshold`` filter has
``lev <= (1 - threshold + 5e-7) * max_len`` (round(x, 6) >= th only
requires x >= th - 5e-7), so with
``k = ceil((1 - threshold + 1e-6) * max_len)`` the banded DP returns
the EXACT distance for every surviving row and -1 only for rows the
final filter drops anyway — filtering ``d >= 0`` before the division
is results-identical. The threshold argument accepts a per-row
expression through the SQL function surface (verified: column
thresholds evaluate row-wise), which PySpark's int-only wrapper hides.

At t179's corpus shape (~300-char texts, threshold 0.8 → k ~ 61) the
band is ~123 diagonals vs ~300 columns of the full table, an expected
~2.4x cell-count cut on the DP that is t179's entire residual cost
after the r18 repartition + length-pre-filter repairs.

* ``lenfiltered`` — the pre-probe registered body verbatim (repartition
  + length pre-filter + full DP), kept local so the A/B stays
  reproducible after any flip.
* ``banded``      — the candidate form: same body, thresholded DP +
  ``d >= 0`` guard.
* ``registered``  — the registered builder (sanity anchor; identical to
  ``banded`` after a flip, to ``lenfiltered`` before).

Equality is gated in-tool at every tier (row sets must be identical).
Interleaved reps. Usage:
    python tools/editdist_banded_dp_shootout.py [sf_dir ...] [--reps N]
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


def banded(spark, sf_dir, threshold=0.8):
    cands = simhash_near_dup_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    max_len = F.greatest(F.length("text_a"), F.length("text_b"))
    len_gap = F.abs(F.length("text_a") - F.length("text_b"))
    rel = 1.0 - threshold + 1e-6
    lev_d = F.expr(
        "levenshtein(text_a, text_b, cast(ceil({rel} * cast(greatest("
        "length(text_a), length(text_b)) as double)) as int))".format(rel=rel)
    )
    n_parts = spark.sparkContext.defaultParallelism * 2
    return (
        cands.repartition(n_parts, "doc_a", "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(
            len_gap.cast("double")
            <= F.lit(rel) * max_len.cast("double")
        )
        .withColumn("lev_d", lev_d)
        .where(F.col("lev_d") >= 0)
        .select(
            "doc_a",
            "doc_b",
            F.col("lev_d").cast("long").alias("edit_distance"),
            F.round(
                F.lit(1.0) - F.col("lev_d").cast("double") / max_len.cast("double"),
                6,
            ).alias("edit_sim"),
        )
        .where(F.col("edit_sim") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


FORMS = {
    "lenfiltered": lenfiltered,
    "banded": banded,
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
    spark = get_spark(app_name="mgs-editdist-banded-dp-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            spark.sparkContext.setJobDescription(f"t179-banded:eq:{name}")
            vals[name] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
            spark.catalog.clearCache()
        assert vals["lenfiltered"] == vals["banded"], "banded DP diverged"
        assert vals["lenfiltered"] == vals["registered"], "registered diverged"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                spark.sparkContext.setJobDescription(f"t179-banded:time:{name}")
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
