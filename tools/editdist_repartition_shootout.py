"""t179's serial-DP repair (r18, results-identical): AQE coalesces the
simhash-candidate exchange by BYTES (1.45M bare id-pair rows fit one
64 MB advisory partition), so the downstream Levenshtein DP — the only
expensive-per-row expression in the plan — ran on ONE core (diagnosed
by thread dump: a single busy executor in
``UTF8String.levenshteinDistance``; the r17 sweep recorded t179 as
HANG >25 min at sf1 and the r18 re-measure on the guard-inherited
pipeline still took ~21 min). The registered builder now repartitions
the candidates to 2× parallelism before the text joins; this tool keeps
the pre-repair body verbatim so the A/B stays reproducible.

* ``legacy_serial`` — pre-r18 body: candidates flow straight into the
  broadcast text joins on whatever AQE leaves (one partition at sf1).
* ``registered``    — the registered builder (numbered repartition,
  exempt from AQE coalescing by contract).

Equality is gated in-tool at every tier (row sets must be identical).
Interleaved reps. Usage:
    python tools/editdist_repartition_shootout.py [sf_dir ...] [--reps N]
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


def legacy_serial(spark, sf_dir, threshold=0.8):
    cands = simhash_near_dup_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein(F.col("text_a"), F.col("text_b"))
    max_len = F.greatest(F.length("text_a"), F.length("text_b"))
    return (
        cands.join(ta, "doc_a")
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


FORMS = {
    "legacy_serial": legacy_serial,
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
    spark = get_spark(app_name="mgs-editdist-repartition-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            vals[name] = sorted(
                tuple(r) for r in fn(spark, sf_dir).collect()
            )
            spark.catalog.clearCache()
        assert vals["legacy_serial"] == vals["registered"], "repair diverged"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
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
