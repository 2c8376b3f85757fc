"""t207's residual (VERDICT r18 next-round item 5): after the r18
EXPAND removal, the three per-column ``(approx_count_distinct,
countDistinct)`` aggregations still cost ~105 s at sf1. Hypothesis:
mixing ONE distinct aggregate with ONE regular aggregate in the same
``agg`` still triggers RewriteDistinctAggregates — the input is
EXPAND-doubled (one projection for the distinct group, one for the
regular aggregate), so each column's 60M-row scan shuffles as ~120M
rows.

Candidate (guide §2.3 aggregate-before-you-shuffle): dedup FIRST —
``select(c).distinct()`` (a plain partial-aggregated group-by: map-side
dedup, one exchange of the per-partition DISTINCT values only) — then
compute BOTH aggregates over the deduped set in one pass:

* ``count(*)`` over distinct values IS ``countDistinct`` (exact, by
  definition);
* ``approx_count_distinct`` is an HLL++ sketch — register state is a
  MAX over per-value hashes, so duplicates are idempotent and the
  sketch over the distinct SET is bit-identical to the sketch over the
  raw multiset. Same estimate, same bound flag.

Forms (legacy verbatim so the A/B stays reproducible):

* ``registered``  — cardinality_sketch_audit (sanity anchor)
* ``per_col``     — the r18 per-column body verbatim
* ``dedup_first`` — the candidate

Equality gated in-tool (sorted rows). Interleaved reps. Usage:
    python tools/t207_dedup_first_shootout.py [sf_dir ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.scale import (  # noqa: E402
    cardinality_sketch_audit,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


def per_col(spark, sf_dir):
    """r18 registered body verbatim (pre-probe shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    per = []
    for c in COLS:
        row = li.select(c).agg(
            F.approx_count_distinct(c, rsd=0.01).alias("a"),
            F.countDistinct(c).alias("e"),
        )
        per.append(
            row.select(
                F.lit(c).alias("column"),
                F.col("e").cast("long").alias("exact_distinct"),
                F.when(
                    F.abs(F.col("a") - F.col("e")) <= 3 * 0.01 * F.col("e"), 0
                )
                .otherwise(1)
                .cast("long")
                .alias("bound_violations"),
            )
        )
    out = per[0]
    for df in per[1:]:
        out = out.unionByName(df)
    return out.orderBy("column")


def dedup_first(spark, sf_dir):
    """Candidate: distinct() first, both aggregates over the set."""
    li = load_table(spark, sf_dir, "lineitem")
    per = []
    for c in COLS:
        row = li.select(c).distinct().agg(
            F.approx_count_distinct(c, rsd=0.01).alias("a"),
            F.count("*").alias("e"),
        )
        per.append(
            row.select(
                F.lit(c).alias("column"),
                F.col("e").cast("long").alias("exact_distinct"),
                F.when(
                    F.abs(F.col("a") - F.col("e")) <= 3 * 0.01 * F.col("e"), 0
                )
                .otherwise(1)
                .cast("long")
                .alias("bound_violations"),
            )
        )
    out = per[0]
    for df in per[1:]:
        out = out.unionByName(df)
    return out.orderBy("column")


FORMS = {
    "per_col": per_col,
    "dedup_first": dedup_first,
    "registered": cardinality_sketch_audit,
}


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
    spark = get_spark(app_name="mgs-t207-dedup-first-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            spark.sparkContext.setJobDescription(f"t207:eq:{name}")
            vals[name] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        assert vals["per_col"] == vals["registered"], "legacy body drifted"
        assert vals["dedup_first"] == vals["registered"], (
            "dedup_first diverged"
        )
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                spark.sparkContext.setJobDescription(f"t207:time:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t0)
        out = {"sf_dir": sf_dir, "n_reps": reps, "rows": len(vals["registered"])}
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
