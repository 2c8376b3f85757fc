"""t180's decimal-moment aggregation probe (r19): the grouped-OLS
builder computes Σx, Σy, Σxy, Σx² as EXACT decimal sums — five decimal
multiply/accumulate chains per row over the 60M-row fact (19.4 s at
sf1, BENCH_registry_sweep_r18.json). Both regressors are 2-decimal
columns, so the same exact sums can be carried as SCALED LONGS
(x·100, y·100 — guide §2.3 narrower types): integer multiply-adds
whole-stage-codegen at ALU speed, with ONE final correctly-rounded
division per aggregate.

Bit-exactness argument (gated in-tool): the decimal path rounds the
exact rational v/10^s to double once at the final cast; the integer
path holds v exactly in a long (bounds: |x·100| ≤ 10, |y·100| ≤ 5000
per the TPC-H domain, so Σ(x100·y100) ≤ 3e12 at sf1's 60M rows),
converts exactly to double (< 2^53), and divides by the exact power of
ten — one rounding of the same rational. The two paths can only
diverge when a scaled sum exceeds 2^53 (≳9e15: ~2e11 rows at worst-case
values), where the integer path picks up a second rounding — recorded
as the documented domain bound.

Forms (legacy verbatim):
* ``decimal_moments`` — the registered r18 body
* ``int_moments``     — the candidate
* ``registered``      — sanity anchor

Usage: python tools/t180_intmoments_shootout.py [sf_dir ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.relational import (  # noqa: E402
    discount_sensitivity,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


def _finish(m):
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    ).orderBy("p_brand")


def decimal_moments(spark, sf_dir):
    """r18 registered body verbatim."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    j = li.join(part, li.l_partkey == F.col("p_partkey"))
    x = F.col("l_discount").cast("decimal(12,2)")
    y = F.col("l_quantity").cast("decimal(12,2)")
    m = j.groupBy("p_brand").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    return _finish(m)


def int_moments(spark, sf_dir):
    """Candidate: exact scaled-long sums, one final rounding each."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    j = li.join(part, li.l_partkey == F.col("p_partkey"))
    x100 = (F.col("l_discount").cast("decimal(12,2)") * 100).cast("long")
    y100 = (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("long")
    m = j.groupBy("p_brand").agg(
        F.count("*").cast("double").alias("n"),
        (F.sum(x100).cast("double") / 100.0).alias("sx"),
        (F.sum(y100).cast("double") / 100.0).alias("sy"),
        (F.sum(x100 * y100).cast("double") / 10000.0).alias("sxy"),
        (F.sum(x100 * x100).cast("double") / 10000.0).alias("sxx"),
    )
    return _finish(m)


FORMS = {
    "decimal_moments": decimal_moments,
    "int_moments": int_moments,
    "registered": discount_sensitivity,
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
    spark = get_spark(app_name="mgs-t180-intmoments-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            spark.sparkContext.setJobDescription(f"t180:eq:{name}")
            vals[name] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        assert vals["decimal_moments"] == vals["registered"], "legacy drifted"
        assert vals["int_moments"] == vals["registered"], "int form diverged"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                spark.sparkContext.setJobDescription(f"t180:time:{name}")
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
